"""String-template compiler (§2.8 templating; ref display-proxy/
index.html:1043-1111).

The reference renders popup/label templates like
``"{{NAME|upper}} — {{SOG|fixed:1}} kn ({{lastUpdate|ago}})"``
row-at-a-time in the browser. Here the template string compiles ONCE
into a single ``concat()`` Column — rendering a billion labels is a
codegen projection, not a loop.

Supported modifiers (reference parity):
    upper, lower, fixed:N (toFixed), round, date (dd/MM/yyyy HH:mm,
    Pacific/Auckland), ago (relative time vs a supplied ``now``).
Missing/null fields render as '' (the reference's `?? ''`).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(r"\{\{\s*([A-Za-z0-9_.]+)\s*(?:\|\s*([A-Za-z]+)(?::([A-Za-z0-9]+))?)?\s*\}\}")


def _apply_modifier(col: Column, mod: str | None, arg: str | None, now: Column | None) -> Column:
    if mod is None:
        return col.cast("string")
    if mod == "upper":
        return F.upper(col.cast("string"))
    if mod == "lower":
        return F.lower(col.cast("string"))
    if mod == "fixed":
        # printf %.Nf — like the reference's Number.toFixed, NO
        # thousands grouping (format_number would add commas)
        return F.format_string(f"%.{int(arg or 0)}f", col.cast("double"))
    if mod == "round":
        # floor(x + 0.5), NOT F.round: the reference is JS Math.round
        # (display-proxy/index.html:1075), which rounds halves toward
        # +Infinity — Math.round(-2.5) = -2 — while Spark's HALF_UP
        # rounds away from zero (-3)
        return F.floor(col.cast("double") + F.lit(0.5)).cast("long").cast("string")
    if mod == "date":
        from ..functions.datetimes import nz_local

        return nz_local(col)
    if mod == "ago":
        if now is None:
            raise ValueError("'ago' modifier requires now=")
        from ..functions.datetimes import relative_age

        return relative_age(col, now)
    raise ValueError(f"unknown template modifier: {mod}")


def compile_template(template: str, *, now: Column | None = None) -> Column:
    """Compile a ``{{field|modifier}}`` template to one Column."""
    parts: list[Column] = []
    pos = 0
    for m in _TOKEN.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        path, mod, arg = m.group(1), m.group(2), m.group(3)
        rendered = _apply_modifier(F.col(path), mod, arg, now)
        # guard on the SOURCE column: format_string renders a null
        # input as text instead of propagating null
        parts.append(F.when(F.col(path).isNull(), F.lit("")).otherwise(F.coalesce(rendered, F.lit(""))))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)
