"""Filter-expression DSL → Catalyst ``Column`` compiler (F12).

The reference ships filters as *data*: strings in S3 config JSON,
parsed by ``parseFilter`` (tak-cot-proxy/index.mjs:125-179) into a
predicate AST and interpreted row-at-a-time (:181-240). This module
reproduces the exact grammar and null semantics, but compiles to a
``pyspark.sql.Column`` tree instead of interpreting — Catalyst then
pushes the compiled predicate into the scan, so a config-driven
filter costs the same as a hand-written one at any scale.

Grammar (reference parity):
    expr        := term (' and ' term)*          # AND of terms
    term        := compare | modulo | in | contains
    compare     := path OP value                 # OP ∈ == != > < >= <= =
    modulo      := path '%' int OP value
    in          := path 'in' '[' v (',' v)* ']'
    contains    := '$contains(' path ',' value ')'
    filters     := [expr, ...]                   # list = OR of exprs

Null semantics (reference ``evaluateComparison``, index.mjs:181-199):
a missing/NULL field FAILS every comparison except ``!=`` against a
concrete value, which PASSES. Spark's 3-valued logic would yield NULL
(dropped) for ``!=`` too, so each op is wrapped with explicit
``isNull`` handling.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMPARE_OPS = ("==", "!=", ">=", "<=", ">", "<", "=")


@dataclass
class FilterNode:
    """Predicate AST node — same shape as the reference's parse output
    ({type:'compare'|'and'|'in'|'contains'|'modulo', path, op, value})."""

    type: str
    path: str = ""
    op: str = ""
    value: Any = None
    divisor: int = 0
    children: list["FilterNode"] = field(default_factory=list)


def _parse_value(raw: str) -> Any:
    raw = raw.strip()
    if len(raw) >= 2 and raw[0] in "'\"" and raw[-1] == raw[0]:
        return raw[1:-1]
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw  # bare string


def parse_filter(expr: str) -> FilterNode:
    """Parse one filter expression string into a FilterNode AST.

    Mirrors ``parseFilter`` tak-cot-proxy/index.mjs:125-179: split on
    ' and ' first, then classify each term.

    Grammar limits inherited from the reference (its splits are
    quote-blind too): a quoted VALUE must not contain the token
    ``' and '`` and an in-list element must not contain ``,`` — both
    split before quotes are interpreted. Divergence, deliberately: the
    reference console-warns and silently DROPS an unparseable term
    (a malformed config filter weakens to a broader match); this
    engine raises ValueError so a bad filter fails loudly instead of
    returning wrong rows.
    """
    expr = expr.strip()
    parts = re.split(r"\s+and\s+", expr)
    if len(parts) > 1:
        return FilterNode(type="and", children=[parse_filter(p) for p in parts])

    term = parts[0].strip()

    m = re.match(r"^\$contains\(\s*([^,]+?)\s*,\s*(.+?)\s*\)$", term)
    if m:
        return FilterNode(type="contains", path=m.group(1).strip(), value=_parse_value(m.group(2)))

    m = re.match(r"^(\S+)\s+in\s+\[(.*)\]$", term)
    if m:
        vals = [_parse_value(v) for v in m.group(2).split(",") if v.strip() != ""]
        return FilterNode(type="in", path=m.group(1), value=vals)

    m = re.match(r"^(\S+)\s*%\s*(\d+)\s*(==|!=|>=|<=|>|<|=)\s*(.+)$", term)
    if m:
        return FilterNode(
            type="modulo",
            path=m.group(1),
            divisor=int(m.group(2)),
            op=m.group(3),
            value=_parse_value(m.group(4)),
        )

    for op in _COMPARE_OPS:
        # split on the operator surrounded by optional whitespace;
        # check longest ops first so '>=' doesn't match as '>'
        m = re.match(rf"^(.+?)\s*{re.escape(op)}\s*(.+)$", term)
        if m and not any(
            longer != op and longer.startswith(op) and m.group(2).startswith(longer[len(op):])
            for longer in _COMPARE_OPS
        ):
            return FilterNode(type="compare", path=m.group(1).strip(), op=op, value=_parse_value(m.group(2)))

    raise ValueError(f"unparseable filter term: {term!r}")


PathResolver = Callable[[str], Column]


def _default_resolver(path: str) -> Column:
    return F.col(path)


def _lit(value: Any) -> Column:
    return F.lit(value)


def _compile_node(node: FilterNode, resolve: PathResolver, df: DataFrame | None) -> Column:
    if node.type == "and":
        return reduce(lambda a, b: a & b, (_compile_node(c, resolve, df) for c in node.children))

    col = resolve(node.path)

    if node.type == "compare":
        op = "==" if node.op == "=" else node.op
        if node.value is None:
            # comparing against null literal: == null → isNull, != null → isNotNull
            return col.isNull() if op == "==" else col.isNotNull()
        if op == "==":
            return col.isNotNull() & (col == _lit(node.value))
        if op == "!=":
            # reference: missing field PASSES != concrete (index.mjs:185-188)
            return col.isNull() | (col != _lit(node.value))
        cmp = {">": col > _lit(node.value), "<": col < _lit(node.value),
               ">=": col >= _lit(node.value), "<=": col <= _lit(node.value)}[op]
        return col.isNotNull() & cmp

    if node.type == "modulo":
        op = "==" if node.op == "=" else node.op
        modded = col % F.lit(node.divisor)
        cmp = {"==": modded == _lit(node.value), "!=": modded != _lit(node.value),
               ">": modded > _lit(node.value), "<": modded < _lit(node.value),
               ">=": modded >= _lit(node.value), "<=": modded <= _lit(node.value)}[op]
        if op == "!=":
            return col.isNull() | cmp
        return col.isNotNull() & cmp

    if node.type == "in":
        return col.isNotNull() & col.isin(*node.value)

    if node.type == "contains":
        # string contains OR array membership (index.mjs:214-222);
        # resolve by schema when a DataFrame is provided
        is_array = False
        if df is not None:
            try:
                dtype = dict(df.dtypes).get(node.path, "")
                is_array = dtype.startswith("array")
            except Exception:
                is_array = False
        if is_array:
            return col.isNotNull() & F.array_contains(col, node.value)
        return col.isNotNull() & col.cast("string").contains(str(node.value))

    raise ValueError(f"unknown node type {node.type}")


def compile_filter(
    expr: str | FilterNode,
    *,
    resolver: PathResolver = _default_resolver,
    df: DataFrame | None = None,
) -> Column:
    """Compile one filter expression (string or parsed AST) to a Column."""
    node = parse_filter(expr) if isinstance(expr, str) else expr
    return _compile_node(node, resolver, df)


def compile_filters(
    exprs: Sequence[str],
    *,
    resolver: PathResolver = _default_resolver,
    df: DataFrame | None = None,
) -> Column:
    """Compile a list of filter expressions to OR-of-expressions
    (reference ``applyFilters`` index.mjs:226-240: a feature passes if
    ANY configured filter matches). Empty list = pass-through."""
    if not exprs:
        return F.lit(True)
    return reduce(lambda a, b: a | b, (compile_filter(e, resolver=resolver, df=df) for e in exprs))
