"""Rule-based styling / projection mutation (F13).

The reference applies per-layer style config (tak-cot-proxy/
index.mjs:256-306): per-geometry-type defaults fill missing style
props, then an ordered list of `{query, styles, delete}` rules where
the FIRST matching query wins; `delete: true` drops the row; three
numeric props are coerced.

Spark shape: compute a first-match rule index once (a `when` chain is
inherently first-match), then per style key a `when(idx==i, lit)`
chain over the rules — all Column expressions, one projection, no
row-level code.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .filter_dsl import compile_filter

NUMERIC_STYLE_PROPS = ("stroke-width", "stroke-opacity", "fill-opacity")


def apply_style_rules(
    df: DataFrame,
    rules: list[dict[str, Any]],
    *,
    defaults: dict[str, dict[str, Any]] | None = None,
    geometry_type_col: str = "geometry_type",
    style_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Apply ordered style rules with first-match-wins semantics.

    rules: [{"query": "<DSL expr>", "styles": {col: value}, "delete": bool}]
    defaults: {geometry_type: {col: value}} applied only where the
    column is NULL (reference fill-if-null, index.mjs:262-276).
    """
    if style_cols is None:
        keys: set[str] = set()
        for r in rules:
            keys.update(r.get("styles", {}).keys())
        for d in (defaults or {}).values():
            keys.update(d.keys())
        style_cols = tuple(sorted(keys))

    out = df
    # 1. per-geometry-type defaults, fill-if-null
    for sc in style_cols:
        if defaults:
            fill = None
            for gtype, props in defaults.items():
                if sc in props:
                    branch = F.when(F.col(geometry_type_col) == gtype, F.lit(props[sc]))
                    fill = branch if fill is None else fill.when(F.col(geometry_type_col) == gtype, F.lit(props[sc]))
            if fill is not None:
                base = F.col(sc) if sc in out.columns else F.lit(None)
                out = out.withColumn(sc, F.coalesce(base, fill))
        elif sc not in out.columns:
            out = out.withColumn(sc, F.lit(None).cast("string"))

    # 2. first-match rule index: when() chains evaluate in order
    idx: Column | None = None
    for i, rule in enumerate(rules):
        pred = compile_filter(rule["query"], df=out)
        idx = F.when(pred, F.lit(i)) if idx is None else idx.when(pred, F.lit(i))
    rule_idx = idx.otherwise(F.lit(None)) if idx is not None else F.lit(None).cast("int")
    out = out.withColumn("__rule_idx", rule_idx)

    # 3. delete rules drop matched rows
    delete_idxs = [i for i, r in enumerate(rules) if r.get("delete")]
    if delete_idxs:
        out = out.where(F.col("__rule_idx").isNull() | ~F.col("__rule_idx").isin(delete_idxs))

    # 4. style overrides from the winning rule
    for sc in style_cols:
        expr: Column | None = None
        for i, rule in enumerate(rules):
            if sc in rule.get("styles", {}):
                v = F.lit(rule["styles"][sc])
                expr = F.when(F.col("__rule_idx") == i, v) if expr is None else expr.when(F.col("__rule_idx") == i, v)
        if expr is not None:
            base = F.col(sc) if sc in out.columns else F.lit(None)
            out = out.withColumn(sc, expr.otherwise(base))

    # 5. numeric coercion (reference index.mjs:296-303)
    for sc in NUMERIC_STYLE_PROPS:
        if sc in out.columns:
            out = out.withColumn(sc, F.col(sc).cast("double"))

    return out.drop("__rule_idx")
