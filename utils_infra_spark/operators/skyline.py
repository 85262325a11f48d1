"""2-D Pareto frontier (skyline) as a sort-free composition of
DataFrame aggregates — no quadratic dominance join.

The textbook skyline query ("parts no other part beats on BOTH price
and size") is naturally a NOT EXISTS self-join — O(n²) pairs, a
BroadcastNestedLoopJoin in Spark. In 2-D it collapses to one keyed
aggregate plus one running max over the DISTINCT key values:

1. per distinct x: ymax(x) = max(y)            (shuffle on x, bounded
   by the number of distinct x values, map-side combine)
2. over distinct x ascending: prev(x) = max ymax over all smaller x
   (a window on the AGGREGATED table — tiny — not the corpus)
3. a row is on the frontier iff y == ymax(x) AND (prev(x) is null OR
   prev(x) < y)

Step 3 re-touches the corpus once via an equi-join on x (broadcast
when the distinct-x table is small). Total: one corpus aggregate +
one corpus join; the only global ordering happens over distinct x.

Set semantics: ALL rows tied on a frontier point are kept (no strict
dominance between equal points), so the result needs no tiebreak and
is deterministic for any input order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    minimize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """Rows not strictly dominated on (x, y).

    Defaults: smaller x is better, larger y is better; flip with the
    keyword flags (internally the worse-direction column is negated —
    exact for doubles and integers). Row r is dominated iff some s has
    x_s at-least-as-good AND y_s at-least-as-good with one strictly
    better. Output keeps every input column; NULL x or y rows are
    dropped (a NULL measure can neither dominate nor be ranked).
    """
    reserved = {"__x", "__y", "__ymax", "__prev"}.intersection(df.columns)
    if reserved:
        raise ValueError(
            f"pareto_frontier_2d: input columns {sorted(reserved)} collide "
            "with internal names; rename them first"
        )
    sx = F.col(x_col) if minimize_x else -F.col(x_col)
    sy = F.col(y_col) if maximize_y else -F.col(y_col)
    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).withColumns(
        {"__x": sx, "__y": sy}
    )
    xagg = base.groupBy("__x").agg(F.max("__y").alias("__ymax"))
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    xr = xagg.withColumn("__prev", F.max("__ymax").over(w))
    keep = (F.col("__y") == F.col("__ymax")) & (
        F.col("__prev").isNull() | (F.col("__prev") < F.col("__y"))
    )
    return (
        base.join(xr, "__x")
        .where(keep)
        .drop("__x", "__y", "__ymax", "__prev")
    )
