"""Temporal join operators: as-of join and binned range join.

Neither exists as a Spark builtin; both are re-expressed as
compositions of native DataFrame ops so the whole plan stays inside
Catalyst/whole-stage-codegen (no UDFs, no per-row Python).

Scale shapes:

- ``asof_backward_join``: the naive formulation (inequality join +
  keep-latest) explodes to O(|L|·|R|) pairs per key before pruning.
  The union-window form here is linear: tag the two inputs, union
  them, and run ONE window sort per key carrying the right-side
  payload forward with ``last(ignorenulls)``. Cost = one shuffle on
  the key — identical to the groupBy it generalizes — so it survives
  a 100 TB left side as long as keys distribute (skew is AQE/salt
  territory, same as any keyed op).

- ``range_join_binned``: interval-containment joins have no equi key,
  and Spark would fall back to BroadcastNestedLoopJoin (all-pairs).
  Binning manufactures the equi key: each interval is exploded to the
  fixed-width bins it covers, each point hashes to exactly one bin,
  and the join runs as a plain shuffle-hash/sort-merge join on the
  bin id followed by the exact containment filter. The blow-up factor
  is bounded by interval_len/bin_width + 1 copies of the (narrow)
  interval side — pick ``bin_width`` near the median interval length
  so the factor stays ~2. Mirrors the range-join optimization in
  engines like Databricks' range join hint, built from explode+join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    *,
    tiebreak: str | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Attach to each left row the most recent right row at-or-before it.

    For every left row, finds the right row with the greatest
    ``right_ts <= left_ts`` sharing ``key`` (backward as-of, inclusive
    — the DuckDB/pandas ``merge_asof`` default) and appends that row's
    ``payload_cols`` as ``<prefix><col>`` (NULL when no right row
    precedes the left row). ``tiebreak`` makes the match deterministic
    when several right rows share a timestamp: the greatest tiebreak
    value wins; pass a unique right-side column.

    Plan: union the tagged sides, one window per key ordered by
    (ts, side, tiebreak) carrying the matched right row forward as ONE
    struct via ``last(ignorenulls)`` — the struct is non-null whenever
    a right row exists, so a legitimately-NULL payload FIELD inside
    the matched row survives (per-column ignorenulls would skip it and
    stitch values from different right rows); right rows sort before
    left rows on equal timestamps so the match is inclusive.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    out_names = [f"{prefix}{c}" for c in payload_cols]
    ptype = StructType([StructField(c, right.schema[c].dataType, True) for c in payload_cols])

    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(ptype).alias("__p"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "__side",
        *lcols,
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return filled.where(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__p")[c].alias(n) for c, n in zip(payload_cols, out_names)],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_width: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join points into half-open intervals ``[start, end)``.

    ``point_col``/``start_col``/``end_col`` must be integral (e.g.
    ``unix_micros`` of a timestamp); ``bin_width`` is in the same
    unit. ``extra_keys`` adds equi-join keys on top of the bin id
    (columns present on both sides). Output = all point columns plus
    all interval columns, one row per (point, containing interval).
    """
    extra = extra_keys or []
    # integer `div`, not float division: epoch-microsecond values sit
    # near 2^50 where a double-divide-then-floor can misbin boundary
    # points
    binned_ivals = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS BIGINT) div {bin_width}"),
                # end is exclusive, but the point filter re-checks
                # exactly; sequence end floor(end/w) over-covers by at
                # most one bin
                F.expr(f"CAST({end_col} AS BIGINT) div {bin_width}"),
            )
        ),
    )
    binned_points = points.withColumn("__bin", F.expr(f"CAST({point_col} AS BIGINT) div {bin_width}"))
    joined = binned_points.join(binned_ivals, on=["__bin", *extra]).where(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bin")


def scalar_subquery(df: DataFrame, agg: Column) -> DataFrame:
    """One-row aggregate for use as a broadcast 'scalar subquery'.

    ``df.crossJoin(F.broadcast(scalar_subquery(...)))`` is the
    declarative Spark spelling of ``WHERE x > (SELECT avg(...) ...)``
    — the 1-row side broadcasts, so it adds no shuffle to the outer
    plan.
    """
    return df.agg(agg)


def scd2_history(
    df: DataFrame,
    key: str,
    ts: str,
    state_cols: list[str],
    *tie_break: str,
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history from an event stream:
    per key, collapse CONSECUTIVE rows with identical ``state_cols``
    (only actual state CHANGES open a new version), then interval-ize
    — each version is valid ``[valid_from, valid_to)`` with
    ``valid_to`` = the next change's timestamp (NULL + ``is_current``
    on the open version). The dimension-table shape every warehouse
    derives from a CDC/event feed.

    Determinism: ordering is ``(ts, tie_break...)`` — give a unique id
    when timestamps can collide. Change detection is null-safe
    (NULL → value and value → NULL both open versions).

    Precondition: ``ts`` is NON-NULL. A NULL timestamp cannot anchor a
    validity interval (NULL valid_from/valid_to already means "open"),
    and engines disagree on NULL ordering (Spark ASC = NULLS FIRST,
    DuckDB = NULLS LAST), so results over NULL-ts rows are
    engine-dependent by construction. First-row detection uses
    ``row_number() == 1`` (not ``lag(ts) IS NULL``), so even under a
    violated precondition a mid-sequence NULL ts never silently opens
    a spurious version.

    Engine shape: ONE shuffle on the key feeds BOTH window passes
    (change-flag lag, then interval lead over the collapsed rows —
    same partitioning, Spark reuses the exchange) — the whole history
    builds in a single corpus pass, no self-joins.
    """
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in tie_break]
    w = Window.partitionBy(key).orderBy(*order)
    changed = F.lit(False)
    for c in state_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # row_number()==1 opens the first version per key; lag(ts).isNull()
    # would also fire mid-sequence after a NULL-ts row (precondition
    # violation) and open a version that isn't a state change
    versions = (
        df.withColumn("__chg", changed | (F.row_number().over(w) == 1))
        .where(F.col("__chg"))
        .drop("__chg")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return versions.select(
        key,
        *state_cols,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.lead(ts).over(w2).isNull().alias("is_current"),
    )


def retract_aggregate_merge(
    base_aggs: DataFrame,
    log: DataFrame,
    key: str,
    *,
    micro_col: str = "total_micro",
    n_col: str = "n",
    sign_col: str = "sign",
    log_micro_col: str = "micro",
) -> DataFrame:
    """Incremental aggregate maintenance, the Flink retract-stream
    model: ``base_aggs`` is a per-key snapshot ``(key, n_col,
    micro_col)`` (counts + FIXED-POINT integer sums — exact,
    merge-order-free); ``log`` carries signed rows ``(key, sign_col ∈
    {+1, -1}, log_micro_col)`` — an insert contributes +, a retraction
    − the SAME value it inserted. The merged result equals a full recompute over
    base ∪ log, but the base FACTS never rescan: at 100 TB a daily
    update touches the log (small) plus the aggregate snapshot (one
    narrow row per key), never the corpus.

    Keys whose merged count reaches 0 drop (fully retracted); a
    negative merged count means the log retracted rows the base never
    held — the algebra carries it through honestly rather than
    masking the inconsistency.
    """
    delta = log.groupBy(key).agg(
        F.sum(F.col(sign_col)).alias("__dn"),
        F.sum(F.col(sign_col) * F.col(log_micro_col)).alias("__dmicro"),
    )
    merged = base_aggs.join(delta, key, "full_outer").select(
        key,
        (F.coalesce(F.col(n_col), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))).alias(n_col),
        (
            F.coalesce(F.col(micro_col), F.lit(0).cast("bigint"))
            + F.coalesce(F.col("__dmicro"), F.lit(0).cast("bigint"))
        ).alias(micro_col),
    )
    return merged.where(F.col(n_col) != 0)


def interval_coalesce(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    *tie_break: str,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    disjoint spans — the interval-union / coverage-span operator
    (uptime windows, sensor coverage, blackout merging). Distinct from
    gap sessionization: interval ENDS need not be monotone with
    starts, so the span test compares each start against the RUNNING
    MAX of all previous ends, not the previous row's end (a long
    interval can swallow many later short ones).

    Intervals are half-open ``[start, end)``; touching intervals
    (``start == prev_end``) merge. Output: one row per
    ``(key, span_id)`` with ``span_start``, ``span_end``,
    ``n_intervals``; ``span_id`` numbers spans per key from 1 in span
    order (deterministic). ``tie_break`` columns extend the ordering
    for full determinism when (start, end) can collide — though span
    boundaries are value-determined either way (identical sort keys
    carry identical values into the running max).

    Precondition: ``start`` and ``end`` are NON-NULL (a NULL endpoint
    has no place on a span, and engines disagree on NULL ordering —
    Spark ASC = NULLS FIRST, DuckDB = NULLS LAST — so NULL rows would
    make span numbering engine-dependent; same contract as
    scd2_history's ts).

    Engine shape: ONE shuffle on the key feeds both window passes
    (running-max flag, running-sum span numbering — same
    partitioning + ordering, one sort) and the final
    (key, span_id) aggregate — hashpartitioning(key) satisfies the
    superset clustering, exactly the sessionize_events plan shape.
    """
    # every internal AND output name is reserved: a key column named
    # span_start/span_end/n_intervals would otherwise reach the final
    # aggregate as both a grouping column and an agg alias — duplicate
    # output columns instead of a loud failure (r9 ADVICE)
    reserved = {"__new_span", "span_id", "span_start", "span_end", "n_intervals"}.intersection(
        df.columns
    )
    if reserved:
        raise ValueError(
            f"interval_coalesce: input columns {sorted(reserved)} collide "
            "with internal/output names; rename them first"
        )
    order = [F.col(start).asc(), F.col(end).asc()] + [F.col(c).asc() for c in tie_break]
    w = Window.partitionBy(key).orderBy(*order)
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "__new_span",
        F.when(prev_max_end.isNull() | (F.col(start) > prev_max_end), 1).otherwise(0),
    )
    spans = flagged.withColumn(
        "span_id",
        F.sum("__new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )
    return spans.groupBy(key, "span_id").agg(
        F.min(start).alias("span_start"),
        F.max(end).alias("span_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
