"""Stream-stream interval join (Structured Streaming, beyond the
reference's streaming surface).

The batch engine already has the as-of / range-join family
(operators/temporal.py); this is their STREAMING sibling: join two
live streams on a key where the right event's time falls inside an
interval anchored at the left event's time — the click-to-purchase /
impression-to-conversion shape every training-data attribution
pipeline needs.

Engine shape at 100 TB: Spark's StreamingSymmetricHashJoin keeps BOTH
sides' unmatched rows in keyed state; the WATERMARKS plus the time
bound are what make that state bounded — each side's state evicts
rows older than (its watermark minus the interval slack), so state
size tracks the interval width x input rate, never the stream length.
Without the time-range condition Spark rejects an inner stream-stream
join outright (unbounded state), which is the right refusal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 seconds",
    watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames: rows pair when keys match and
    ``right_ts`` lies in ``[left_ts + lower, left_ts + upper]``.

    Column-name contract: all of ``right``'s columns except the key
    get an ``r_`` prefix (stream-stream joins forbid post-join
    disambiguation tricks that rely on exchange reuse, and prefixing
    keeps the output schema stable for sinks).

    ``how``: 'inner' or 'leftOuter' — the outer form emits the
    unmatched LEFT row with nulls once the watermark proves no match
    can still arrive (the streaming analog of the batch as-of's
    no-match passthrough).

    Value contract (pinned by e2e test): a stream fed the same rows in
    any micro-batch split ends with exactly the batch join's result —
    the interval condition is pure row math and the watermark only
    bounds STATE, never the answer, as long as data respects it.
    """
    if how not in ("inner", "leftOuter", "left_outer", "left"):
        # rightOuter/fullOuter are legal stream-stream joins in Spark,
        # but this function's key reconstruction (rename left key,
        # drop right key) would null the key on right-only rows —
        # refuse loudly instead of emitting key-less output
        raise ValueError(f"how={how!r}: only inner / leftOuter are supported")
    lkey, rkey = f"__l_{key}", f"__r_{key}"
    # the rename scheme must not land on names the inputs already use,
    # or the join output silently carries duplicate/ambiguous columns —
    # fail loudly like the join-type guard above. Two hazards: (a) any
    # duplicate among the POST-rename names of both sides (e.g. left
    # already carries r_<x> or __l_<key>, right carries __r_<key>);
    # (b) a rename-chain collision inside right (right has both x and
    # r_x: renaming x -> r_x momentarily duplicates r_x and the later
    # rename sweeps up both copies).
    reserved = sorted({lkey, rkey}.intersection({*left.columns, *right.columns}))
    lw_names = [lkey if c == key else c for c in left.columns]
    rw_names = [rkey if c == key else f"r_{c}" for c in right.columns]
    seen: set[str] = set()
    dups = sorted({c for c in lw_names + rw_names if c in seen or seen.add(c)})
    chain = sorted(
        {f"r_{c}" for c in right.columns if c != key}.intersection(right.columns) - {key}
    )
    if reserved or dups or chain:
        raise ValueError(
            "stream_interval_join name collision: "
            f"reserved name(s) {reserved} on an input, "
            f"duplicate post-rename column(s) {dups}, "
            f"right-side r_-prefix chain collision(s) {chain}; "
            "rename the offending columns before joining"
        )
    lw = left.withColumnRenamed(key, lkey).withWatermark(left_ts, watermark)
    prefixed = right.withColumnRenamed(key, rkey)
    for c in right.columns:
        if c != key:
            prefixed = prefixed.withColumnRenamed(c, f"r_{c}")
    rw = prefixed.withWatermark(f"r_{right_ts}", watermark)
    cond = (
        (F.col(lkey) == F.col(rkey))
        & (F.col(f"r_{right_ts}") >= F.expr(f"{left_ts} + INTERVAL {lower}"))
        & (F.col(f"r_{right_ts}") <= F.expr(f"{left_ts} + INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, how)
    return joined.withColumnRenamed(lkey, key).drop(rkey)
