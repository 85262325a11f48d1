"""Keyed-upsert state (SURVEY.md §2.10 T1–T3).

The reference's vessel cache (ais-proxy/server.js:365-619) is a
keyed mutable table: each message partially updates its key's row —
position messages carry kinematics, static messages carry identity
fields — with last-writer-wins per FIELD, newer-event-time-wins, and
a TTL.

Engine shape:
- **batch replay** (``keyed_upsert_batch``): last non-null value per
  field ordered by event time — one window pass, DuckDB-checkable.
- **streaming** (``keyed_upsert_stream``): the same merge as an
  ``applyInPandasWithState`` stateful operator with a processing-time
  TTL. The CORRECTNESS CONTRACT is batch/stream parity: replaying any
  prefix of the stream through the batch form must equal the
  streaming state (tested in tests/test_streaming.py) — this is how a
  non-SQL-expressible op gets verified (SURVEY §7 hard part #1).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def keyed_upsert_batch(
    df: DataFrame, key: str, ts: str, value_cols: list[str], *, tiebreak: str | None = None
) -> DataFrame:
    """Batch replay of the keyed upsert: per key, latest non-null
    value per field in event-time order.

    ``tiebreak`` (e.g. a message sequence number) extends the
    ordering to (ts, tiebreak) so equal event times resolve the same
    way in the batch window and the streaming merge — without it,
    order among tied timestamps is engine-arbitrary and batch/stream
    parity only holds on streams with strictly increasing ts per
    field. The tiebreak must make the ordering total per key."""
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cols = [F.col(key)] + [F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols]
    cols.append(F.max(F.col(ts)).over(w).alias(ts))
    return df.select(*cols).dropDuplicates([key])


def merge_group(
    rows: pd.DataFrame,
    state_row: pd.Series | None,
    ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> pd.Series:
    """Pure merge function: fold a batch of rows (ANY order, across
    ANY micro-batch split) into the state row.

    Per field, the value with the greatest event time among non-null
    observations wins — the state tracks a per-field timestamp
    (``__ts_<col>``) so an old event arriving in a LATER micro-batch
    cannot clobber newer state (reference J2 semantics,
    ais-proxy/server.js:1497-1507). This is what makes stream output
    equal the batch window replay regardless of batch boundaries.
    With ``tiebreak`` the guard compares (ts, tiebreak) pairs — state
    additionally tracks ``__tb_<col>`` — so ties resolve identically
    to the batch window's extended ordering. Kept pure so unit tests
    can fuzz it against the window form.
    """
    sort_cols = [ts] + ([tiebreak] if tiebreak else [])
    rows = rows.sort_values(sort_cols, kind="stable")
    merged = {} if state_row is None else dict(state_row)

    def wins(r, c) -> bool:
        field_ts = merged.get(f"__ts_{c}")
        if field_ts is None or pd.isna(field_ts):
            return True
        if r[ts] != field_ts:
            return r[ts] > field_ts
        if tiebreak is None:
            return True  # >= semantics: later-processed wins on ties
        field_tb = merged.get(f"__tb_{c}")
        return field_tb is None or pd.isna(field_tb) or r[tiebreak] >= field_tb

    for _, r in rows.iterrows():
        for c in value_cols:
            v = r[c]
            if pd.notna(v) and wins(r, c):
                merged[c] = v
                merged[f"__ts_{c}"] = r[ts]
                if tiebreak is not None:
                    merged[f"__tb_{c}"] = r[tiebreak]
        if ts not in merged or pd.isna(merged.get(ts)) or r[ts] > merged[ts]:
            merged[ts] = r[ts]
    return pd.Series(merged)


def keyed_upsert_stream(
    df: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    *,
    output_schema: StructType | str,
    state_schema: StructType | str,
    ttl_ms: int | None = None,
    tiebreak: str | None = None,
    tiebreak_type: str = "bigint",
):
    """Streaming keyed upsert via applyInPandasWithState.

    One state row per key; per-field newest-non-null merge; optional
    processing-time TTL (T2 — the reference's 6 h vessel retention).
    Use on a streaming DataFrame; returns the updated-state stream.

    ``state_schema`` lists ts + value columns; the per-field
    event-time guard columns (``__ts_<col> timestamp``, plus
    ``__tb_<col>`` when ``tiebreak`` is set) are appended
    automatically. Pass the same ``tiebreak`` to
    ``keyed_upsert_batch`` for parity on tied event times.
    """
    guard_ddl = ", ".join(f"__ts_{c} timestamp" for c in value_cols)
    if tiebreak is not None:
        guard_ddl += ", " + ", ".join(f"__tb_{c} {tiebreak_type}" for c in value_cols)
    if isinstance(state_schema, str):
        state_schema = state_schema + ", " + guard_ddl
    else:
        # StructType path gets the same appended guard fields — the
        # state tuple below always carries them, so a caller-provided
        # StructType without them would mis-zip on restore
        state_schema = StructType(list(state_schema.fields) + list(StructType.fromDDL(guard_ddl).fields))

    # state layout: ts, then value columns, then one per-field
    # event-time per value column (the newest-wins guard), then the
    # per-field tiebreak values when tie determinism is requested
    state_fields = [ts] + value_cols + [f"__ts_{c}" for c in value_cols]
    if tiebreak is not None:
        state_fields += [f"__tb_{c}" for c in value_cols]

    def fn(key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        prior = pd.Series(dict(zip(state_fields, state.get))) if state.exists else None
        merged = prior
        for pdf in pdfs:
            if len(pdf):
                merged = merge_group(pdf, merged, ts, value_cols, tiebreak)
        if merged is not None:
            state.update(tuple(merged.get(f) for f in state_fields))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            out = {k_col: [k_val] for k_col, k_val in zip([key], key_tuple)}
            out[ts] = [merged.get(ts)]
            for c in value_cols:
                out[c] = [merged.get(c)]
            yield pd.DataFrame(out)

    timeout = GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None else GroupStateTimeout.NoTimeout
    return df.groupBy(key).applyInPandasWithState(
        fn, outputStructType=output_schema, stateStructType=state_schema, outputMode="update", timeoutConf=timeout
    )


def sampled_side_effect(
    batch_df: DataFrame,
    batch_id: int,
    *,
    p: float,
    effect,
    seed: int = 7,
) -> int:
    """T7: probabilistically-gated side effect for ``foreachBatch``
    (ref ais-proxy/server.js:613 — ~1% of messages trigger a state
    snapshot).

    Spark shape: the gate is a SEEDED ``rand(seed) < p`` filter so
    replays of the same micro-batch sample the same rows (a bare
    ``Math.random()`` port would break exactly-once semantics on
    batch retry); ``effect`` receives only the sampled frame. Returns
    the sampled row count. Wire it as::

        stream.writeStream.foreachBatch(
            lambda df, bid: sampled_side_effect(df, bid, p=0.01, effect=fn)
        )
    """
    # localCheckpoint the (tiny) sample so the count action and the
    # effect's own action(s) scan the micro-batch source ONCE, not
    # once each — this is the streaming hot path, every trigger; the
    # checkpoint blocks are freed by id when the trigger is done
    from ..sources.tables import checkpoint_with_ids, unpersist_rdd_ids

    spark = batch_df.sparkSession
    # checkpoint_with_ids attributes the checkpoint's persistent RDD
    # directly off the returned plan, so concurrent streaming queries
    # (or any concurrent persist) need no coordination — the earlier
    # global-set diff could capture ANOTHER query's freshly-persisted
    # checkpoint RDD in its window, and the finally-block below would
    # then have unpersisted blocks that query still needed
    # (unrecoverable, since localCheckpoint truncates lineage).
    sampled, new_ids = checkpoint_with_ids(
        batch_df.where(F.rand(seed + batch_id) < p), eager=True
    )
    try:
        n = sampled.count()
        if n:
            effect(sampled, batch_id)
    finally:
        unpersist_rdd_ids(spark, new_ids)
    return n


def _tws_state_layout(
    state_schema: StructType | str,
    ts: str,
    value_cols: list[str],
    tiebreak: str | None,
    tiebreak_type: str,
) -> tuple[StructType | str, list[str]]:
    """Append the per-field newest-wins guard columns to the caller's
    state schema and return (full schema, field order) — shared by the
    applyInPandasWithState and transformWithStateInPandas forms so the
    two state layouts can never drift."""
    guard_ddl = ", ".join(f"__ts_{c} timestamp" for c in value_cols)
    if tiebreak is not None:
        guard_ddl += ", " + ", ".join(f"__tb_{c} {tiebreak_type}" for c in value_cols)
    if isinstance(state_schema, str):
        full = state_schema + ", " + guard_ddl
    else:
        full = StructType(list(state_schema.fields) + list(StructType.fromDDL(guard_ddl).fields))
    fields = [ts] + value_cols + [f"__ts_{c}" for c in value_cols]
    if tiebreak is not None:
        fields += [f"__tb_{c}" for c in value_cols]
    return full, fields


def make_upsert_processor(
    key: str,
    ts: str,
    value_cols: list[str],
    state_schema: StructType | str,
    *,
    ttl_ms: int | None = None,
    tiebreak: str | None = None,
):
    """StatefulProcessor class for :func:`keyed_upsert_stream_tws`,
    exposed at module level so its merge behavior is directly
    unit-testable (instantiate, init() with a fake handle whose
    getValueState returns a fake ValueState, drive handleInputRows)
    — the execution path through a live query needs the protobuf
    package Spark's tws driver worker imports, which this container
    does not ship."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _UpsertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("merged", state_schema, ttlDurationMs=ttl_ms)

        def handleInputRows(self, key_tuple, rows, timer_values):
            fields = self.state_fields
            prior = (
                pd.Series(dict(zip(fields, self._state.get())))
                if self._state.exists()
                else None
            )
            merged = prior
            for pdf in rows:
                if len(pdf):
                    merged = merge_group(pdf, merged, ts, value_cols, tiebreak)
            if merged is None:
                return
            self._state.update(tuple(merged.get(f) for f in fields))
            out = {k_col: [k_val] for k_col, k_val in zip([key], key_tuple)}
            out[ts] = [merged.get(ts)]
            for c in value_cols:
                out[c] = [merged.get(c)]
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    _UpsertProcessor.state_fields = _tws_state_layout(
        state_schema, ts, value_cols, tiebreak, "bigint"
    )[1]
    return _UpsertProcessor


def keyed_upsert_stream_tws(
    df: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    *,
    output_schema: StructType | str,
    state_schema: StructType | str,
    ttl_ms: int | None = None,
    tiebreak: str | None = None,
    tiebreak_type: str = "bigint",
):
    """The keyed upsert on Spark 4's ``transformWithStateInPandas`` —
    the modern arbitrary-state API (typed state variables, native
    per-state TTL, timers, RocksDB-backed) and the forward path for
    :func:`keyed_upsert_stream`'s ``applyInPandasWithState`` form.

    Identical merge semantics: the processor folds rows through the
    SAME :func:`merge_group` over the SAME state layout
    (:func:`_tws_state_layout` is shared), so the batch-replay parity
    contract transfers unchanged. Differences are operational, and
    both favor this form at scale:

    - **TTL is per-state-value and store-native** (``ttlDurationMs``
      on the ValueState): expiry happens inside the state store
      instead of via the operator's timeout callback, so an idle key
      needs no group invocation to be evicted. The old form's
      ProcessingTimeTimeout fires ``hasTimedOut`` callbacks — at
      100 TB/day of mostly-idle keys, that is a full state sweep of
      Python round trips per trigger interval.
    - **RocksDB state store required** (set
      ``spark.sql.streaming.stateStore.providerClass`` to the
      RocksDB provider): state lives off-heap with changelog
      checkpointing, which is what makes 10^9-key state tractable —
      the HDFS-backed default holds state on the JVM heap.

    Environment honesty: Spark's tws *driver worker* imports
    ``google.protobuf`` at query start; this container does not ship
    protobuf, so a live query fails fast at initialization here
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — measured, not
    assumed). Plan construction, analysis, and the processor's merge
    logic are all exercised by tests; the applyInPandasWithState
    form remains the fully-e2e-proven operator in this sandbox.

    Ref parity: same vessel-cache semantics as the reference
    (ais-proxy/server.js:365-619) — last-writer-wins per FIELD with
    newer-event-time guard, TTL retention.
    """
    full_state_schema, _ = _tws_state_layout(
        state_schema, ts, value_cols, tiebreak, tiebreak_type
    )
    processor_cls = make_upsert_processor(
        key, ts, value_cols, full_state_schema, ttl_ms=ttl_ms, tiebreak=tiebreak
    )
    # state TTL requires the processing-time clock; without TTL the
    # operator needs no clock at all
    time_mode = "ProcessingTime" if ttl_ms is not None else "None"
    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=processor_cls(),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode=time_mode,
    )
