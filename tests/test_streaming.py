"""Streaming keyed-upsert correctness: batch/stream parity
(SURVEY.md §7 hard part #1 — the check DuckDB can't run).
"""

from __future__ import annotations

import pandas as pd

from utils_infra_spark.streaming.upsert import keyed_upsert_batch, merge_group

VALUE_COLS = ["lat", "lon", "name", "ship_type"]


def rows_df(spark):
    # out-of-order, per-field-partial messages for two keys
    rows = [
        # (mmsi, ts, lat, lon, name, ship_type)
        (1, "2024-01-01 10:00:00", -41.0, 174.0, None, None),
        (1, "2024-01-01 10:05:00", None, None, "ALPHA", 70),
        (1, "2024-01-01 10:02:00", -41.1, 174.1, None, None),  # late
        (2, "2024-01-01 09:00:00", None, None, "BRAVO", None),
        (2, "2024-01-01 11:00:00", -36.8, 174.7, None, 80),
    ]
    df = spark.createDataFrame(
        rows, "mmsi int, ts string, lat double, lon double, name string, ship_type int"
    )
    return df.selectExpr("mmsi", "cast(ts as timestamp) ts", "lat", "lon", "name", "ship_type")


def test_batch_upsert_latest_non_null(spark):
    out = {r.mmsi: r for r in keyed_upsert_batch(rows_df(spark), "mmsi", "ts", VALUE_COLS).collect()}
    # key 1: position from 10:00 (10:02 arrives later in event time →
    # 10:02 wins over 10:00), name/type from 10:05
    assert out[1].lat == -41.1 and out[1].lon == 174.1
    assert out[1].name == "ALPHA" and out[1].ship_type == 70
    assert str(out[1].ts) == "2024-01-01 10:05:00"
    # key 2: static from 09:00 kept, position+type from 11:00
    assert out[2].name == "BRAVO" and out[2].lat == -36.8 and out[2].ship_type == 80


def test_merge_group_matches_batch_replay(spark):
    """Parity: folding micro-batches through merge_group == one batch
    window pass, for any batch split."""
    pdf = rows_df(spark).toPandas()
    batch = keyed_upsert_batch(rows_df(spark), "mmsi", "ts", VALUE_COLS).toPandas().set_index("mmsi")

    for split in (1, 2, 5):  # different micro-batch sizes
        for key, grp in pdf.groupby("mmsi"):
            state = None
            grp = grp.reset_index(drop=True)
            for start in range(0, len(grp), split):
                state = merge_group(grp.iloc[start : start + split], state, "ts", VALUE_COLS)
            want = batch.loc[key]
            for c in VALUE_COLS:
                got_v, want_v = state.get(c), want[c]
                assert (pd.isna(got_v) and pd.isna(want_v)) or got_v == want_v, (key, c, got_v, want_v)
            assert state["ts"] == want["ts"]


def test_merge_group_out_of_order_within_batch():
    ts = pd.to_datetime
    batch = pd.DataFrame(
        {
            "ts": [ts("2024-01-01 10:05"), ts("2024-01-01 10:00")],
            "lat": [None, -40.0],
            "lon": [None, 170.0],
            "name": ["NEWER", "OLDER"],
            "ship_type": [None, None],
        }
    )
    merged = merge_group(batch, None, "ts", VALUE_COLS)
    assert merged["name"] == "NEWER"  # 10:05 beats 10:00 after sort
    assert merged["lat"] == -40.0  # only non-null observation wins
    assert merged["ts"] == ts("2024-01-01 10:05")


def tie_rows_df(spark):
    """Two messages per key with IDENTICAL event times but different
    values — only a tiebreak can order them deterministically."""
    rows = [
        # (mmsi, ts, seq, lat, lon, name, ship_type)
        (1, "2024-01-01 10:00:00", 2, -41.2, 174.2, None, None),
        (1, "2024-01-01 10:00:00", 1, -41.1, 174.1, None, None),  # loses tie
        (1, "2024-01-01 09:00:00", 9, None, None, "OLD", None),
        (2, "2024-01-01 10:00:00", 5, None, None, "X", 70),
        (2, "2024-01-01 10:00:00", 7, None, None, "Y", None),  # wins name tie
    ]
    df = spark.createDataFrame(
        rows, "mmsi int, ts string, seq bigint, lat double, lon double, name string, ship_type int"
    )
    return df.selectExpr("mmsi", "cast(ts as timestamp) ts", "seq", "lat", "lon", "name", "ship_type")


def test_tiebreak_batch_resolves_equal_timestamps(spark):
    out = {
        r.mmsi: r
        for r in keyed_upsert_batch(
            tie_rows_df(spark), "mmsi", "ts", VALUE_COLS, tiebreak="seq"
        ).collect()
    }
    assert out[1].lat == -41.2  # seq 2 beats seq 1 at the same ts
    assert out[2].name == "Y" and out[2].ship_type == 70


def test_tiebreak_parity_across_any_batch_split(spark):
    """With a tiebreak, stream-merge == batch-window even when ties
    land in DIFFERENT micro-batches in unfavorable order."""
    pdf = tie_rows_df(spark).toPandas()
    batch = (
        keyed_upsert_batch(tie_rows_df(spark), "mmsi", "ts", VALUE_COLS, tiebreak="seq")
        .toPandas()
        .set_index("mmsi")
    )
    # adversarial replay order: tie-winners arrive FIRST, losers later
    # (relying on arrival order would give the wrong answer)
    pdf = pdf.sort_values("seq", ascending=False).reset_index(drop=True)
    for split in (1, 2, 5):
        for key, grp in pdf.groupby("mmsi"):
            state = None
            grp = grp.reset_index(drop=True)
            for i in range(0, len(grp), split):
                state = merge_group(grp.iloc[i : i + split], state, "ts", VALUE_COLS, tiebreak="seq")
            for c in VALUE_COLS:
                expect = batch.loc[key, c]
                got = state.get(c)
                assert (pd.isna(expect) and pd.isna(got)) or expect == got, (split, key, c, expect, got)


def test_sampled_side_effect_deterministic_gate(spark):
    from utils_infra_spark.streaming.upsert import sampled_side_effect

    df = spark.range(2000).withColumnRenamed("id", "mmsi")
    calls = []

    def effect(sampled, bid):
        calls.append((bid, sorted(r.mmsi for r in sampled.collect())))

    n1 = sampled_side_effect(df, 3, p=0.01, effect=effect)
    n2 = sampled_side_effect(df, 3, p=0.01, effect=effect)
    assert 0 < n1 < 200  # ~1% of 2000, loose bound
    assert n1 == n2 and calls[0] == calls[1]  # replay samples identically
    n3 = sampled_side_effect(df, 4, p=0.01, effect=effect)
    assert calls[2][1] != calls[0][1] or n3 != n1  # batch id varies the draw
    # empty sample -> effect not invoked
    before = len(calls)
    assert sampled_side_effect(df.limit(0), 5, p=0.5, effect=effect) == 0
    assert len(calls) == before
