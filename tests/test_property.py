"""Property-based tests (hypothesis) — the test strategy SURVEY §5
prescribes: parser round-trips, merge-function/batch-replay parity,
date-format round-trips, salted-aggregate equivalence.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from utils_infra_spark.plans.filter_dsl import parse_filter
from utils_infra_spark.streaming.upsert import merge_group

# ---------------------------------------------------------------- DSL parser

_paths = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_ops = st.sampled_from(["==", "!=", ">", "<", ">=", "<="])
_numbers = st.integers(min_value=-10**6, max_value=10**6)


@given(path=_paths, op=_ops, value=_numbers)
@settings(max_examples=200, deadline=None)
def test_compare_roundtrip(path, op, value):
    n = parse_filter(f"{path} {op} {value}")
    assert (n.type, n.path, n.op, n.value) == ("compare", path, op, value)


@given(path=_paths, div=st.integers(1, 10**4), op=_ops, value=_numbers)
@settings(max_examples=100, deadline=None)
def test_modulo_roundtrip(path, div, op, value):
    n = parse_filter(f"{path} % {div} {op} {value}")
    assert (n.type, n.path, n.divisor, n.op, n.value) == ("modulo", path, div, op, value)


@given(path=_paths, values=st.lists(_numbers, min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_in_roundtrip(path, values):
    n = parse_filter(f"{path} in [{', '.join(map(str, values))}]")
    assert (n.type, n.path, n.value) == ("in", path, values)


@given(
    terms=st.lists(
        st.tuples(_paths, _ops, _numbers), min_size=2, max_size=5
    )
)
@settings(max_examples=100, deadline=None)
def test_and_chain_roundtrip(terms):
    expr = " and ".join(f"{p} {o} {v}" for p, o, v in terms)
    n = parse_filter(expr)
    assert n.type == "and" and len(n.children) == len(terms)
    for child, (p, o, v) in zip(n.children, terms):
        assert (child.path, child.op, child.value) == (p, o, v)


# ------------------------------------------------- merge/batch-replay parity

_events = st.lists(
    st.tuples(
        st.integers(0, 3),                     # key
        st.integers(0, 50),                    # ts offset (minutes) — duplicates allowed
        st.one_of(st.none(), st.floats(-90, 90, allow_nan=False)),   # field a
        st.one_of(st.none(), st.sampled_from(["X", "Y", "Z"])),      # field b
    ),
    min_size=1,
    max_size=30,
)


def _batch_ground_truth(pdf: pd.DataFrame, key: str, ts: str, cols: list[str]) -> dict:
    """Pure-pandas analog of keyed_upsert_batch: per key, last
    non-null per field in (ts, arrival) order."""
    out = {}
    for k, grp in pdf.groupby(key):
        grp = grp.sort_values([ts, "__arrival"], kind="stable")
        row = {}
        for c in cols:
            nn = grp[grp[c].notna()]
            row[c] = nn[c].iloc[-1] if len(nn) else None
        row[ts] = grp[ts].max()
        out[k] = row
    return out


@given(events=_events, split=st.integers(1, 7))
@settings(max_examples=150, deadline=None)
def test_merge_group_equals_batch_replay_any_split(events, split):
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "key": [e[0] for e in events],
            "ts": [base + pd.Timedelta(minutes=e[1]) for e in events],
            "a": [e[2] for e in events],
            "b": [e[3] for e in events],
            "__arrival": range(len(events)),
        }
    )
    want = _batch_ground_truth(pdf, "key", "ts", ["a", "b"])

    for k, grp in pdf.groupby("key"):
        state = None
        grp = grp.reset_index(drop=True)
        for start in range(0, len(grp), split):
            state = merge_group(grp.iloc[start : start + split], state, "ts", ["a", "b"])
        for c in ("a", "b"):
            got_v, want_v = state.get(c), want[k][c]
            got_null = got_v is None or (isinstance(got_v, float) and got_v != got_v)
            want_null = want_v is None
            if got_null or want_null:
                assert got_null and want_null, (k, c, got_v, want_v)
            else:
                assert got_v == want_v, (k, c, got_v, want_v)
        assert state["ts"] == want[k]["ts"]


# ------------------------------------------------------- as-of join property

_asof_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=12
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=0, max_size=12
)


@given(left=_asof_left, right=_asof_right)
@settings(max_examples=15, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_backward_join ≡ pandas merge_asof (backward, inclusive,
    greatest-tiebreak-wins on equal timestamps) on arbitrary inputs."""
    from utils_infra_spark.operators.temporal import asof_backward_join

    ldf = pd.DataFrame(left, columns=["k", "ts"]).assign(lid=range(len(left)))
    rrows = [(k, t, i) for i, (k, t) in enumerate(right)]
    rdf = pd.DataFrame(rrows, columns=["k", "ts", "tb"])

    sl = spark.createDataFrame(ldf, "k: long, ts: long, lid: long")
    sr = spark.createDataFrame(rdf, "k: long, ts: long, tb: long") if len(rdf) else (
        spark.createDataFrame([], "k: long, ts: long, tb: long")
    )
    got = (
        asof_backward_join(sl, sr, "k", "ts", "ts", ["tb"], tiebreak="tb")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    if len(rdf):
        # merge_asof keeps the LAST right row among equal ts values;
        # sorting right by (ts, tb) makes that the greatest tiebreak
        want = pd.merge_asof(
            ldf.sort_values("ts", kind="stable"),
            rdf.sort_values(["ts", "tb"], kind="stable"),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        ).sort_values("lid").reset_index(drop=True)
        want_tb = want["tb"]
    else:
        want_tb = pd.Series([float("nan")] * len(ldf))

    for g, w in zip(got["matched_tb"], want_tb):
        g_null, w_null = pd.isna(g), pd.isna(w)
        assert g_null == w_null and (g_null or int(g) == int(w)), (left, right, got, want_tb)


# ------------------------------------------------------ range join property

_points = st.lists(st.integers(-50, 50), min_size=1, max_size=15)
_ivals = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 30)), min_size=0, max_size=10
)


@given(points=_points, ivals=_ivals, bin_width=st.sampled_from([1, 3, 7, 16]))
@settings(max_examples=15, deadline=None)
def test_range_join_matches_quadratic_reference(spark, points, ivals, bin_width):
    """range_join_binned ≡ the naive all-pairs containment check for
    every bin width, including negative coordinates and empty/zero-
    width intervals ([s, s) matches nothing)."""
    from utils_infra_spark.operators.temporal import range_join_binned

    pdf = [(i, p) for i, p in enumerate(points)]
    idf = [(j, s, s + ln) for j, (s, ln) in enumerate(ivals)]
    sp = spark.createDataFrame(pdf, "pid: long, p: long")
    si = spark.createDataFrame(idf, "iid: long, s: long, e: long") if idf else (
        spark.createDataFrame([], "iid: long, s: long, e: long")
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_binned(sp, si, "p", "s", "e", bin_width=bin_width).collect()
    }
    want = {
        (i, j) for i, p in pdf for j, s, e in idf if s <= p < e
    }
    assert got == want, (points, ivals, bin_width)
