"""r9 self-review regression fixtures: engine-pair parity on content
the generated testdata never contains (NULL first states, vertical
tabs in langid normalization, NULL measure values) — the same
fixture-net pattern as test_whitespace_fixtures.py."""

from __future__ import annotations

import duckdb
import pandas as pd

from test_oracle_parity import canonicalize
from utils_infra_spark.queries import REGISTRY, _load

_load()


def _assert_parity(name, got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
    assert sorted(got.columns) == sorted(want.columns)
    g, w = canonicalize(got), canonicalize(want)
    assert g.equals(w), f"{name}: values differ\nspark:\n{g}\noracle:\n{w}"


def test_scd2_null_first_state_parity(spark):
    """A key whose FIRST state is NULL must still open a version on
    BOTH engines: Spark's row_number()==1 rule always opens it; the
    oracle needs the rn=1 disjunct because NULL IS DISTINCT FROM NULL
    is false (lag of the first row is NULL)."""
    from utils_infra_spark.operators.temporal import scd2_history

    rows = [
        (1, None, 5, 100),   # first state NULL -> must open
        (1, "a", 10, 101),
        (1, "a", 20, 102),   # no change
        (2, "b", 1, 200),    # control key
    ]
    sdf = spark.createDataFrame(rows, "user_id long, event_type string, ts long, event_id long")
    got = (
        scd2_history(sdf, "user_id", "ts", ["event_type"], "event_id")
        .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
        .toPandas()
    )
    assert len(got) == 3  # (1, NULL), (1, 'a'), (2, 'b')
    con = duckdb.connect()
    con.register("ev_rows", pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id"]))
    con.execute("CREATE VIEW events AS SELECT * FROM ev_rows")
    want = con.execute(REGISTRY["scd2_user_state_history"].oracle).df()
    _assert_parity("scd2_null_first_state", got, want)


def test_langid_vertical_tab_parity(spark):
    """Normalization must use the EXPLICIT whitespace class: Java \\s
    matches U+000B, RE2's does not — a VT in the corpus must produce
    the same trigram profiles (hence predictions) on both engines."""
    from utils_infra_spark.pipeline.text import langid_trigram

    rows = [
        (1, "alpha\x0bbeta alpha\x0bbeta", "xx"),
        (2, "alpha beta gamma", "xx"),
        (3, "zzz qqq zzz qqq yyy", "yy"),
        (4, "ab", "yy"),        # unscorable
        (5, None, "yy"),        # null text
        (6, "\x0b\x0b", "xx"),  # whitespace-only after normalization
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # top_m must match the registered oracle's profile size (40)
    got = langid_trigram(sdf, "text", "lang", "doc_id", top_m=40).toPandas()
    con = duckdb.connect()
    con.register("doc_rows", pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM doc_rows")
    want = con.execute(REGISTRY["langid_trigram_documents"].oracle).df()
    _assert_parity("langid_vt", got, want)


def test_histogram_quantiles_null_values_excluded(spark):
    """NULL measures contribute to neither bins nor totals (a NULL bin
    would sort NULLS-FIRST in Spark, NULLS-LAST in DuckDB, shifting
    every cumulative count)."""
    from utils_infra_spark.pipeline.sketch import histogram_quantile_brackets

    df = spark.createDataFrame(
        [(None,), (1.0,), (2.0,), (3.0,), (4.0,)], "v double"
    )
    out = {
        r["q_ppm"]: (r["bin"], r["cum"], r["total"])
        for r in histogram_quantile_brackets(
            df, "v", bin_micro=1_000_000, qs_ppm=[500_000]
        ).collect()
    }
    # N = 4 (NULL excluded): p50 target = 2 -> bin 2 (values 1,2) cum 2
    assert out[500_000] == (2, 2, 4)


def test_interval_coalesce_null_value_parity(spark):
    """r9 ADVICE: a NULL `value` makes the interval end NULL, which
    sits in the middle (s, e, event_id) sort key where Spark (NULLS
    FIRST) and DuckDB (NULLS LAST) order differently — both the query
    and its oracle now EXCLUDE NULL-endpoint rows, so the fixture must
    come back identical with the NULL row absent from the spans."""
    import datetime as dt

    from pyspark.sql import functions as F

    from utils_infra_spark.functions.datetimes import epoch_micros
    from utils_infra_spark.operators.temporal import interval_coalesce

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: [0,10s) and [5s,8s) overlap; the NULL-value event at
        # 6s would otherwise sort engine-differently inside the span
        (1, 100, t0, 10.0),
        (1, 101, t0 + dt.timedelta(seconds=5), 3.0),
        (1, 102, t0 + dt.timedelta(seconds=6), None),
        (1, 103, t0 + dt.timedelta(seconds=20), 1.0),
        (2, 200, t0, None),  # a user whose ONLY event is NULL-valued
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "value"])
    sdf = spark.createDataFrame(pdf)
    ev = sdf.where(F.col("ts").isNotNull() & F.col("value").isNotNull())
    em = epoch_micros(ev, "ts")
    iv = ev.select(
        "user_id",
        "event_id",
        em.alias("s"),
        (em + F.expr("CAST(FLOOR((value) * 1000000 + 0.5) AS BIGINT)")).alias("e"),
    )
    got = interval_coalesce(iv, "user_id", "s", "e", "event_id").toPandas()
    con = duckdb.connect()
    con.register("ev_rows", pdf)
    con.execute("CREATE VIEW events AS SELECT * FROM ev_rows")
    want = con.execute(REGISTRY["interval_coalesce_user_activity"].oracle).df()
    assert set(want["user_id"]) == {1}  # user 2 drops entirely
    assert len(want) == 2  # [0,10s) swallowing [5,8s); [20,21s)
    _assert_parity("interval_coalesce_null_value", got, want)
