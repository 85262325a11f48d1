"""Unit tests for operators/ranking.py: the two-level distributed
global rank (value-binned, no single-task window) and the
sorted-neighborhood pair generator built on it."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from utils_infra_spark.operators.ranking import global_rank, sorted_neighborhood_pairs


def _window_rank(df, order_cols, partition_cols=None):
    w = (Window.partitionBy(*partition_cols) if partition_cols else Window.partitionBy(F.lit(0))).orderBy(
        *order_cols
    )
    return df.withColumn("rank", F.row_number().over(w).cast("bigint"))


def test_global_rank_equals_window_row_number_numeric(spark):
    rows = [(i, float((i * 37) % 101) / 3.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "rid bigint, v double").repartition(13)
    got = sorted(map(tuple, global_rank(df, ["v", "rid"]).select("rid", "rank").collect()))
    want = sorted(map(tuple, _window_rank(df, ["v", "rid"]).select("rid", "rank").collect()))
    assert got == want


def test_global_rank_equals_window_row_number_string_key(spark):
    # 4-byte-prefix surrogate: shared prefixes and ties, empty and
    # 1-char strings (padding paths), short-vs-extension ordering
    # ("az" < "b"), and multibyte/non-BMP characters whose byte order
    # must match Spark's UTF-8 collation
    rows = [(i, f"{'ab'[(i // 7) % 2]}{chr(97 + i % 5)}{'x' * (i % 4)}") for i in range(500)]
    rows += [(1000, ""), (1001, "a"), (1002, "b"), (1003, "az"), (1004, "az~")]
    rows += [(1005, "é"), (1006, "e"), (1007, "中文"), (1008, "😀emoji"), (1009, "ÿ"), (1010, "￿")]
    df = spark.createDataFrame(rows, "rid bigint, s string").repartition(7)
    got = sorted(map(tuple, global_rank(df, ["s", "rid"]).select("rid", "rank").collect()))
    want = sorted(map(tuple, _window_rank(df, ["s", "rid"]).select("rid", "rank").collect()))
    assert got == want


def test_global_rank_nulls_first(spark):
    """NULLs in the first order column rank FIRST (Spark ASC NULLS
    FIRST), matching the plain window exactly."""
    rows = [(1, None), (2, 5.0), (3, None), (4, 1.0)]
    df = spark.createDataFrame(rows, "rid bigint, v double")
    got = {r["rid"]: r["rank"] for r in global_rank(df, ["v", "rid"]).collect()}
    assert got == {1: 1, 3: 2, 4: 3, 2: 4}


def test_global_rank_partition_invariant(spark):
    rows = [(i, float((i * 13) % 50)) for i in range(1000)]
    df = spark.createDataFrame(rows, "rid bigint, v double")
    a = sorted(map(tuple, global_rank(df.repartition(1), ["v", "rid"]).collect()))
    b = sorted(map(tuple, global_rank(df.repartition(17), ["v", "rid"]).collect()))
    assert a == b


def test_global_rank_grouped_equals_per_group_window(spark):
    rows = [(i, ["x", "y", None][i % 3], float((i * 7) % 40)) for i in range(900)]
    df = spark.createDataFrame(rows, "rid bigint, g string, v double").repartition(11)
    got = sorted(
        map(tuple, global_rank(df, ["v", "rid"], partition_cols=["g"]).select("rid", "rank").collect())
    )
    want = sorted(
        map(tuple, _window_rank(df, ["v", "rid"], partition_cols=["g"]).select("rid", "rank").collect())
    )
    # NULL group keys are a group too — the null-safe offsets join must
    # keep their rows (a plain equi-join would silently drop a third of
    # the input here)
    assert len(got) == 900
    assert got == want


def test_global_rank_validation(spark):
    df = spark.createDataFrame([(1, 2.0)], "rid bigint, v double")
    with pytest.raises(ValueError, match="order_cols"):
        global_rank(df, [])
    with pytest.raises(ValueError, match="rank_col"):
        global_rank(df, ["v"], rank_col="rid")
    with pytest.raises(ValueError, match="collide"):
        global_rank(df.withColumnRenamed("rid", "__bin"), ["v"])
    with pytest.raises(ValueError, match="unknown order column"):
        global_rank(df, ["nope"])
    with pytest.raises(ValueError, match="bins"):
        global_rank(df, ["v", "rid"], bins=0)
    with pytest.raises(ValueError, match="bins"):
        global_rank(df, ["v", "rid"], bins=-5)
    # bins=1 degenerates to one local sort — slower, never wrong
    one = global_rank(
        spark.createDataFrame([(3, 9.0), (1, 1.0), (2, 5.0)], "rid bigint, v double"),
        ["v", "rid"],
        bins=1,
    )
    assert [(r["rid"], r["rank"]) for r in one.orderBy("rank").collect()] == [(1, 1), (2, 2), (3, 3)]


def test_global_rank_no_unpartitioned_window_over_data(spark):
    """The only PARTITION-free (constant-partitioned) window allowed
    is over the aggregated per-bin offsets table; the corpus window
    must carry the __bin partition spec."""
    import re

    df = spark.range(10_000).select(
        F.col("id").alias("rid"), (F.col("id") % 97).cast("double").alias("v")
    )
    plan = global_rank(df, ["v", "rid"])._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Window \[[^\]]*row_number[^\]]*\], \[([^\]]*)\]", plan):
        spec = m.group(0)
        assert "__bin" in spec, f"row_number window without the bin partition:\n{spec}"


def _brute_pairs(rows, w):
    """All (l, r) id pairs with 0 < rank(r) - rank(l) <= w in the
    (key, id) ascending order."""
    ranked = sorted(rows, key=lambda t: (t[1], t[0]))
    out = set()
    for i, (lid, _) in enumerate(ranked):
        for j in range(i + 1, min(i + w + 1, len(ranked))):
            out.add((lid, ranked[j][0]))
    return out


def test_sorted_neighborhood_pairs_equals_brute_force(spark):
    rows = [(i, f"k{(i * 11) % 37:02d}") for i in range(300)]
    df = spark.createDataFrame(rows, "rid bigint, k string").repartition(9)
    got = {
        (r["rid_l"], r["rid_r"])
        for r in sorted_neighborhood_pairs(df, ["k"], "rid", window=4).collect()
    }
    assert got == _brute_pairs(rows, 4)


def test_sorted_neighborhood_window_wider_than_data(spark):
    rows = [(i, float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "rid bigint, v double")
    got = {
        (r["rid_l"], r["rid_r"])
        for r in sorted_neighborhood_pairs(df, ["v"], "rid", window=100).collect()
    }
    # every ordered pair exactly once — no bucket-replication dupes
    assert got == {(a, b) for a in range(6) for b in range(6) if a < b}
    n_rows = sorted_neighborhood_pairs(df, ["v"], "rid", window=100).count()
    assert n_rows == 15


def test_sorted_neighborhood_validation(spark):
    df = spark.createDataFrame([(1, 2.0)], "rid bigint, v double")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, ["v"], "rid", window=0)
    # suffixed output-name collisions must raise, not silently emit
    # duplicate columns: a carry col named 'rank' with rank_cols=True
    # collides with the appended rank_l/rank_r; a carry col '__rnk'
    # aliases to '__rnk_l', shadowing the internal rank column
    rk = spark.createDataFrame([(1, 2.0)], "rid bigint, rank double")
    with pytest.raises(ValueError, match="collide"):
        sorted_neighborhood_pairs(rk, ["rank"], "rid", window=1, rank_cols=True)
    # without rank_cols the 'rank' carry name is fine
    assert sorted_neighborhood_pairs(rk, ["rank"], "rid", window=1).count() == 0
    internal = spark.createDataFrame([(1, 2.0)], "rid bigint, __rnk double")
    with pytest.raises(ValueError, match="collide"):
        sorted_neighborhood_pairs(internal, ["__rnk"], "rid", window=1)


def test_weighted_median_equals_brute_force(spark):
    """Lower weighted median vs an explicit expansion: repeating each
    value weight times and taking the element at ceil(total/2)."""
    from utils_infra_spark.operators.aggregations import weighted_median

    rows = [
        ("a", 10, 3), ("a", 20, 1), ("a", 5, 2),      # expanded: 5,5,10,10,10,20 -> lower median 10
        ("b", 7, 1), ("b", 9, 1),                      # even split: 7,9 -> lower median 7
        ("c", 4, 5),                                   # single value
        ("d", 1, 0), ("d", 2, -3), ("d", 3, 1),        # zero/negative weights drop
        ("e", None, 4), ("e", 8, None), ("e", 6, 2),   # NULL value/weight drop
    ]
    df = spark.createDataFrame(rows, "g string, v int, w int").repartition(5)
    got = {r["g"]: r["wm"] for r in weighted_median(df, ["g"], "v", "w", alias="wm").collect()}

    def brute(pairs):
        expanded = sorted(v for v, w in pairs for _ in range(w) if w and w > 0)
        return expanded[(len(expanded) + 1) // 2 - 1] if expanded else None

    assert got["a"] == brute([(10, 3), (20, 1), (5, 2)]) == 10
    assert got["b"] == brute([(7, 1), (9, 1)]) == 7
    assert got["c"] == 4
    assert got["d"] == 3
    assert got["e"] == 6


def test_weighted_median_partition_invariant(spark):
    from utils_infra_spark.operators.aggregations import weighted_median

    rows = [(f"g{i % 4}", (i * 13) % 29, 1 + i % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v int, w int")
    a = sorted(map(tuple, weighted_median(df.repartition(1), ["g"], "v", "w").collect()))
    b = sorted(map(tuple, weighted_median(df.repartition(19), ["g"], "v", "w").collect()))
    assert a == b


def test_weighted_quantile_bracketed_contains_exact(spark):
    """The bracket [lo_micro, hi_micro) from the bracketed variant must
    contain the exact lower weighted quantile (micro-quantized), for
    several q's and bin widths, on a CONTINUOUS double value domain."""
    from utils_infra_spark.operators.aggregations import (
        weighted_quantile,
        weighted_quantile_bracketed,
    )

    rows = [
        (f"g{i % 3}", ((i * 37) % 101) / 7.0 - 3.0, 1 + (i * 11) % 6)  # negatives included
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w int").repartition(9)
    dm = df.selectExpr("g", "CAST(FLOOR(v * 1000000 + 0.5) AS BIGINT) AS vm", "w")
    for qn, qd in [(1, 2), (9, 10), (1, 4)]:
        for bin_micro in [1_000_000, 250_000, 7_777]:
            exact = {
                r["g"]: r["wq"]
                for r in weighted_quantile(dm, ["g"], "vm", "w", q_num=qn, q_den=qd, alias="wq").collect()
            }
            br = {
                r["g"]: (r["lo_micro"], r["hi_micro"])
                for r in weighted_quantile_bracketed(
                    df, ["g"], "v", "w", bin_micro=bin_micro, q_num=qn, q_den=qd
                ).collect()
            }
            assert set(exact) == set(br)
            for g, vq in exact.items():
                lo, hi = br[g]
                assert lo <= vq < hi, (g, qn, qd, bin_micro, vq, lo, hi)
                assert hi - lo == bin_micro


def test_weighted_quantile_bracketed_no_distinct_value_window(spark):
    """Continuous-domain plan pin: every Window in the bracketed plan
    runs over the AGGREGATED bin table (its sort key is the bin id),
    never over a per-group distinct-VALUE table — the funnel the
    bracketed variant exists to avoid."""
    from utils_infra_spark.operators.aggregations import weighted_quantile_bracketed

    df = spark.range(100_000).selectExpr(
        "CAST(id % 5 AS STRING) AS g",
        "CAST(id AS DOUBLE) / 997.0 AS v",  # distinct ~= rows: continuous
        "1 + CAST(id % 7 AS INT) AS w",
    )
    plan = (
        weighted_quantile_bracketed(df, ["g"], "v", "w", bin_micro=1_000_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    wins = re.findall(r"Window \[[^\n]*", plan)
    assert wins, plan[:2000]
    for wspec in wins:
        # every window aggregates the bin table's weight column
        # (sum(__w#...)) — a window over raw rows would reference the
        # input weight column instead
        assert "sum(__w#" in wspec, f"window not over the bin table:\n{wspec}"
    # and the corpus-side aggregate is map-side combined: a partial
    # aggregate appears in the plan (shuffle carries (g, bin) partials)
    assert "partial" in plan.lower()


def test_weighted_quantile_bracketed_keeps_null_group(spark):
    """A NULL group key must survive to the output with the same
    bracket it would get as a non-null group — the exact operator
    keeps NULL groups (pure aggregation), so the bracketed twin must
    too (regression: the old finish joined back on the group columns
    with a plain equi-join, which silently dropped the NULL group)."""
    from utils_infra_spark.operators.aggregations import (
        weighted_median,
        weighted_quantile_bracketed,
    )

    rows = [(None if i % 3 == 0 else f"g{i % 3}", ((i * 37) % 101) / 7.0, 1 + i % 4) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double, w int").repartition(7)
    out = {
        r["g"]: (r["lo_micro"], r["hi_micro"])
        for r in weighted_quantile_bracketed(df, ["g"], "v", "w", bin_micro=500_000).collect()
    }
    assert set(out) == {None, "g1", "g2"}
    exact = {
        r["g"]: r["wmedian"]
        for r in weighted_median(
            df.selectExpr("g", "CAST(FLOOR(v * 1000000 + 0.5) AS BIGINT) AS vm", "w"),
            ["g"], "vm", "w",
        ).collect()
    }
    for g, (lo, hi) in out.items():
        assert lo <= exact[g] < hi, (g, exact[g], lo, hi)


def test_weighted_quantile_bracketed_validation(spark):
    from utils_infra_spark.operators.aggregations import weighted_quantile_bracketed

    df = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, w int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="q_num"):
        weighted_quantile_bracketed(df, ["g"], "v", "w", bin_micro=1, q_num=0)
    with _pytest.raises(ValueError, match="bin_micro"):
        weighted_quantile_bracketed(df, ["g"], "v", "w", bin_micro=0)
    with _pytest.raises(ValueError, match="collides"):
        weighted_quantile_bracketed(
            df.withColumnRenamed("v", "__bin").withColumn("v", F.lit(1.0)),
            ["g"], "v", "w", bin_micro=1,
        )
    # __w0 is also internal (the pre-bin weight alias): a clear
    # ValueError, not a downstream ambiguous-reference AnalysisException
    with _pytest.raises(ValueError, match="collides"):
        weighted_quantile_bracketed(
            df.withColumnRenamed("g", "__w0"), ["__w0"], "v", "w", bin_micro=1
        )


def test_weighted_quantile_general_q_equals_brute_force(spark):
    """q = q_num/q_den vs the expanded-multiset lower quantile:
    element at ceil(q * total) in sorted order, 1-based."""
    from utils_infra_spark.operators.aggregations import weighted_quantile

    rows = [(f"g{i % 3}", (i * 17) % 23, 1 + (i * 7) % 4) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v int, w int").repartition(7)

    def brute(g, qn, qd):
        expanded = sorted(v for gg, v, w in rows if gg == g for _ in range(w))
        total = len(expanded)
        # smallest v with cum*qd >= qn*total  ==  element at
        # ceil(qn*total/qd), 1-based
        pos = -(-qn * total // qd)
        return expanded[pos - 1]

    for qn, qd in [(1, 2), (9, 10), (1, 4), (1, 1)]:
        got = {
            r["g"]: r["wq"]
            for r in weighted_quantile(df, ["g"], "v", "w", q_num=qn, q_den=qd, alias="wq").collect()
        }
        want = {g: brute(g, qn, qd) for g in ("g0", "g1", "g2")}
        assert got == want, (qn, qd, got, want)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="q_num"):
        weighted_quantile(df, ["g"], "v", "w", q_num=0, q_den=2)
    with _pytest.raises(ValueError, match="q_num"):
        weighted_quantile(df, ["g"], "v", "w", q_num=3, q_den=2)


def test_global_rank_inf_and_nan_edges_stay_correct(spark):
    """±Inf saturates into the end bins (monotone); NaN poisons the
    span so everything degrades to ONE bin — slower, never wrong.
    Spark sorts NaN greater than +Inf; ranks must match the plain
    window either way."""
    rows = [
        (1, float("-inf")), (2, -5.0), (3, 0.0), (4, 7.0),
        (5, float("inf")), (6, float("nan")), (7, 3.0),
    ]
    df = spark.createDataFrame(rows, "rid bigint, v double").repartition(3)
    got = sorted(map(tuple, global_rank(df, ["v", "rid"]).select("rid", "rank").collect()))
    want = sorted(map(tuple, _window_rank(df, ["v", "rid"]).select("rid", "rank").collect()))
    assert got == want
    # and without the NaN, infinities alone must still agree
    df2 = df.where(~F.isnan("v"))
    got2 = sorted(map(tuple, global_rank(df2, ["v", "rid"]).select("rid", "rank").collect()))
    want2 = sorted(map(tuple, _window_rank(df2, ["v", "rid"]).select("rid", "rank").collect()))
    assert got2 == want2
