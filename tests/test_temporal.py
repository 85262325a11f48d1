"""Unit tests for the temporal join operators: as-of semantics on
hand-built fixtures (inclusive match, ties, no-match nulls) and
binned range-join boundary behavior (half-open interval, bin edges).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from utils_infra_spark.operators.temporal import asof_backward_join, range_join_binned


def _asof(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k int, t bigint, lv string")
    right = spark.createDataFrame(right_rows, "k int, t bigint, rid int, rv string")
    out = asof_backward_join(left, right, "k", "t", "t", ["rid", "rv"], tiebreak="rid")
    return {(r.k, r.t): (r.matched_rid, r.matched_rv) for r in out.collect()}


def test_asof_inclusive_backward_match(spark):
    got = _asof(
        spark,
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c")],
        [(1, 10, 100, "x"), (1, 15, 101, "y")],
    )
    assert got[(1, 10)] == (100, "x")  # equal ts matches (inclusive)
    assert got[(1, 20)] == (101, "y")  # latest at-or-before wins
    assert got[(1, 5)] == (None, None)  # nothing precedes -> nulls


def test_asof_keys_do_not_leak_across_partitions(spark):
    got = _asof(
        spark,
        [(1, 10, "a"), (2, 10, "b")],
        [(1, 9, 100, "x")],
    )
    assert got[(1, 10)] == (100, "x")
    assert got[(2, 10)] == (None, None)


def test_asof_tie_breaks_on_greatest_tiebreak(spark):
    got = _asof(
        spark,
        [(1, 10, "a")],
        [(1, 9, 100, "x"), (1, 9, 105, "y"), (1, 9, 101, "z")],
    )
    assert got[(1, 10)] == (105, "y")


def test_range_join_half_open_and_bin_edges(spark):
    points = spark.createDataFrame(
        [(0,), (99,), (100,), (150,), (199,), (200,), (250,)], "p bigint"
    )
    ivals = spark.createDataFrame([(100, 200, "w1")], "s bigint, e bigint, tag string")
    out = range_join_binned(points, ivals, "p", "s", "e", bin_width=64)
    got = sorted(r.p for r in out.collect())
    # [100, 200): start inclusive, end exclusive, edges across bins
    assert got == [100, 150, 199]


def test_range_join_interval_shorter_than_bin(spark):
    points = spark.createDataFrame([(5,), (6,), (7,)], "p bigint")
    ivals = spark.createDataFrame([(6, 7, "tiny")], "s bigint, e bigint, tag string")
    out = range_join_binned(points, ivals, "p", "s", "e", bin_width=1000)
    assert [r.p for r in out.collect()] == [6]


def test_range_join_extra_equi_keys(spark):
    points = spark.createDataFrame([(1, 50), (2, 50)], "g int, p bigint")
    ivals = spark.createDataFrame([(1, 0, 100)], "g int, s bigint, e bigint")
    out = range_join_binned(points, ivals, "p", "s", "e", bin_width=10, extra_keys=["g"])
    assert [(r.g, r.p) for r in out.collect()] == [(1, 50)]
