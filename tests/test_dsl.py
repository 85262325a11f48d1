"""Unit tests for the filter-DSL parser/compiler (F12) — grammar and
null-semantics parity with the reference's parseFilter/evaluateFilter
(tak-cot-proxy/index.mjs:125-240).
"""

from __future__ import annotations

import pytest

from utils_infra_spark.plans.filter_dsl import compile_filters, parse_filter


def test_parse_compare():
    n = parse_filter("speed > 5")
    assert (n.type, n.path, n.op, n.value) == ("compare", "speed", ">", 5)


def test_parse_single_equals_is_eq():
    n = parse_filter("type = vessel")
    assert (n.type, n.op, n.value) == ("compare", "=", "vessel")


def test_parse_quoted_string():
    n = parse_filter("name == 'San Francisco'")
    assert n.value == "San Francisco"


def test_parse_and_chain():
    n = parse_filter("a == 1 and b > 2 and c != x")
    assert n.type == "and" and len(n.children) == 3
    assert [c.type for c in n.children] == ["compare"] * 3


def test_parse_in_list():
    n = parse_filter("status in [active, restored]")
    assert n.type == "in" and n.value == ["active", "restored"]


def test_parse_in_list_numbers():
    n = parse_filter("code in [1, 2, 3]")
    assert n.value == [1, 2, 3]


def test_parse_contains():
    n = parse_filter("$contains(tags, urgent)")
    assert (n.type, n.path, n.value) == ("contains", "tags", "urgent")


def test_parse_modulo():
    n = parse_filter("id % 10 == 3")
    assert (n.type, n.path, n.divisor, n.op, n.value) == ("modulo", "id", 10, "==", 3)


def test_parse_booleans_and_null():
    assert parse_filter("valid == true").value is True
    assert parse_filter("valid == false").value is False
    assert parse_filter("x != null").value is None


def test_parse_ge_not_split_as_gt():
    n = parse_filter("x >= 10")
    assert (n.op, n.value) == (">=", 10)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # (id, kind, speed, tags)
        (1, "vessel", 5.0, ["a", "urgent"]),
        (2, "aircraft", None, ["b"]),
        (3, None, 12.0, None),
        (4, "vessel", 0.0, []),
    ]
    return spark.createDataFrame(rows, "id int, kind string, speed double, tags array<string>")


def ids(df, pred):
    return sorted(r.id for r in df.where(pred).collect())


def test_compile_eq(df):
    assert ids(df, compile_filters(["kind == vessel"], df=df)) == [1, 4]


def test_compile_neq_null_passes(df):
    # reference semantics: missing field PASSES != concrete
    assert ids(df, compile_filters(["kind != vessel"], df=df)) == [2, 3]


def test_compile_gt_null_fails(df):
    assert ids(df, compile_filters(["speed > 1"], df=df)) == [1, 3]


def test_compile_or_of_filters(df):
    assert ids(df, compile_filters(["kind == aircraft", "speed >= 12"], df=df)) == [2, 3]


def test_compile_and(df):
    assert ids(df, compile_filters(["kind == vessel and speed > 1"], df=df)) == [1]


def test_compile_in(df):
    assert ids(df, compile_filters(["id in [2, 4]"], df=df)) == [2, 4]


def test_compile_modulo(df):
    assert ids(df, compile_filters(["id % 2 == 0"], df=df)) == [2, 4]


def test_compile_contains_array(df):
    assert ids(df, compile_filters(["$contains(tags, urgent)"], df=df)) == [1]


def test_compile_contains_string(df):
    assert ids(df, compile_filters(["$contains(kind, craft)"], df=df)) == [2]


def test_compile_empty_list_passes_all(df):
    assert ids(df, compile_filters([], df=df)) == [1, 2, 3, 4]


def test_compile_eq_null(df):
    assert ids(df, compile_filters(["kind == null"], df=df)) == [3]
