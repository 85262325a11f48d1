"""Multi-format JSON ingest normalization tests (S3; the
convertJsonaisToAIS analog, ref ais-proxy/server.js:997-1215)."""

from __future__ import annotations

import pytest

from utils_infra_spark.sources.normalize import (
    normalize_any,
    normalize_catcher,
    normalize_direct,
    normalize_groups,
    normalize_minimal,
)

CATCHER = '{"msgs": [{"mmsi": 512000001, "lat": -41.2, "lon": 174.8, "speed": 12.5, "course": 90.0, "shipname": "  KIWI TRADER ", "rxtime": "20240115083000"}, {"mmsi": 512000002, "lat": -36.8, "lon": 174.7, "speed": 0.1, "course": 10.0, "shipname": "AUCKLAND STAR", "rxtime": "20240115083010"}]}'
MINIMAL = '{"mmsi": 512000003, "lat": -43.5, "lon": 172.6, "ts": "2024-01-15T08:30:20Z"}'
GROUPS = '{"groups": [{"msgs": [{"userid": 512000004, "latitude": -45.9, "longitude": 170.5, "sog": 8.0, "cog": 200.5, "name": "SOUTHERN CROSS", "time_utc": "2024-01-15T08:30:30Z"}]}]}'
DIRECT = '{"mmsi": 512000005, "lat": -41.0, "lon": 174.0, "speed": 5.0, "course": 45.0, "name": "DIRECT ONE", "event_ts": "2024-01-15T08:30:40Z"}'
INVALID_COORDS = '{"mmsi": 512000006, "lat": 95.0, "lon": 174.0, "ts": "2024-01-15T08:30:50Z"}'
GARBAGE = "this is not json at all {{{"


@pytest.fixture(scope="module")
def raw(spark):
    payloads = [CATCHER, MINIMAL, GROUPS, DIRECT, INVALID_COORDS, GARBAGE]
    return spark.createDataFrame([(p,) for p in payloads], "raw string")


def test_catcher_branch(raw):
    rows = {r.mmsi: r for r in normalize_catcher(raw).collect()}
    assert set(rows) == {512000001, 512000002}
    assert rows[512000001].name == "KIWI TRADER"  # trimmed
    assert str(rows[512000001].event_ts) == "2024-01-15 08:30:00"  # compact format parsed


def test_minimal_branch(raw):
    mmsis = {r.mmsi for r in normalize_minimal(raw).collect()}
    assert 512000003 in mmsis
    [r] = [r for r in normalize_minimal(raw).collect() if r.mmsi == 512000003]
    assert r.speed is None and r.name is None


def test_groups_branch_double_explode(raw):
    [r] = normalize_groups(raw).collect()
    assert r.mmsi == 512000004 and r.speed == 8.0 and r.course == 200.5


def test_direct_branch(raw):
    [r] = normalize_direct(raw).collect()
    assert r.mmsi == 512000005 and r.name == "DIRECT ONE"


def test_normalize_any_union(raw):
    rows = normalize_any(raw).collect()
    got = {r.mmsi: r.source_format for r in rows}
    # 5 valid vessels, one per expected branch; invalid coords and
    # garbage are dropped, not fatal (failure isolation)
    assert got == {
        512000001: "catcher",
        512000002: "catcher",
        512000003: "minimal",
        512000004: "groups",
        512000005: "direct",
    }


def test_canonical_schema(raw):
    from utils_infra_spark.sources.normalize import CANONICAL_FIELDS

    assert tuple(normalize_any(raw).columns) == CANONICAL_FIELDS
