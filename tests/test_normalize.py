"""Multi-format JSON ingest normalization tests (S3; the
convertJsonaisToAIS analog, ref ais-proxy/server.js:997-1215)."""

from __future__ import annotations

import pytest

from utils_infra_spark.sources.normalize import (
    normalize_any,
    normalize_aprs,
    normalize_array,
    normalize_catcher,
    normalize_direct,
    normalize_groups,
    normalize_minimal,
    unmatched_records,
)

CATCHER = '{"msgs": [{"mmsi": 512000001, "lat": -41.2, "lon": 174.8, "speed": 12.5, "course": 90.0, "shipname": "  KIWI TRADER ", "rxtime": "20240115083000"}, {"mmsi": 512000002, "lat": -36.8, "lon": 174.7, "speed": 0.1, "course": 10.0, "shipname": "AUCKLAND STAR", "rxtime": "20240115083010"}]}'
MINIMAL = '{"mmsi": 512000003, "lat": -43.5, "lon": 172.6, "ts": "2024-01-15T08:30:20Z"}'
GROUPS = '{"groups": [{"msgs": [{"userid": 512000004, "latitude": -45.9, "longitude": 170.5, "sog": 8.0, "cog": 200.5, "name": "SOUTHERN CROSS", "time_utc": "2024-01-15T08:30:30Z"}]}]}'
DIRECT = '{"mmsi": 512000005, "lat": -41.0, "lon": 174.0, "speed": 5.0, "course": 45.0, "name": "DIRECT ONE", "event_ts": "2024-01-15T08:30:40Z"}'
APRS = '{"call": "512000007", "lat": -39.1, "lng": 176.9, "speed": 3.0, "course": 120.0, "time": "2024-01-15T08:31:00Z"}'
APRS_ALPHA_CALL = '{"call": "ZL1ABC", "lat": -39.2, "lng": 176.8, "time": "2024-01-15T08:31:10Z"}'
BARE_ARRAY = '[{"mmsi": 512000008, "lat": -40.5, "lon": 173.2, "speed": 7.5, "course": 310.0, "name": "ARRAY ONE", "event_ts": "2024-01-15T08:31:20Z"}, {"mmsi": 512000009, "lat": -40.6, "lon": 173.3, "event_ts": "2024-01-15T08:31:30Z"}]'
INVALID_COORDS = '{"mmsi": 512000006, "lat": 95.0, "lon": 174.0, "ts": "2024-01-15T08:30:50Z"}'
GARBAGE = "this is not json at all {{{"
UNKNOWN_SHAPE = '{"vessel": "no recognizable fields", "x": 1}'


@pytest.fixture(scope="module")
def raw(spark):
    payloads = [
        CATCHER, MINIMAL, GROUPS, DIRECT, APRS, APRS_ALPHA_CALL,
        BARE_ARRAY, INVALID_COORDS, GARBAGE, UNKNOWN_SHAPE,
    ]
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


def test_aprs_branch(raw):
    [r] = normalize_aprs(raw).collect()
    # numeric callsign becomes the MMSI, lng becomes lon; the
    # alphabetic callsign casts to NULL and is dropped (parseInt guard)
    assert r.mmsi == 512000007 and r.lon == 176.9 and r.course == 120.0
    assert str(r.event_ts) == "2024-01-15 08:31:00"


def test_array_branch_emits_all_valid_elements(raw):
    rows = {r.mmsi: r for r in normalize_array(raw).collect()}
    assert set(rows) == {512000008, 512000009}
    assert rows[512000008].name == "ARRAY ONE"
    assert rows[512000009].speed is None  # sparse element still lands


def test_normalize_any_union(raw):
    rows = normalize_any(raw).collect()
    got = {r.mmsi: r.source_format for r in rows}
    # 8 valid vessels across all six branches; invalid coords,
    # garbage, alpha callsign, and unknown shapes are dropped, not
    # fatal (failure isolation)
    assert got == {
        512000001: "catcher",
        512000002: "catcher",
        512000003: "minimal",
        512000004: "groups",
        512000005: "direct",
        512000007: "aprs",
        512000008: "array",
        512000009: "array",
    }


def test_unmatched_dead_letter(raw):
    corrupt = {r.corrupt_record for r in unmatched_records(raw).collect()}
    # dead letter = every payload that produced NO canonical row:
    # unknown formats (garbage, unknown shape, non-numeric APRS
    # callsign) AND known-shape payloads whose records all failed the
    # validity filter (INVALID_COORDS) — so output ∪ dead-letter
    # covers the input and nothing can vanish silently (T6)
    assert corrupt == {GARBAGE, UNKNOWN_SHAPE, APRS_ALPHA_CALL, INVALID_COORDS}


def test_canonical_schema(raw):
    from utils_infra_spark.sources.normalize import CANONICAL_FIELDS

    assert tuple(normalize_any(raw).columns) == CANONICAL_FIELDS


def test_array_payload_with_leading_whitespace_routed(spark):
    """A newline/tab-prefixed array payload must still hit the array
    branch (trim() strips only 0x20 spaces)."""
    df = spark.createDataFrame(
        [('\n\t [{"mmsi": 512000042, "lat": -41.0, "lon": 174.0, "event_ts": "2024-01-15T08:30:00Z"}]',)],
        "raw string",
    )
    rows = normalize_any(df).collect()
    assert [r.mmsi for r in rows] == [512000042]
    assert unmatched_records(df).count() == 0
