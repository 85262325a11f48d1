"""Filter / predicate operators (SURVEY.md §2.3, F1–F18).

Every operator returns a ``Column`` predicate or a filtered
``DataFrame`` built purely from Column expressions, so Catalyst can
push the predicate into the parquet scan (check
``explain('formatted')`` → ``PushedFilters``). None of these touch
Python row-at-a-time code — at 100 TB these run inside whole-stage
codegen.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bbox(lat: Column | str, lon: Column | str, south: float, north: float, west: float, east: float) -> Column:
    """Bounding-box predicate (F1; ref ais-proxy/server.js:678-680).

    Two independent BETWEENs — pushdown-friendly, no UDF.
    """
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    return lat.between(south, north) & lon.between(west, east)


def coordinate_valid(lat: Column | str, lon: Column | str) -> Column:
    """Coordinate-range validity (F3; ref ais-proxy/server.js:383-388)."""
    lat = F.col(lat) if isinstance(lat, str) else lat
    lon = F.col(lon) if isinstance(lon, str) else lon
    return lat.between(-90.0, 90.0) & lon.between(-180.0, 180.0)


def prefix_in_set(col: Column | str, prefix_len: int, valid: Iterable[str]) -> Column:
    """Domain-validation by key prefix (F2; ref ais-proxy/server.js:77-94).

    The reference validates MMSI MID prefixes against the ITU set; the
    general form is substring-prefix membership in a broadcast-small
    set — `isin` compiles to an in-list (or a broadcast join if we
    materialize the set as a DataFrame for very large sets).
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.substring(col.cast("string"), 1, prefix_len).isin(*list(valid))


def valid_mmsi(col: Column | str, valid_mids: Iterable[str]) -> Column:
    """Full MMSI validation (F2; ref ais-proxy/server.js:77-94).

    Reproduces the reference's branches over ``String(mmsi)`` — note a
    numeric MMSI loses leading zeros in the reference too, so the
    prefixed classes only arise from string inputs — with the MID
    (3-digit country code) checked against the broadcast ITU set, in
    the reference's branch order:
      - AtoN:            9 digits starting '99', MID at 3-5
      - SAR aircraft:    9 digits starting '111', MID at 4-6
      - coast station:   9 digits starting '00', MID at 3-5
      - group call:      9 digits starting '0' (single), MID at 2-4
      - standard vessel / short base station: 7-9 digits, MID at 1-3
        (the reference accepts 7- and 8-digit short base stations)
    Anything else is invalid.
    """
    col = F.col(col) if isinstance(col, str) else col
    s = col.cast("string")
    mids = list(valid_mids)
    nine = F.length(s) == 9
    seven_to_nine = F.length(s).between(7, 9)
    mid_at = lambda pos: F.substring(s, pos, 3).isin(*mids)  # noqa: E731
    return (
        F.when(s.startswith("99") & nine, mid_at(3))
        .when(s.startswith("111") & nine, mid_at(4))
        .when(s.startswith("00") & nine, mid_at(3))
        .when(s.startswith("0") & nine, mid_at(2))
        .when(seven_to_nine, mid_at(1))
        .otherwise(F.lit(False))
    )


def not_future(start: Column | str, now: Column) -> Column:
    """Future-start exclusion (F5; ref power-outages/server.js:83-87).

    NULL start passes (unknown start is assumed active). ``now`` is a
    parameter (lit timestamp) so results are reproducible.
    """
    start = F.col(start) if isinstance(start, str) else start
    return start.isNull() | (start <= now)


def fresh(stale_ts: Column | str, now: Column) -> Column:
    """Staleness filter (F7; ref tak-cot-proxy/index.mjs:407-411):
    keep rows whose expiry is strictly after `now`."""
    stale_ts = F.col(stale_ts) if isinstance(stale_ts, str) else stale_ts
    return stale_ts > now


def ci_contains(col: Column | str, needle: str) -> Column:
    """Case-insensitive substring match (part of F6;
    ref power-outages/server.js:525-530)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.lower(col).contains(needle.lower())


def ci_contains_any_element(arr: Column | str, needle: str) -> Column:
    """F6's array variant: any element of a string array contains the
    needle, case-insensitively (ref power-outages/server.js:526-529).
    Uses the `exists` higher-order function — stays JVM-side."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    q = needle.lower()
    return F.exists(arr, lambda x: F.lower(x).contains(q))


def category_in(col: Column | str, categories: Sequence[str]) -> Column:
    """Category include filter (F11; ref ais-proxy/server.js:732-757)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.isin(*list(categories))


def id_prefix(col: Column | str, prefix: str) -> Column:
    """ID-prefix filter (F10; ref tak-cot-proxy/index.mjs:412-417)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.startswith(prefix)


def sanitize_properties(props: Column | str, *, keep_prefixes: tuple[str, ...] = ("_metadata",)) -> Column:
    """F17 (ref display-proxy/index.html:929-945): keep only
    scalar-valued entries of a map<string,string>-typed properties
    column, always preserving ``keep_prefixes`` keys. Non-scalar
    values arrive as JSON-ish strings ('[...]'/'{...}') in the
    map-of-strings encoding — exactly how the reference's client
    receives them."""
    props = F.col(props) if isinstance(props, str) else props
    scalar = lambda v: ~(v.startswith("[") | v.startswith("{"))  # noqa: E731

    def keep(k: Column, v: Column) -> Column:
        kept = scalar(v)
        for p in keep_prefixes:
            kept = kept | k.startswith(p)
        return kept

    return F.map_filter(props, keep)


def drop_third_dimension(coords: Column | str) -> Column:
    """F17's coordinate clean-up (ref index.html:944): [lon, lat, alt]
    → [lon, lat] for an array<array<double>> coordinate list."""
    coords = F.col(coords) if isinstance(coords, str) else coords
    return F.transform(coords, lambda pt: F.slice(pt, 1, 2))


def param_filters(
    df: DataFrame,
    *,
    eq_upper: dict[str, str] | None = None,
    min_ge: dict[str, float] | None = None,
    contains_ci: dict[str, str] | None = None,
) -> DataFrame:
    """Composable query-param filters (F6; ref power-outages/server.js:517-536).

    eq_upper: column == VALUE after upper(); min_ge: column >= n;
    contains_ci: lower(column) contains lower(value). All AND-ed, like
    the reference's chained param checks.
    """
    out = df
    for c, v in (eq_upper or {}).items():
        out = out.where(F.upper(F.col(c)) == v.upper())
    for c, n in (min_ge or {}).items():
        out = out.where(F.col(c) >= n)
    for c, v in (contains_ci or {}).items():
        out = out.where(ci_contains(c, v))
    return out
