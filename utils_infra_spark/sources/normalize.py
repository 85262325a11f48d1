"""Multi-format JSON ingest normalization (S3; SURVEY.md §1.2).

The reference's ``convertJsonaisToAIS`` (ais-proxy/server.js:997-1215)
accepts six wire shapes — AIS-catcher ``{msgs:[...]}`` arrays, minimal
``{mmsi,lat,lon}``, full jsonais ``{groups:[{msgs:[...]}]}``, APRS,
direct canonical, bare arrays — and emits one canonical record.

Spark shape: parse each format with an explicit schema + PERMISSIVE
``from_json``, emit a normalizing ``select`` per format, and
``unionByName`` the six branches (``normalize_any``). Payloads no
branch claims are observable via ``unmatched_records`` as a
dead-letter output instead of killing the batch (failure isolation,
T6). At scale each branch is a filter+project over the same scan —
one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# canonical AIS-like record (SURVEY §1.3 entity 1, trimmed to the
# fields every wire format can supply)
CANONICAL_FIELDS = ("mmsi", "lat", "lon", "speed", "course", "name", "event_ts", "source_format")

_CATCHER_SCHEMA = (
    "struct<msgs: array<struct<mmsi: bigint, lat: double, lon: double,"
    " speed: double, course: double, shipname: string, rxtime: string>>>"
)
_MINIMAL_SCHEMA = "struct<mmsi: bigint, lat: double, lon: double, ts: string>"
_GROUPS_SCHEMA = (
    "struct<groups: array<struct<msgs: array<struct<userid: bigint,"
    " latitude: double, longitude: double, sog: double, cog: double,"
    " name: string, time_utc: string>>>>>"
)
_DIRECT_SCHEMA = (
    "struct<mmsi: bigint, lat: double, lon: double, speed: double,"
    " course: double, name: string, event_ts: string>"
)
_APRS_SCHEMA = (
    "struct<call: string, lat: double, lng: double, speed: double,"
    " course: double, time: string>"
)
_ARRAY_SCHEMA = f"array<{_DIRECT_SCHEMA}>"


def _parse(raw: Column, schema: str) -> Column:
    return F.from_json(raw, schema, {"mode": "PERMISSIVE"})


def _is_array_payload(raw: Column) -> Column:
    """The Spark analog of the reference's ``Array.isArray`` dispatch
    (server.js:1196-1203). Needed lexically: ``from_json`` with an
    array schema silently WRAPS a single JSON object into a
    one-element array, which would double-claim object payloads.
    Regex anchor, not trim(): Spark's trim strips only 0x20 spaces,
    so a payload led by a newline/tab would be misrouted."""
    return raw.rlike(r"^\s*\[")


def normalize_catcher(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """AIS-catcher shape: {"msgs":[{mmsi,lat,lon,speed,course,shipname,rxtime}]}.
    rxtime is compact 'yyyyMMddHHmmss' (ref server.js:1218-1227)."""
    parsed = df.select(_parse(F.col(raw_col), _CATCHER_SCHEMA).alias("p"))
    msg = parsed.where(F.col("p.msgs").isNotNull()).select(F.explode("p.msgs").alias("m"))
    return msg.select(
        F.col("m.mmsi").alias("mmsi"),
        F.col("m.lat").alias("lat"),
        F.col("m.lon").alias("lon"),
        F.col("m.speed").alias("speed"),
        F.col("m.course").alias("course"),
        F.trim(F.col("m.shipname")).alias("name"),
        F.to_timestamp(F.col("m.rxtime"), "yyyyMMddHHmmss").alias("event_ts"),
        F.lit("catcher").alias("source_format"),
    )


def normalize_minimal(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Minimal shape: {"mmsi","lat","lon","ts"} (ISO-8601 ts)."""
    p = df.select(_parse(F.col(raw_col), _MINIMAL_SCHEMA).alias("p")).where(
        F.col("p.mmsi").isNotNull() & F.col("p.lat").isNotNull()
    )
    return p.select(
        F.col("p.mmsi").alias("mmsi"),
        F.col("p.lat").alias("lat"),
        F.col("p.lon").alias("lon"),
        F.lit(None).cast("double").alias("speed"),
        F.lit(None).cast("double").alias("course"),
        F.lit(None).cast("string").alias("name"),
        F.to_timestamp("p.ts").alias("event_ts"),
        F.lit("minimal").alias("source_format"),
    )


def normalize_groups(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Full jsonais shape: {"groups":[{"msgs":[{userid,latitude,...}]}]}
    — double explode (ref server.js:1098-1136)."""
    parsed = df.select(_parse(F.col(raw_col), _GROUPS_SCHEMA).alias("p"))
    grp = parsed.where(F.col("p.groups").isNotNull()).select(F.explode("p.groups").alias("g"))
    msg = grp.select(F.explode("g.msgs").alias("m"))
    return msg.select(
        F.col("m.userid").alias("mmsi"),
        F.col("m.latitude").alias("lat"),
        F.col("m.longitude").alias("lon"),
        F.col("m.sog").alias("speed"),
        F.col("m.cog").alias("course"),
        F.trim(F.col("m.name")).alias("name"),
        F.to_timestamp("m.time_utc").alias("event_ts"),
        F.lit("groups").alias("source_format"),
    )


def normalize_direct(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Already-canonical shape, passed through with type coercion."""
    p = df.select(_parse(F.col(raw_col), _DIRECT_SCHEMA).alias("p")).where(
        F.col("p.mmsi").isNotNull() & F.col("p.event_ts").isNotNull()
    )
    return p.select(
        F.col("p.mmsi").alias("mmsi"),
        F.col("p.lat").alias("lat"),
        F.col("p.lon").alias("lon"),
        F.col("p.speed").alias("speed"),
        F.col("p.course").alias("course"),
        F.trim(F.col("p.name")).alias("name"),
        F.to_timestamp("p.event_ts").alias("event_ts"),
        F.lit("direct").alias("source_format"),
    )


def normalize_aprs(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """AIS-catcher APRS shape: {"call","lat","lng","time",...} — MMSI
    is the numeric callsign, longitude rides as ``lng``
    (ref server.js:1140-1168). Non-numeric callsigns cast to NULL and
    are dropped, exactly as the reference's parseInt guard does."""
    p = df.select(_parse(F.col(raw_col), _APRS_SCHEMA).alias("p")).where(
        F.col("p.call").isNotNull() & F.col("p.lat").isNotNull() & F.col("p.lng").isNotNull()
    )
    return p.select(
        # try_cast: ANSI mode makes a plain cast THROW on 'ZL1ABC'
        F.col("p.call").try_cast("bigint").alias("mmsi"),
        F.col("p.lat").alias("lat"),
        F.col("p.lng").alias("lon"),
        F.col("p.speed").alias("speed"),
        F.col("p.course").alias("course"),
        F.lit(None).cast("string").alias("name"),
        F.to_timestamp("p.time").alias("event_ts"),
        F.lit("aprs").alias("source_format"),
    ).where(F.col("mmsi").isNotNull())


def normalize_array(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Bare-array shape: ``[{...}, ...]`` of canonical-ish messages
    (ref server.js:1196-1203 recurses per element; the batch analog
    emits EVERY valid element, consistent with how the catcher branch
    explodes all of ``msgs``)."""
    raw = F.col(raw_col)
    p = df.where(_is_array_payload(raw)).select(
        F.explode(_parse(raw, _ARRAY_SCHEMA)).alias("m")
    )
    return p.where(F.col("m.mmsi").isNotNull() & F.col("m.lat").isNotNull()).select(
        F.col("m.mmsi").alias("mmsi"),
        F.col("m.lat").alias("lat"),
        F.col("m.lon").alias("lon"),
        F.col("m.speed").alias("speed"),
        F.col("m.course").alias("course"),
        F.trim(F.col("m.name")).alias("name"),
        F.to_timestamp("m.event_ts").alias("event_ts"),
        F.lit("array").alias("source_format"),
    )


def normalize_any(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Route every payload through all six format branches and union
    the results — the Spark analog of the reference's if/else format
    sniffing. A payload matches exactly one branch (each branch
    filters on its discriminating fields; object branches are
    mutually exclusive by field shape, the array branch by the
    leading ``[``), so the union is disjoint. Catalyst shares the
    scan across branches; this is one pass over the input at any
    scale. Payloads claimed by NO branch are available from
    ``unmatched_records`` as a dead-letter side output (T6).
    """
    obj = df.where(~_is_array_payload(F.col(raw_col)))
    branches = [
        normalize_catcher(obj, raw_col),
        normalize_groups(obj, raw_col),
        normalize_direct(obj, raw_col),
        # minimal last: its fields are a subset of direct's, so
        # exclude payloads the direct branch already claimed
        normalize_minimal(
            obj.where(_parse(F.col(raw_col), _DIRECT_SCHEMA)["event_ts"].isNull()), raw_col
        ),
        normalize_aprs(obj, raw_col),
        normalize_array(df, raw_col),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.where(
        F.col("mmsi").isNotNull() & F.col("lat").between(-90, 90) & F.col("lon").between(-180, 180)
    )


def _emits(mmsi: Column, lat: Column, lon: Column) -> Column:
    """Would this record survive normalize_any's final validity filter?"""
    return mmsi.isNotNull() & lat.between(-90, 90) & lon.between(-180, 180)


def unmatched_records(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Dead-letter side output: every payload that produces NO
    canonical row — garbage, truncated JSON, unknown shapes, AND
    shapes a branch parses but whose records all fail the validity
    filter (out-of-range coordinates, null mmsi). The per-branch
    predicates mirror each branch's EMISSION condition exactly, so
    normalize_any(df) ∪ unmatched_records(df) covers the input: no
    record can vanish between the two outputs (the silent-drop mode
    this T6 side channel exists to prevent). The batch analog of the
    reference returning null → the proxy dropping the frame, but kept
    observable instead of silent."""
    raw = F.col(raw_col)
    catcher = F.exists(
        _parse(raw, _CATCHER_SCHEMA)["msgs"],
        lambda m: _emits(m["mmsi"], m["lat"], m["lon"]),
    )
    groups = F.exists(
        _parse(raw, _GROUPS_SCHEMA)["groups"],
        lambda g: F.exists(g["msgs"], lambda m: _emits(m["userid"], m["latitude"], m["longitude"])),
    )
    direct_p = _parse(raw, _DIRECT_SCHEMA)
    direct = direct_p["event_ts"].isNotNull() & _emits(
        direct_p["mmsi"], direct_p["lat"], direct_p["lon"]
    )
    minimal_p = _parse(raw, _MINIMAL_SCHEMA)
    minimal = _emits(minimal_p["mmsi"], minimal_p["lat"], minimal_p["lon"])
    aprs_p = _parse(raw, _APRS_SCHEMA)
    aprs = _emits(aprs_p["call"].try_cast("bigint"), aprs_p["lat"], aprs_p["lng"])
    arr = _is_array_payload(raw) & F.exists(
        _parse(raw, _ARRAY_SCHEMA), lambda m: _emits(m["mmsi"], m["lat"], m["lon"])
    )
    claimed = F.coalesce(catcher | groups | direct | minimal | aprs | arr, F.lit(False))
    return df.where(~claimed).select(raw.alias("corrupt_record"))


# -- S2: CloudTAK CoT contact frames -------------------------------------
#
# The reference's contacts consumer (display-proxy/lambdas/
# tak-contacts-ws/index.mjs:167-189) receives {type:"cot", data:
# <GeoJSON feature>} frames, keeps only features that carry a
# properties.group (contacts), tolerates `group` being either a bare
# string or an object {name: ...}, and stamps a per-group marker
# color (unknown groups fall back to white).

_COT_GROUP_STR = (
    "struct<type: string, data: struct<id: string,"
    " geometry: struct<type: string, coordinates: array<double>>,"
    " properties: struct<callsign: string, group: string, time: string>>>"
)
_COT_GROUP_OBJ = (
    "struct<type: string, data: struct<id: string,"
    " geometry: struct<type: string, coordinates: array<double>>,"
    " properties: struct<callsign: string, group: struct<name: string>,"
    " time: string>>>"
)


def normalize_cot(
    df: DataFrame, raw_col: str = "raw", *, group_colors: dict[str, str] | None = None
) -> DataFrame:
    """CoT contact frames → one row per contact feature.

    Emits ``(contact_id, callsign, group_name, marker_color, lon,
    lat, event_ts)``. ``contact_id`` falls back from ``data.id`` to
    the callsign (the reference's Map key fallback chain). ``group``
    parses under BOTH wire forms — string and ``{name}`` object — via
    two PERMISSIVE ``from_json`` passes coalesced together (the same
    one-scan branch trick as :func:`normalize_any`: a mismatched
    field is null under PERMISSIVE, so exactly one form claims each
    frame). ``group_colors`` is driver-side config baked into a
    ``create_map`` literal (S16 pattern) — no join, no UDF, pure
    codegen at any scale."""
    raw = F.col(raw_col)
    s = _parse(raw, _COT_GROUP_STR)
    o = _parse(raw, _COT_GROUP_OBJ)
    # PERMISSIVE from_json STRINGIFIES an object that lands in a
    # string-typed field (it does not null it), so the object form is
    # authoritative whenever it yields a name; the string form covers
    # the rest — INCLUDING a legitimate name that merely STARTS with
    # '{' ("{weird team"): a brace prefix alone must not route a frame
    # to the object branch (where it parses to null and the frame is
    # silently dropped). The string is demoted only when it is ITSELF
    # valid serialized JSON (get_json_object(sg, '$') non-null — a
    # from_json probe can't distinguish: it returns an all-null
    # struct, not null, for garbage), i.e. a real object wire form
    # that simply lacks a usable name.
    sg = s["data"]["properties"]["group"]
    group = F.coalesce(
        o["data"]["properties"]["group"]["name"],
        F.when(
            sg.isNotNull() & (~sg.startswith("{") | F.get_json_object(sg, "$").isNull()),
            sg,
        ),
    )

    def leaf(*path: str) -> Column:
        # the two schemas differ ONLY at properties.group, so every
        # other leaf has one type and coalesces cleanly (the data
        # structs themselves do NOT — their types differ)
        sx, ox = s["data"], o["data"]
        for p in path:
            sx, ox = sx[p], ox[p]
        return F.coalesce(sx, ox)

    colors = group_colors or {}
    if colors:
        cmap = F.create_map(*[F.lit(x) for kv in colors.items() for x in kv])
        color = F.coalesce(cmap[group], F.lit("#ffffff"))
    else:
        color = F.lit("#ffffff")
    typed = F.coalesce(s["type"], o["type"])
    coords = leaf("geometry", "coordinates")
    return df.where((typed == "cot") & group.isNotNull() & coords.isNotNull()).select(
        F.coalesce(leaf("id"), leaf("properties", "callsign")).alias("contact_id"),
        leaf("properties", "callsign").alias("callsign"),
        group.alias("group_name"),
        color.alias("marker_color"),
        coords[0].alias("lon"),
        coords[1].alias("lat"),
        F.to_timestamp(leaf("properties", "time")).alias("event_ts"),
    )
