"""R3 full reprojection resample + S13 .gtx geoid loader tests.

Ground truth is an independent scalar reimplementation of the
reference algorithm (terrain-proxy/server.js:200-278) — per output
pixel: 4326→3857 mapping, nearest-neighbor source lookup with edge
clamping, Terrain-RGB decode, bilinear geoid add, re-encode.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from utils_infra_spark.pipeline.multimodal import (
    _latlon_tile_bounds,
    decode_tile,
    reproject_terrain_tiles,
    synth_terrain_tile,
)
from utils_infra_spark.sources.gtx import GtxGrid, load_gtx, write_gtx

TS = 64


def _synth_grid() -> GtxGrid:
    """Geoid over the south-west Pacific with a smooth gradient."""
    lat = np.arange(20)  # rows
    lon = np.arange(30)  # cols
    vals = (10.0 + 0.5 * lat[:, None] + 0.25 * lon[None, :]).astype(np.float32)
    return GtxGrid(lat_min=-50.0, lon_min=160.0, dlat=0.5, dlon=0.5, values=vals)


# ------------------------------------------------------------------ gtx
def test_gtx_roundtrip(tmp_path):
    g = _synth_grid()
    p = str(tmp_path / "synth.gtx")
    write_gtx(p, g)
    g2 = load_gtx(p)
    assert (g2.lat_min, g2.lon_min, g2.dlat, g2.dlon) == (-50.0, 160.0, 0.5, 0.5)
    assert g2.values.shape == (20, 30)
    np.testing.assert_array_equal(g.values, g2.values)


def test_gtx_separation_matches_reference_semantics():
    g = _synth_grid()
    # interior point: plain bilinear
    lat, lon = -49.75, 160.75
    fr = (lat - g.lat_min) / g.dlat  # 0.5
    fc = (lon - g.lon_min) / g.dlon  # 1.5
    v = g.values
    expect = (
        v[0, 1] * 0.5 * 0.5 + v[0, 2] * 0.5 * 0.5 + v[1, 1] * 0.5 * 0.5 + v[1, 2] * 0.5 * 0.5
    )
    got = g.separation_np(np.array([lat]), np.array([lon]))[0]
    assert got == pytest.approx(expect, abs=1e-6)
    # west longitude shifts +360 (ref server.js:163)
    got_neg = g.separation_np(np.array([lat]), np.array([lon - 360.0]))[0]
    assert got_neg == pytest.approx(got, abs=1e-9)
    # out of range -> 0 (ref server.js:168)
    assert g.separation_np(np.array([0.0]), np.array([0.0]))[0] == 0.0
    assert g.separation_np(np.array([-50.0]), np.array([200.0]))[0] == 0.0


# ------------------------------------------------- scalar reference model
def _ref_render(oz, ox, oy, src_map, geoid, ts=TS, max_merc_zoom=18):
    """Direct transcription of generateTerrainTile's pixel loop."""
    lat_min, lat_max, lon_min, lon_max = _latlon_tile_bounds(oz, ox, oy)
    mz = min(oz + 1, max_merc_zoom)
    world = ts * (2**mz)
    out = np.zeros((ts, ts, 4), dtype=np.uint8)
    for py in range(ts):
        for px in range(ts):
            lon = lon_min + ((px + 0.5) / ts) * (lon_max - lon_min)
            lat = lat_max - ((py + 0.5) / ts) * (lat_max - lat_min)
            merc_px = (lon + 180.0) / 360.0 * world
            merc_n = math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
            merc_py = (1 - merc_n / math.pi) / 2 * world
            stx, sty = math.floor(merc_px / ts), math.floor(merc_py / ts)
            elevation = 0.0
            src = src_map.get((stx, sty))
            if src is not None:
                h, w = src.shape[:2]
                lx = max(0, min(w - 1, math.floor(merc_px - stx * ts)))
                ly = max(0, min(h - 1, math.floor(merc_py - sty * ts)))
                r, g, b = (int(src[ly, lx, i]) for i in range(3))
                elevation = -10000.0 + (r * 65536 + g * 256 + b) * 0.1
                if geoid is not None:
                    elevation += float(geoid.separation_np(np.array([lat]), np.array([lon]))[0])
            enc = max(0, min(16777215, math.floor((elevation + 10000.0) / 0.1 + 0.5)))
            out[py, px] = ((enc >> 16) & 0xFF, (enc >> 8) & 0xFF, enc & 0xFF, 255)
    return out


def _nz_out_tile():
    """A 4326 tile over the synthetic geoid's footprint (NZ-ish)."""
    oz = 6
    nty = 2**oz
    ntx = 2 * nty
    # lat ~ -45 => y = (90 - lat)/180 * nty ; lon ~ 168 => x = (lon+180)/360 * ntx
    return oz, int((168.0 + 180.0) / 360.0 * ntx), int((90.0 - (-45.0)) / 180.0 * nty)


def _src_tiles_for(oz, ox, oy, ts=TS):
    lat_min, lat_max, lon_min, lon_max = _latlon_tile_bounds(oz, ox, oy)
    mz = min(oz + 1, 18)
    world = ts * (2**mz)

    def merc_y(lat):
        return (1 - math.log(math.tan(math.pi / 4 + math.radians(lat) / 2)) / math.pi) / 2 * world

    xs = range(
        math.floor((lon_min + 180.0) / 360.0 * world / ts),
        math.floor((lon_max + 180.0) / 360.0 * world / ts) + 1,
    )
    ys = range(math.floor(merc_y(lat_max) / ts), math.floor(merc_y(lat_min) / ts) + 1)
    return mz, [(x, y) for y in ys for x in xs]


def test_reproject_matches_scalar_reference(spark):
    oz, ox, oy = _nz_out_tile()
    mz, keys = _src_tiles_for(oz, ox, oy)
    assert len(keys) >= 2  # the output tile genuinely spans several sources
    geoid = _synth_grid()

    src_rows = [(mz, x, y, synth_terrain_tile(mz, x, y)) for (x, y) in keys]
    src_df = spark.createDataFrame(src_rows, "z int, x int, y int, data binary")
    spec = spark.createDataFrame([(oz, ox, oy)], "z int, x int, y int")

    got = reproject_terrain_tiles(spec, src_df, geoid=geoid).collect()
    assert len(got) == 1
    row = got[0]
    assert (row["z"], row["x"], row["y"]) == (oz, ox, oy)
    assert row["src_tiles"] == len(keys)

    src_map = {(x, y): decode_tile(synth_terrain_tile(mz, x, y)) for (x, y) in keys}
    expect = _ref_render(oz, ox, oy, src_map, geoid)
    np.testing.assert_array_equal(decode_tile(row["data"]), expect)
    # geoid actually shifted elevations (grid covers this tile)
    no_geoid = reproject_terrain_tiles(spec, src_df, geoid=None).collect()[0]
    assert row["min_elev"] > no_geoid["min_elev"]


def test_reproject_missing_sources_degrade_to_sea_level(spark):
    oz, ox, oy = _nz_out_tile()
    mz, keys = _src_tiles_for(oz, ox, oy)
    # only ONE source tile available; absent neighbors read as elevation 0
    have = keys[:1]
    src_df = spark.createDataFrame(
        [(mz, x, y, synth_terrain_tile(mz, x, y)) for (x, y) in have],
        "z int, x int, y int, data binary",
    )
    spec = spark.createDataFrame([(oz, ox, oy)], "z int, x int, y int")
    row = reproject_terrain_tiles(spec, src_df, geoid=None).collect()[0]
    assert row["src_tiles"] == 1
    src_map = {(x, y): decode_tile(synth_terrain_tile(mz, x, y)) for (x, y) in have}
    expect = _ref_render(oz, ox, oy, src_map, None)
    np.testing.assert_array_equal(decode_tile(row["data"]), expect)
    # sea-level pixels really present (encoded elevation == 0)
    assert row["min_elev"] == 0.0


def test_reproject_no_sources_is_flat_sea_tile(spark):
    spec = spark.createDataFrame([(4, 10, 9)], "z int, x int, y int")
    empty = spark.createDataFrame([], "z int, x int, y int, data binary")
    row = reproject_terrain_tiles(spec, empty, geoid=_synth_grid()).collect()[0]
    arr = decode_tile(row["data"])
    enc = math.floor(10000.0 / 0.1 + 0.5)
    assert (arr[..., 0] == (enc >> 16) & 0xFF).all()
    assert (arr[..., 2] == enc & 0xFF).all()
    assert row["src_tiles"] == 0
