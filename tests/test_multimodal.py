"""Multimodal binary-column pipeline tests (R1-R4) and the MBTiles
sink (K4). The codec is the deterministic fake; everything else —
schemas, Arrow batches, mapInPandas plumbing, sqlite sink — is real.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pytest

from utils_infra_spark.pipeline import multimodal
from utils_infra_spark.pipeline.multimodal import (
    constant_tile,
    decode_elevation,
    decode_tile,
    encode_tile,
    palette_remap,
    synth_tile,
    tile_stats,
    upscale_from_parent,
)
from utils_infra_spark.sinks.mbtiles import write_mbtiles


@pytest.fixture(scope="module")
def tiles(spark):
    rows = [(7, x, y, synth_tile(7, x, y)) for x in range(4) for y in range(4)]
    return spark.createDataFrame(rows, "z int, x int, y int, data binary")


@pytest.mark.parametrize(
    "fmt",
    ["frgb", "png"],  # png always available: PIL seam or pure-numpy codec
)
def test_codec_roundtrip(fmt):
    arr = np.arange(64 * 64 * 4, dtype=np.uint8).reshape(64, 64, 4)
    assert (decode_tile(encode_tile(arr, fmt=fmt)) == arr).all()


def test_codec_rejects_foreign_format():
    # Truncated/garbage bytes must fail LOUD (never a silent wrong
    # array): a valid-prefix-but-corrupt PNG raises from whichever
    # codec handles PNG; a format nothing handles (JPEG without PIL)
    # raises NotImplementedError.
    with pytest.raises(Exception):
        decode_tile(b"\x89PNG1234567890")
    if not multimodal.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_tile(b"\xff\xd8\xff\xe0jpegjpegjpeg")


def test_png_encode_without_pil_is_real_png():
    # The no-PIL path emits a genuine PNG stream (signature + CRC'd
    # chunks), not a renamed stub — decodable by ANY png reader.
    arr = np.arange(4 * 4 * 4, dtype=np.uint8).reshape(4, 4, 4)
    data = encode_tile(arr, fmt="png")
    assert data[:8] == multimodal.PNG_MAGIC
    assert (decode_tile(data) == arr).all()


def test_tile_stats(spark, tiles):
    out = {(r.z, r.x, r.y): r for r in tile_stats(tiles).collect()}
    assert len(out) == 16
    r = out[(7, 0, 0)]
    assert (r.width, r.height) == (64, 64)
    assert r.mean_alpha == 255.0
    # means must equal the numpy ground truth for the same synth tile
    arr = decode_tile(synth_tile(7, 0, 0))
    assert abs(r.mean_r - arr[..., 0].mean()) < 1e-9


def test_palette_remap(spark, tiles):
    out = palette_remap(tiles).collect()
    assert len(out) == 16
    arr = decode_tile(out[0].data)
    assert arr.shape == (64, 64, 4)
    # remapped palette only contains LUT colors
    from utils_infra_spark.pipeline.multimodal import DEFAULT_DBZ_BANDS, build_dbz_lut

    lut_colors = {tuple(c) for c in build_dbz_lut(DEFAULT_DBZ_BANDS)}
    seen = {tuple(px) for px in arr.reshape(-1, 4)}
    assert seen <= lut_colors


def test_upscale_children(spark, tiles):
    kids = upscale_from_parent(tiles.where("x = 0 and y = 0")).collect()
    assert sorted((r.z, r.x, r.y) for r in kids) == [(8, 0, 0), (8, 0, 1), (8, 1, 0), (8, 1, 1)]
    parent = decode_tile(synth_tile(7, 0, 0))
    child = decode_tile(next(r.data for r in kids if (r.x, r.y) == (0, 0)))
    assert child.shape == (64, 64, 4)
    # nearest-neighbor: child pixel (2i, 2j) == parent crop pixel (i, j)
    assert (child[::2, ::2] == parent[:32, :32]).all()


def test_elevation_decode_roundtrip(spark):
    # elevation 150.0 m → RGB encoding → +10 geoid → decode again
    packed = int((150.0 + 10000.0) / 0.1)
    arr = np.zeros((8, 8, 4), dtype=np.uint8)
    arr[..., 0] = (packed >> 16) & 0xFF
    arr[..., 1] = (packed >> 8) & 0xFF
    arr[..., 2] = packed & 0xFF
    arr[..., 3] = 255
    df = spark.createDataFrame([(10, 1, 2, encode_tile(arr))], "z int, x int, y int, data binary")
    [row] = decode_elevation(df, geoid_offset=10.0).collect()
    assert abs(row.min_elev - 160.0) < 0.11 and abs(row.max_elev - 160.0) < 0.11
    redecoded = decode_tile(row.data).astype(np.float64)
    elev2 = -10000.0 + (redecoded[..., 0] * 65536 + redecoded[..., 1] * 256 + redecoded[..., 2]) * 0.1
    assert abs(float(elev2[0, 0]) - 160.0) < 0.11


def test_constant_tile():
    arr = decode_tile(constant_tile((10, 60, 180, 255), size=16))
    assert arr.shape == (16, 16, 4)
    assert (arr[5, 5] == [10, 60, 180, 255]).all()


def test_mbtiles_sink(spark, tiles, tmp_path):
    path = os.path.join(tmp_path, "out.mbtiles")
    n = write_mbtiles(tiles, path, metadata={"name": "test", "format": "frgb"})
    assert n == 16
    con = sqlite3.connect(path)
    # TMS y-flip: z=7, y=0 → row 127 (ref create_nationalmap_mbtiles.py:104)
    rows = con.execute("SELECT zoom_level, tile_column, tile_row FROM tiles ORDER BY 1,2,3").fetchall()
    assert (7, 0, 127) in rows and len(rows) == 16
    (blob,) = con.execute("SELECT tile_data FROM tiles WHERE tile_column=1 AND tile_row=126").fetchone()
    assert bytes(blob) == synth_tile(7, 1, 1)  # y=1 → row 126
    assert con.execute("SELECT value FROM metadata WHERE name='name'").fetchone() == ("test",)
    # idempotent resume: second write with INSERT OR IGNORE adds nothing
    n2 = write_mbtiles(tiles, path, metadata={"name": "test", "format": "frgb"})
    assert n2 == 16
    # metadata stays single-valued per key across resume re-runs
    # (INSERT OR REPLACE + unique index on name)
    assert con.execute("SELECT count(*) FROM metadata WHERE name='name'").fetchone() == (1,)
    con.close()


def test_mbtiles_resume_heals_legacy_duplicate_metadata(spark, tiles, tmp_path):
    """A file written by the pre-unique-index code could hold duplicate
    metadata names (plain INSERT on re-run). Resuming onto it must
    de-duplicate (keeping the newest row) instead of dying on
    CREATE UNIQUE INDEX with IntegrityError."""
    path = os.path.join(tmp_path, "legacy.mbtiles")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
    con.execute("INSERT INTO metadata VALUES ('name', 'old-1')")
    con.execute("INSERT INTO metadata VALUES ('name', 'old-2')")
    con.execute("INSERT INTO metadata VALUES ('format', 'frgb')")
    con.commit()
    con.close()

    n = write_mbtiles(tiles, path, metadata={"name": "new"})
    assert n == 16
    con = sqlite3.connect(path)
    assert con.execute("SELECT value FROM metadata WHERE name='name'").fetchall() == [("new",)]
    assert con.execute("SELECT value FROM metadata WHERE name='format'").fetchall() == [("frgb",)]
    con.close()


def test_audio_features(spark):
    from utils_infra_spark.pipeline.multimodal import audio_features, synth_audio

    rows = [(i, 8000, synth_audio(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "clip_id long, sample_rate int, data binary")
    out = {r.clip_id: r for r in audio_features(df).collect()}
    assert len(out) == 4
    r = out[0]
    assert r.n_samples == 8000 and abs(r.duration_s - 1.0) < 1e-9
    # 0.5-amplitude sine: RMS ≈ 0.5/√2 ≈ 0.3536
    assert abs(r.rms - 0.3536) < 0.01
    # 110 Hz over 1 s → ~220 zero crossings
    assert abs(out[0].zero_crossings - 220) <= 2
    assert abs(out[1].zero_crossings - 440) <= 2  # 220 Hz clip


def test_sample_frames_feeds_tile_stats(spark):
    from utils_infra_spark.pipeline.multimodal import sample_frames, synth_video, tile_stats
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(7, 32, 32, 24, synth_video(7))], "video_id long, width int, height int, n_frames int, data binary"
    )
    frames = sample_frames(df, every_nth=8)
    got = frames.collect()
    assert [r.frame_index for r in sorted(got, key=lambda r: r.frame_index)] == [0, 8, 16]
    # sampled frames are valid tiles: pipe them into the image op
    stats = tile_stats(frames.select(F.lit(0).alias("z"), F.col("frame_index").alias("x"), F.lit(0).alias("y"), "data")).collect()
    assert len(stats) == 3 and all(s.width == 32 and s.mean_alpha == 255.0 for s in stats)


def test_phash_near_dups_lossless_vs_bruteforce(spark):
    import numpy as np

    from utils_infra_spark.pipeline.multimodal import (
        _ahash64,
        decode_tile,
        encode_tile,
        perceptual_hash,
        phash_near_dups,
        synth_tile,
    )

    rows, truth_hashes = [], {}
    for i in range(12):
        data = synth_tile(5, i, i % 3)
        rows.append((5, i, i % 3, bytearray(data)))
        truth_hashes[f"5/{i}/{i % 3}"] = _ahash64(decode_tile(data))
        if i % 3 == 0:  # near-identical twin at z=6
            arr = decode_tile(data).copy()
            arr[::16, ::16, 1] = np.minimum(arr[::16, ::16, 1] + 2, 255)
            twin = encode_tile(arr)
            rows.append((6, i, i % 3, bytearray(twin)))
            truth_hashes[f"6/{i}/{i % 3}"] = _ahash64(decode_tile(twin))
    tiles = spark.createDataFrame(rows, "z int, x int, y int, data binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dups(perceptual_hash(tiles), max_hamming=6, bands=8).collect()
    }
    ids = sorted(truth_hashes)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((truth_hashes[a] ^ truth_hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= 6:
                exp[(min(a, b), max(a, b))] = d
    assert got == exp
    assert exp, "fixture produced no near-dup pairs — twins not close enough"
