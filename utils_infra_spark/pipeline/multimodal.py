"""Multimodal (image/audio/video) binary-column pipelines
(SURVEY.md §2.9 R1-R4; driver north-star multimodal requirement).

Design: media rides as an opaque ``binary`` column with typed
metadata (width/height/format or sample_rate/duration). All pixel
work happens in Arrow-batched ``mapInPandas`` stages over numpy —
the Spark-side plumbing (schemas, batch iteration, partitioning) is
real and tested. Codec ladder (NOTE:CODEC below): PIL when
importable (full PNG/JPEG), else the in-repo pure-numpy PNG codec
(pipeline/png.py — a real interchange format, so the pipelines
exercise genuine PNG bytes even in this container), else the
deterministic raw-RGBA stub (``FAKE_CODEC_MAGIC`` header +
width/height + raw bytes), which stays the default for
oracle-hashed fixtures because its bytes are codec-independent.
Every operator is written against the decoded ``(h, w, 4) uint8``
array, identical under all three codecs.

Scale notes: tiles partition naturally by quadkey/zoom prefix
(functions.geo.quadkey); pixel ops are embarrassingly parallel; the
palette LUT and geoid-style grids broadcast once per executor via
closure capture.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .png import PNG_SIGNATURE as PNG_MAGIC  # single source for the magic bytes

FAKE_CODEC_MAGIC = b"FRGB"  # NOTE:CODEC deterministic fake in lieu of PNG


def _pack_terrain_rgba(elev: "np.ndarray") -> "np.ndarray":
    """Terrain-RGB packing shared by every encoder in this module.
    floor(x+0.5) == JS Math.round (ref terrain encode,
    server.js:131-138); np.round would banker's-round exact halves
    differently, and plain astype() TRUNCATES — ~12% of values one
    packed unit (0.1 m) low."""
    packed = np.clip(np.floor((elev + 10000.0) / 0.1 + 0.5), 0, 16777215).astype(np.uint32)
    rgba = np.zeros((*elev.shape, 4), dtype=np.uint8)
    rgba[..., 0] = (packed >> 16) & 0xFF
    rgba[..., 1] = (packed >> 8) & 0xFF
    rgba[..., 2] = packed & 0xFF
    rgba[..., 3] = 255
    return rgba

# NOTE:CODEC — auto-detect a real codec at import. When PIL is on the
# executors' PYTHONPATH, PNG bytes decode/encode natively and the same
# pipeline code is production-ready; the FRGB stub stays the fallback
# (and the only path in this container, which has no image libs).
try:  # pragma: no cover - exercised only where PIL is installed
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

TILE_SCHEMA = "z int, x int, y int, data binary"
TILE_META_SCHEMA = "z int, x int, y int, width int, height int, mean_r double, mean_g double, mean_b double, mean_alpha double"


def encode_tile(arr: np.ndarray, fmt: str = "frgb") -> bytes:
    """NOTE:CODEC encode an (h, w, 4) uint8 RGBA array.

    ``fmt='frgb'`` (default) is the deterministic stub container —
    byte-stable everywhere, so it stays the default for oracle-hashed
    fixtures. ``fmt='png'`` uses PIL when present (production path).
    """
    h, w, c = arr.shape
    assert c == 4, "RGBA expected"
    if fmt == "png":
        if HAVE_PIL:
            import io

            buf = io.BytesIO()
            _PILImage.fromarray(arr.astype(np.uint8), mode="RGBA").save(buf, format="PNG")
            return buf.getvalue()
        # no PIL: the in-repo pure-numpy codec (pipeline/png.py) — a
        # real PNG stream (filter 0 + zlib), interchangeable with any
        # external reader
        from .png import png_encode

        return png_encode(arr.astype(np.uint8))
    return FAKE_CODEC_MAGIC + struct.pack("<II", w, h) + arr.astype(np.uint8).tobytes()


def decode_tile(data: bytes) -> np.ndarray:
    """NOTE:CODEC decode to (h, w, 4) uint8 RGBA. Understands the FRGB
    stub always and PNG/JPEG whenever PIL is importable; raises on
    formats no available codec handles, the way a real decoder would."""
    if data[:4] == FAKE_CODEC_MAGIC:
        w, h = struct.unpack("<II", data[4:12])
        return np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 4)
    if HAVE_PIL:
        import io

        with _PILImage.open(io.BytesIO(bytes(data))) as im:
            return np.asarray(im.convert("RGBA"), dtype=np.uint8)
    if bytes(data[:8]) == PNG_MAGIC:
        # pure-numpy PNG reader (pipeline/png.py): depth-8 PNGs decode
        # without PIL; normalize every colour type to RGBA
        from .png import png_decode

        a = png_decode(data)
        if a.ndim == 2:  # greyscale
            a = np.stack([a, a, a, np.full_like(a, 255)], axis=-1)
        elif a.shape[2] == 2:  # grey + alpha
            g = a[..., 0]
            a = np.stack([g, g, g, a[..., 1]], axis=-1)
        elif a.shape[2] == 3:  # RGB
            a = np.concatenate([a, np.full_like(a[..., :1], 255)], axis=-1)
        return np.ascontiguousarray(a, dtype=np.uint8)
    raise NotImplementedError(
        "no codec for this format in this environment (JPEG etc. need "
        "PIL); binary column is not FAKE_CODEC or PNG formatted"
    )


def synth_tile(z: int, x: int, y: int, size: int = 64) -> bytes:
    """Deterministic synthetic tile (for tests/fixtures): pixel values
    derived from tile coords — same (z,x,y) ⇒ same bytes anywhere."""
    yy, xx = np.mgrid[0:size, 0:size]
    r = ((xx * 7 + x * 13) % 256).astype(np.uint8)
    g = ((yy * 11 + y * 17) % 256).astype(np.uint8)
    b = ((xx + yy + z * 29) % 256).astype(np.uint8)
    a = np.full((size, size), 255, dtype=np.uint8)
    return encode_tile(np.stack([r, g, b, a], axis=-1))


def tile_stats(tiles: DataFrame) -> DataFrame:
    """R-family feature extraction: decode each tile, emit per-channel
    means + dimensions. mapInPandas → Arrow batches of binary in,
    narrow metadata out (the decoded pixels never hit the shuffle)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [decode_tile(d) for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "z": pdf["z"],
                    "x": pdf["x"],
                    "y": pdf["y"],
                    "width": [a.shape[1] for a in arrs],
                    "height": [a.shape[0] for a in arrs],
                    "mean_r": [float(a[..., 0].mean()) for a in arrs],
                    "mean_g": [float(a[..., 1].mean()) for a in arrs],
                    "mean_b": [float(a[..., 2].mean()) for a in arrs],
                    "mean_alpha": [float(a[..., 3].mean()) for a in arrs],
                }
            )

    return tiles.mapInPandas(fn, schema=TILE_META_SCHEMA)


def build_dbz_lut(bands: list[tuple[int, tuple[int, int, int, int]]]) -> np.ndarray:
    """Banded dBZ→RGBA lookup table (R1; ref weather-proxy/
    server.js:242-259's 13-color ladder): 256×4 uint8, built once and
    captured by the UDF closure (≡ executor-side broadcast)."""
    lut = np.zeros((256, 4), dtype=np.uint8)
    for threshold, rgba in sorted(bands):
        lut[threshold:] = rgba
    return lut


DEFAULT_DBZ_BANDS: list[tuple[int, tuple[int, int, int, int]]] = [
    (0, (0, 0, 0, 0)),
    (32 + 5, (0, 80, 255, 255)),
    (32 + 15, (0, 200, 255, 255)),
    (32 + 25, (0, 255, 0, 255)),
    (32 + 35, (255, 255, 0, 255)),
    (32 + 45, (255, 128, 0, 255)),
    (32 + 55, (255, 0, 0, 255)),
    (32 + 65, (255, 0, 255, 255)),
]


def palette_remap(tiles: DataFrame, bands: list[tuple[int, tuple[int, int, int, int]]] | None = None) -> DataFrame:
    """R1 per-pixel palette remap (RainViewer dBZ → radar colors,
    ref weather-proxy/server.js:262-305): value = R channel (the
    provider encodes ``dBZ+32`` there, server.js:235-239), remapped
    through the LUT; transparent pixels pass through."""
    lut = build_dbz_lut(bands or DEFAULT_DBZ_BANDS)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data in pdf["data"]:
                arr = decode_tile(data)
                mapped = lut[arr[..., 0]]  # vectorized LUT gather
                transparent = arr[..., 3] == 0
                mapped[transparent] = 0
                out.append(encode_tile(mapped))
            yield pd.DataFrame({"z": pdf["z"], "x": pdf["x"], "y": pdf["y"], "data": out})

    return tiles.mapInPandas(fn, schema=TILE_SCHEMA)


def upscale_from_parent(tiles: DataFrame, scale: int = 2) -> DataFrame:
    """R2 derive child tiles from a parent by crop+nearest-neighbor
    resize (ref weather-proxy/server.js:335-354: serve z8-9 from z7):
    each parent (z,x,y) emits scale² children at z+1 with the
    ``(x % scale, y % scale)`` quadrant cropped and ×scale upscaled."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"z": [], "x": [], "y": [], "data": []}
            for z, x, y, data in zip(pdf["z"], pdf["x"], pdf["y"], pdf["data"]):
                arr = decode_tile(data)
                h, w = arr.shape[:2]
                ch, cw = h // scale, w // scale
                for dy in range(scale):
                    for dx in range(scale):
                        crop = arr[dy * ch : (dy + 1) * ch, dx * cw : (dx + 1) * cw]
                        up = crop.repeat(scale, axis=0).repeat(scale, axis=1)  # nearest neighbor
                        rows["z"].append(int(z) + 1)
                        rows["x"].append(int(x) * scale + dx)
                        rows["y"].append(int(y) * scale + dy)
                        rows["data"].append(encode_tile(up))
            yield pd.DataFrame(rows)

    return tiles.mapInPandas(fn, schema=TILE_SCHEMA)


def decode_elevation(tiles: DataFrame, geoid_offset: float = 0.0) -> DataFrame:
    """R3 Terrain-RGB elevation decode + geoid shift (ref
    terrain-proxy/server.js:125-138,226-278): elev = -10000 +
    (R·65536 + G·256 + B)·0.1, re-encoded after adding the offset.
    Emits per-tile min/max elevation alongside the adjusted tile."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"z": [], "x": [], "y": [], "data": [], "min_elev": [], "max_elev": []}
            for z, x, y, data in zip(pdf["z"], pdf["x"], pdf["y"], pdf["data"]):
                arr = decode_tile(data).astype(np.float64)
                elev = -10000.0 + (arr[..., 0] * 65536 + arr[..., 1] * 256 + arr[..., 2]) * 0.1
                elev = elev + geoid_offset
                rgba = _pack_terrain_rgba(elev)
                out["z"].append(int(z)); out["x"].append(int(x)); out["y"].append(int(y))
                out["data"].append(encode_tile(rgba))
                out["min_elev"].append(float(elev.min())); out["max_elev"].append(float(elev.max()))
            yield pd.DataFrame(out)

    return tiles.mapInPandas(fn, schema=TILE_SCHEMA + ", min_elev double, max_elev double")


def constant_tile(rgba: tuple[int, int, int, int], size: int = 64) -> bytes:
    """R4 constant-tile synthesis (sea-level / transparent fallback,
    ref terrain-proxy/server.js:181-196) — generate once on the
    driver, attach with F.lit()."""
    arr = np.zeros((size, size, 4), dtype=np.uint8)
    arr[...] = rgba
    return encode_tile(arr)


# ---------------------------------------------------------------- audio/video
# Same design as tiles: opaque binary + typed metadata, Arrow-batched
# mapInPandas, deterministic stub codecs (NOTE:CODEC) with real Spark
# plumbing. Audio: PCM16 mono frames. Video: concatenated fixed-size
# frames (a real build swaps in pyav/ffmpeg decode).

AUDIO_SCHEMA = "clip_id bigint, sample_rate int, data binary"
AUDIO_FEATURE_SCHEMA = "clip_id bigint, n_samples bigint, duration_s double, rms double, peak double, zero_crossings bigint"


def synth_audio(clip_id: int, sample_rate: int = 8000, seconds: float = 1.0) -> bytes:
    """Deterministic PCM16 sine clip (frequency derived from id)."""
    t = np.arange(int(sample_rate * seconds)) / sample_rate
    freq = 110.0 * (1 + clip_id % 8)
    wave = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    return wave.tobytes()


def audio_features(clips: DataFrame) -> DataFrame:
    """Feature extraction over PCM16 audio: RMS, peak, zero-crossing
    count — the audio analog of tile_stats; decoded samples stay in
    the task, only narrow features cross the shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("clip_id", "n_samples", "duration_s", "rms", "peak", "zero_crossings")}
            for cid, sr, data in zip(pdf["clip_id"], pdf["sample_rate"], pdf["data"]):
                x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
                out["clip_id"].append(int(cid))
                out["n_samples"].append(len(x))
                out["duration_s"].append(round(len(x) / int(sr), 6))
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                out["peak"].append(float(np.abs(x).max()) if len(x) else 0.0)
                out["zero_crossings"].append(int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))))
            yield pd.DataFrame(out)

    return clips.mapInPandas(fn, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_SCHEMA = "video_id bigint, width int, height int, n_frames int, data binary"


def synth_video(video_id: int, width: int = 32, height: int = 32, n_frames: int = 24) -> bytes:
    """Deterministic fake video: n_frames concatenated RGBA frames."""
    frames = []
    for i in range(n_frames):
        yy, xx = np.mgrid[0:height, 0:width]
        frame = np.stack(
            [
                ((xx + i * 3 + video_id) % 256).astype(np.uint8),
                ((yy + i * 5) % 256).astype(np.uint8),
                ((xx + yy + i * 7) % 256).astype(np.uint8),
                np.full((height, width), 255, dtype=np.uint8),
            ],
            axis=-1,
        )
        frames.append(frame.tobytes())
    return b"".join(frames)


def sample_frames(videos: DataFrame, every_nth: int = 8) -> DataFrame:
    """Frame sampling (the north star's video op): emit every Nth
    frame of each clip as a standalone tile-like row — one input row
    fans out to n_frames/every_nth rows; downstream image ops
    (tile_stats, palette_remap) consume them unchanged."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"video_id": [], "frame_index": [], "data": []}
            for vid, w, h, nf, data in zip(pdf["video_id"], pdf["width"], pdf["height"], pdf["n_frames"], pdf["data"]):
                frame_bytes = int(w) * int(h) * 4
                for i in range(0, int(nf), every_nth):
                    raw = data[i * frame_bytes : (i + 1) * frame_bytes]
                    arr = np.frombuffer(raw, dtype=np.uint8).reshape(int(h), int(w), 4)
                    out["video_id"].append(int(vid))
                    out["frame_index"].append(i)
                    out["data"].append(encode_tile(arr))
            yield pd.DataFrame(out)

    return videos.mapInPandas(fn, schema="video_id bigint, frame_index int, data binary")


# ---------------------------------------------------------------- R3 reprojection
TERRAIN_TILE_SIZE = 64  # NOTE: ref terrain-proxy uses 256; tests use 64


def synth_terrain_tile(z: int, x: int, y: int, size: int = TERRAIN_TILE_SIZE) -> bytes:
    """Deterministic Terrain-RGB tile: a smooth elevation field derived
    from global pixel coordinates, encoded with the Mapbox formula —
    same (z,x,y) ⇒ same bytes anywhere (test/fixture analog of a LINZ
    DEM tile)."""
    yy, xx = np.mgrid[0:size, 0:size]
    gx = x * size + xx
    gy = y * size + yy
    elev = 200.0 + 150.0 * np.sin(gx / 37.0) + 90.0 * np.cos(gy / 23.0) + 0.05 * (gx % 101)
    return encode_tile(_pack_terrain_rgba(elev))


def _latlon_tile_bounds(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """EPSG:4326 tiling (2·2^z × 2^z tiles): (lat_min, lat_max,
    lon_min, lon_max). Ref terrain-proxy/server.js:63-73."""
    ntx = 2 * (2**z)
    nty = 2**z
    return (
        90.0 - ((y + 1) / nty) * 180.0,
        90.0 - (y / nty) * 180.0,
        (x / ntx) * 360.0 - 180.0,
        ((x + 1) / ntx) * 360.0 - 180.0,
    )


def reproject_terrain_tiles(
    out_spec: DataFrame,
    src_tiles: DataFrame,
    *,
    geoid=None,
    tile_size: int = TERRAIN_TILE_SIZE,
    max_merc_zoom: int = 18,
) -> DataFrame:
    """R3 full reprojection resample (ref terrain-proxy/
    server.js:200-278 ``generateTerrainTile``): every EPSG:4326
    output pixel maps to its EPSG:3857 source tile + pixel
    (nearest-neighbor, clamped — server.js:252-257), decodes
    Terrain-RGB elevation, adds the bilinear geoid separation
    (NZVD2016 → HAE, only where a source pixel exists, matching the
    reference's ``if (src)`` guard), and re-encodes.

    ``out_spec`` is (z, x, y) output tiles; ``src_tiles`` is
    (z, x, y, data) mercator Terrain-RGB tiles at zoom
    ``min(z+1, max_merc_zoom)``; ``geoid`` is a
    ``sources.gtx.GtxGrid`` (or None ⇒ offset 0, the reference's
    out-of-range behavior).

    Scale shape: the source-tile demand list is computed
    distributed (mapInPandas over the spec — ref
    getMercatorTilesForBounds server.js:80-92), the src join
    shuffles each source tile to exactly the output groups that
    sample it (a tile at mercZoom=z+1 feeds ≤ a few 4326 tiles), and
    the per-pixel work is one numpy pass per output tile inside
    applyInPandas. Pixels never shuffle more than once; missing
    source tiles degrade to sea level per-pixel (failure isolation,
    server.js:230-238). The geoid grid rides the closure — one copy
    per executor, never per row.
    """
    ts = tile_size

    def demand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"oz": [], "ox": [], "oy": [], "mz": [], "sx": [], "sy": []}
            for z, x, y in zip(pdf["z"], pdf["x"], pdf["y"]):
                z, x, y = int(z), int(x), int(y)
                lat_min, lat_max, lon_min, lon_max = _latlon_tile_bounds(z, x, y)
                mz = min(z + 1, max_merc_zoom)
                world = ts * (2**mz)
                x_min = int(np.floor((lon_min + 180.0) / 360.0 * world / ts))
                x_max = int(np.floor((lon_max + 180.0) / 360.0 * world / ts))

                def merc_y(lat: float) -> float:
                    merc_n = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
                    return (1 - merc_n / np.pi) / 2 * world

                y_min = int(np.floor(merc_y(lat_max) / ts))
                y_max = int(np.floor(merc_y(lat_min) / ts))
                max_tile = 2**mz - 1
                for sy in range(max(0, y_min), min(max_tile, y_max) + 1):
                    for sx in range(max(0, x_min), min(max_tile, x_max) + 1):
                        rows["oz"].append(z); rows["ox"].append(x); rows["oy"].append(y)
                        rows["mz"].append(mz); rows["sx"].append(sx); rows["sy"].append(sy)
            yield pd.DataFrame(rows)

    spec = out_spec.select("z", "x", "y")
    needed = spec.mapInPandas(demand, schema="oz int, ox int, oy int, mz int, sx int, sy int")
    src = src_tiles.select(
        F.col("z").alias("mz"), F.col("x").alias("sx"), F.col("y").alias("sy"), "data"
    )
    joined = needed.join(src, ["mz", "sx", "sy"], "left")

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        oz, ox, oy = int(pdf["oz"].iloc[0]), int(pdf["ox"].iloc[0]), int(pdf["oy"].iloc[0])
        mz = int(pdf["mz"].iloc[0])
        lat_min, lat_max, lon_min, lon_max = _latlon_tile_bounds(oz, ox, oy)
        src_map = {
            (int(r["sx"]), int(r["sy"])): decode_tile(r["data"])
            for _, r in pdf.iterrows()
            if r["data"] is not None
        }
        px = np.arange(ts)
        lon = lon_min + (px + 0.5) / ts * (lon_max - lon_min)
        lat = lat_max - (px + 0.5) / ts * (lat_max - lat_min)  # py axis
        world = ts * (2**mz)
        merc_px = (lon + 180.0) / 360.0 * world
        merc_n = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
        merc_py = (1 - merc_n / np.pi) / 2 * world
        stx = np.floor(merc_px / ts).astype(np.int64)  # per output column
        sty = np.floor(merc_py / ts).astype(np.int64)  # per output row
        elev = np.zeros((ts, ts), dtype=np.float64)
        have = np.zeros((ts, ts), dtype=bool)
        for (tx, ty), arr in src_map.items():
            cols = np.nonzero(stx == tx)[0]
            rows = np.nonzero(sty == ty)[0]
            if not len(cols) or not len(rows):
                continue
            h, w = arr.shape[:2]
            lx = np.clip(np.floor(merc_px[cols] - tx * ts), 0, w - 1).astype(np.int64)
            ly = np.clip(np.floor(merc_py[rows] - ty * ts), 0, h - 1).astype(np.int64)
            block = arr[np.ix_(ly, lx)].astype(np.float64)
            elev[np.ix_(rows, cols)] = -10000.0 + (
                block[..., 0] * 65536 + block[..., 1] * 256 + block[..., 2]
            ) * 0.1
            have[np.ix_(rows, cols)] = True
        if geoid is not None and have.any():
            lon2d = np.broadcast_to(lon, (ts, ts))
            lat2d = np.broadcast_to(lat[:, None], (ts, ts))
            sep = geoid.separation_np(lat2d.ravel(), lon2d.ravel()).reshape(ts, ts)
            elev = np.where(have, elev + sep, elev)
        rgba = _pack_terrain_rgba(elev)
        return pd.DataFrame(
            [
                {
                    "z": oz, "x": ox, "y": oy,
                    "data": encode_tile(rgba),
                    "min_elev": float(elev.min()),
                    "max_elev": float(elev.max()),
                    "src_tiles": len(src_map),
                }
            ]
        )

    return joined.groupBy("oz", "ox", "oy").applyInPandas(
        render,
        schema="z int, x int, y int, data binary, min_elev double, max_elev double, src_tiles int",
    )


PHASH_SCHEMA = "z int, x int, y int, phash long"


def _ahash64(arr: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8x8 block means → bit = mean
    block > global mean. numpy-only (no PIL in this environment); the
    block reduction is the nearest-neighbor downscale a real aHash
    uses. Signed 64-bit so it fits Spark LongType."""
    gray = arr[..., :3].astype(np.float64).mean(axis=-1)
    h, w = gray.shape
    by, bx = max(h // 8, 1), max(w // 8, 1)
    blocks = gray[: by * 8, : bx * 8].reshape(8, by, 8, bx).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for b in bits:
        val = np.uint64(val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def perceptual_hash(tiles: DataFrame) -> DataFrame:
    """Image near-dup sketch: 64-bit aHash per tile via mapInPandas.

    Pixels stay inside the task; the output is 8 bytes per image, so
    downstream candidate generation (hamming-ball matching) works on
    a sketch table ~1e-6 the corpus size — the image analog of the
    minhash signature table."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "z": pdf["z"],
                    "x": pdf["x"],
                    "y": pdf["y"],
                    "phash": [_ahash64(decode_tile(d)) for d in pdf["data"]],
                }
            )

    return tiles.mapInPandas(fn, schema=PHASH_SCHEMA)


def phash_near_dups(hashes: DataFrame, max_hamming: int = 6, bands: int = 8) -> DataFrame:
    """Near-duplicate image pairs by hamming distance over aHash.

    Candidate generation without an all-pairs join (multi-index
    hashing): split the 64-bit hash into ``bands`` equal chunks. By
    pigeonhole, two hashes within hamming distance < ``bands`` agree
    EXACTLY on at least one chunk, so per-chunk equi-joins find every
    such pair — lossless for ``max_hamming <= bands - 1`` (asserted).
    Verification is a popcount on the XOR (JVM bit_count — no
    Python). Same banding idea as LSH, but with a guarantee.
    """
    if max_hamming > bands - 1:
        raise ValueError(f"losslessness requires max_hamming <= bands - 1 ({max_hamming} > {bands - 1})")
    ids = hashes.select(
        F.concat_ws("/", "z", "x", "y").alias("tile_id"), F.col("phash")
    )
    width = 64 // bands
    mask = (1 << width) - 1
    chunks = ids.select(
        "tile_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("phash", i * width).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("c"),
    ).select("tile_id", "phash", F.col("c.band").alias("band"), F.col("c.key").alias("key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.tile_id") < F.col("b.tile_id")),
        )
        .select(
            F.col("a.tile_id").alias("id_a"),
            F.col("b.tile_id").alias("id_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cands.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
