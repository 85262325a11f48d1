"""Multimodal (image/audio/video) binary-column pipelines
(SURVEY.md §2.9 R1-R4; driver north-star multimodal requirement).

Design: media rides as an opaque ``binary`` column with typed
metadata (width/height/format or sample_rate/duration). All pixel
work happens in Arrow-batched ``mapInPandas`` stages over numpy —
the Spark-side plumbing (schemas, batch iteration, partitioning) is
real and tested. The CODEC is the only stub: this container has no
image libs, so tiles use a deterministic raw RGBA format
(``FAKE_CODEC_MAGIC`` header + width/height + raw bytes). Swapping
``decode_tile``/``encode_tile`` for PIL/libvips is a 2-line change
marked NOTE:CODEC below; every operator is written against the
decoded ``(h, w, 4) uint8`` array, exactly as it would be with a
real codec.

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

FAKE_CODEC_MAGIC = b"FRGB"  # NOTE:CODEC deterministic fake in lieu of PNG

TILE_SCHEMA = "z int, x int, y int, data binary"
TILE_META_SCHEMA = "z int, x int, y int, width int, height int, mean_r double, mean_g double, mean_b double, mean_alpha double"


def encode_tile(arr: np.ndarray) -> bytes:
    """NOTE:CODEC encode an (h, w, 4) uint8 RGBA array; swap for a
    real PNG encoder in production."""
    h, w, c = arr.shape
    assert c == 4, "RGBA expected"
    return FAKE_CODEC_MAGIC + struct.pack("<II", w, h) + arr.astype(np.uint8).tobytes()


def decode_tile(data: bytes) -> np.ndarray:
    """NOTE:CODEC decode; raises on foreign formats the way a real
    decoder would."""
    if data[:4] != FAKE_CODEC_MAGIC:
        raise NotImplementedError(
            "real image codecs (PNG/JPEG) unavailable in this environment; "
            "binary column is not FAKE_CODEC formatted"
        )
    w, h = struct.unpack("<II", data[4:12])
    return np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 4)


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
                packed = np.clip((elev + 10000.0) / 0.1, 0, 16777215).astype(np.uint32)
                rgba = np.zeros(arr.shape, dtype=np.uint8)
                rgba[..., 0] = (packed >> 16) & 0xFF
                rgba[..., 1] = (packed >> 8) & 0xFF
                rgba[..., 2] = packed & 0xFF
                rgba[..., 3] = 255
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
