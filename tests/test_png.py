"""Tests for the pure-numpy PNG codec (utils_infra_spark/pipeline/png.py).

The encoder only emits filter 0, but real-world encoders pick filters
per scanline — so the decoder is exercised against hand-built streams
forward-filtered with every filter type (the spec's own definitions),
which is exactly what a foreign encoder would produce.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from utils_infra_spark.pipeline.png import (
    PNG_SIGNATURE,
    _chunk,
    png_decode,
    png_encode,
)


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 3), (5, 7, 4), (64, 64, 4), (1, 1, 3)])
def test_roundtrip_shapes(shape):
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode(arr))
    assert out.shape == arr.shape
    assert (out == arr).all()


def test_signature_and_chunks_wellformed():
    data = png_encode(np.zeros((2, 2, 3), dtype=np.uint8))
    assert data[:8] == PNG_SIGNATURE
    # IHDR immediately after signature, IEND at the end
    assert data[12:16] == b"IHDR"
    assert data[-8:-4] == b"IEND"
    w, h, depth, colour, comp, filt, interlace = struct.unpack(">IIBBBBB", data[16:29])
    assert (w, h, depth, colour) == (2, 2, 8, 2)


def _forward_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Apply a PNG forward filter to every scanline (spec §6), giving
    the byte stream a real encoder using that filter would emit."""
    h, w, c = arr.shape
    bpp = c
    raw = arr.reshape(h, w * c).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if ftype == 0:
            line = cur
        elif ftype == 1:
            line = cur - left
        elif ftype == 2:
            line = cur - prev
        elif ftype == 3:
            line = cur - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            line = cur - pred
        out.append(ftype)
        out.extend((line & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_every_filter_type(ftype):
    rng = np.random.default_rng(ftype)
    arr = rng.integers(0, 256, size=(9, 6, 4), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 6, 9, 8, 6, 0, 0, 0)
    idat = zlib.compress(_forward_filter(arr, ftype))
    stream = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
    assert (png_decode(stream) == arr).all()


def test_decode_palette_image():
    # colour type 3: 2x2 image indexing a 3-colour palette
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    stream = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert (png_decode(stream) == palette[idx]).all()


def test_decode_rejects_bad_crc():
    data = bytearray(png_encode(np.zeros((3, 3, 4), dtype=np.uint8)))
    data[20] ^= 0xFF  # corrupt IHDR payload without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_decode_rejects_wrong_signature_and_truncation():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"\x89PNG1234567890")
    ok = png_encode(np.zeros((3, 3, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        png_decode(ok[:20])


def test_encode_rejects_bad_shapes():
    with pytest.raises(ValueError):
        png_encode(np.zeros((2, 2, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        png_encode(np.zeros(8, dtype=np.uint8))
