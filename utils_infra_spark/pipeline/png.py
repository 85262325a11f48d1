"""Pure-numpy PNG codec (stdlib zlib + struct only).

A minimal but REAL implementation of the PNG interchange format
(RFC 2083 / ISO 15948 — public specification) so the multimodal
pipelines (pipeline/multimodal.py, SURVEY.md §2.9 R1-R4) exercise a
genuine wire format even in environments without PIL:

- encode: 8-bit greyscale / RGB / RGBA, filter type 0 (None) on every
  scanline, one zlib IDAT, CRC-checked chunks. Filter 0 keeps the
  encoder ~20 lines and byte-deterministic (fixed zlib level), which
  the oracle-hashed fixtures rely on; compression ratio is the only
  thing sacrificed.
- decode: bit depth 8, colour types 0 (grey), 2 (RGB), 3 (palette),
  4 (grey+alpha), 6 (RGBA), non-interlaced, with ALL five scanline
  filters (None/Sub/Up/Average/Paeth) so files produced by real
  encoders — which pick filters per line — round-trip correctly.

Decode unfiltering is vectorized per scanline: Sub is a running sum
along x (cumulative by pixel loop over width only for Paeth, whose
predictor is inherently sequential); tiles are ≤256 px wide so the
Paeth loop is bounded and cheap. The codec is a correctness seam,
not a throughput path — pixel work downstream is numpy either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# colour type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode a (h, w), (h, w, 3) or (h, w, 4) uint8 array as PNG."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise ValueError(f"expected (h,w[,1|3|4]) uint8 array, got shape {arr.shape}")
    h, w, c = a.shape
    colour = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colour, 0, 0, 0)
    # filter byte 0 in front of every scanline
    raw = np.concatenate([np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Unfilter one Paeth scanline (sequential in x by definition)."""
    out = cur.astype(np.int32)
    n = out.shape[0]
    for i in range(n):
        left = out[i - bpp] if i >= bpp else 0
        up = int(prev[i])
        ul = int(prev[i - bpp]) if i >= bpp else 0
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        if pa <= pb and pa <= pc:
            pred = left
        elif pb <= pc:
            pred = up
        else:
            pred = ul
        out[i] = (out[i] + pred) & 0xFF
    return out.astype(np.uint8)


def _avg_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Unfilter one Average scanline (left term makes it sequential)."""
    out = cur.astype(np.int32)
    n = out.shape[0]
    for i in range(n):
        left = out[i - bpp] if i >= bpp else 0
        out[i] = (out[i] + ((left + int(prev[i])) >> 1)) & 0xFF
    return out.astype(np.uint8)


def _sub_row(cur: np.ndarray, bpp: int) -> np.ndarray:
    """Unfilter Sub: x += left — a running sum per byte lane mod 256."""
    lanes = cur.reshape(-1, bpp) if cur.shape[0] % bpp == 0 else None
    if lanes is None:
        out = cur.astype(np.int32)
        for i in range(bpp, out.shape[0]):
            out[i] = (out[i] + out[i - bpp]) & 0xFF
        return out.astype(np.uint8)
    return np.cumsum(lanes.astype(np.uint64), axis=0).astype(np.uint8).reshape(cur.shape)


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG to uint8 (h, w) or (h, w, channels).

    Supports bit depth 8, colour types 0/2/3/4/6, no interlace —
    raises ValueError on anything else (loud, never a wrong array).
    """
    buf = bytes(data)
    if buf[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        (expect,) = struct.unpack(">I", buf[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != expect:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, colour, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    if colour not in _CHANNELS:
        raise ValueError(f"unsupported colour type {colour}")
    c = _CHANNELS[colour]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")
    raw = raw.reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, cur = int(filters[y]), rows[y]
        if f == 0:
            line = cur.copy()
        elif f == 1:
            line = _sub_row(cur, c)
        elif f == 2:
            line = (cur.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:
            line = _avg_row(cur, prev, c)
        elif f == 4:
            line = _paeth_row(cur, prev, c)
        else:
            raise ValueError(f"bad filter type {f} on line {y}")
        out[y] = line
        prev = line
    if colour == 3:
        if palette is None:
            raise ValueError("palette image without PLTE chunk")
        return palette[out.reshape(h, w)]
    if c == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, c)
