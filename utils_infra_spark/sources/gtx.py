"""S13: .gtx binary geoid-grid loader (ref terrain-proxy/
server.js:145-158 ``loadGeoidModel``).

Wire format (mirroring the reference's reader byte-for-byte):
big-endian header — 4 float64 (lat_min, lon_min, dlat, dlon) at
offsets 0/8/16/24, 2 int32 (nrows, ncols) at 32/36 — then the
float32 grid starting at offset 44 (the reference subarrays at 44,
skipping 4 bytes after the 40-byte header), row-major, rows
south→north, columns west→east.

Scale shape: the grid is a driver-side read (a geoid model is a few
MB) handed to executors ONCE — either as a closure capture inside a
numpy kernel (`separation_np`) or as a literal array column feeding
`functions.geo.bilinear_interpolate` (`grid_column`). Never a
per-row file read.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

_HEADER = struct.Struct(">4d2i")  # lat_min, lon_min, dlat, dlon, nrows, ncols
_GRID_OFFSET = 44  # ref server.js:157: data starts 4 bytes past the 40-byte header


@dataclass(frozen=True)
class GtxGrid:
    lat_min: float
    lon_min: float
    dlat: float
    dlon: float
    values: np.ndarray  # (nrows, ncols) float32, south→north / west→east

    @property
    def nrows(self) -> int:
        return self.values.shape[0]

    @property
    def ncols(self) -> int:
        return self.values.shape[1]

    def separation_np(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        """Vectorized bilinear separation lookup with the reference's
        exact semantics (server.js:160-177): west longitudes shift
        +360, and any point whose base node falls outside
        [0, n-2] returns 0.0 (no extrapolation)."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        adj_lon = np.where(lon < 0, lon + 360.0, lon)
        row = (lat - self.lat_min) / self.dlat
        col = (adj_lon - self.lon_min) / self.dlon
        r0 = np.floor(row).astype(np.int64)
        c0 = np.floor(col).astype(np.int64)
        ok = (r0 >= 0) & (r0 < self.nrows - 1) & (c0 >= 0) & (c0 < self.ncols - 1)
        r0c = np.clip(r0, 0, self.nrows - 2)
        c0c = np.clip(c0, 0, self.ncols - 2)
        fr = row - r0
        fc = col - c0
        g = self.values
        v = (
            g[r0c, c0c] * (1 - fr) * (1 - fc)
            + g[r0c, c0c + 1] * (1 - fr) * fc
            + g[r0c + 1, c0c] * fr * (1 - fc)
            + g[r0c + 1, c0c + 1] * fr * fc
        )
        return np.where(ok, v, 0.0)

    def grid_column(self) -> Column:
        """The grid as a literal array<array<double>> column for
        `functions.geo.bilinear_interpolate` (rows south→north) —
        Catalyst ships it to executors once as part of the plan."""
        rows = [F.array(*[F.lit(float(v)) for v in r]) for r in self.values]
        return F.array(*rows)


def load_gtx(path: str) -> GtxGrid:
    """Read a .gtx geoid file (driver-side, numpy)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    lat_min, lon_min, dlat, dlon, nrows, ncols = _HEADER.unpack_from(buf, 0)
    grid = (
        np.frombuffer(buf, dtype=">f4", count=nrows * ncols, offset=_GRID_OFFSET)
        .reshape(nrows, ncols)
        .astype(np.float32)
    )
    return GtxGrid(lat_min, lon_min, dlat, dlon, grid)


def write_gtx(path: str, grid: GtxGrid) -> None:
    """Inverse of load_gtx (test fixtures / synthetic grids)."""
    with open(path, "wb") as fh:
        fh.write(_HEADER.pack(grid.lat_min, grid.lon_min, grid.dlat, grid.dlon, grid.nrows, grid.ncols))
        fh.write(b"\x00" * (_GRID_OFFSET - _HEADER.size))
        fh.write(grid.values.astype(">f4").tobytes())
