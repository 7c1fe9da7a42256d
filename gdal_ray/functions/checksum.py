"""Tile checksums — the golden-output mechanism for raster conformance.

Role model: ``GDALChecksumImage`` (reference ``alg/gdalchecksum.cpp:48``), the
16-bit modular pixel sum that dominates GDAL's autotest golden assertions
(SURVEY §5 style 1).  We define our own deterministic equivalent (independent
implementation, same spirit): a position-weighted 16-bit modular sum that is
order-independent across tiles given a fixed global pixel layout, so
distributed per-tile partials compose exactly:

    weight(i) = (i % 7) + 1        # i = global row-major pixel index
    checksum  = sum(int(px_i) * weight(i)) mod 65536

Float rasters are cast through int32 truncation first (mirroring how
GDALChecksumImage reads via Int32).
"""

from __future__ import annotations

import numpy as np

MOD = 65536


def tile_checksum(arr: np.ndarray, gx0: int = 0, gy0: int = 0, global_width: int = 0) -> int:
    """Checksum of one tile.  If global_width > 0, weights use GLOBAL pixel
    indices (gy*global_width + gx) so per-tile checksums sum (mod 65536) to
    the mosaic checksum."""
    a = np.asarray(arr)
    if a.dtype.kind == "f":
        a = a.astype(np.int64)  # truncation toward zero for positives
    else:
        a = a.astype(np.int64)
    h, w = a.shape
    gy, gx = np.mgrid[0:h, 0:w]
    if global_width > 0:
        idx = (gy + gy0) * np.int64(global_width) + (gx + gx0)
    else:
        idx = gy * np.int64(w) + gx
    weights = (idx % 7) + 1
    return int((a * weights).sum() % MOD)


def combine_checksums(parts) -> int:
    """Mosaic checksum from per-tile partials (modular addition)."""
    return int(sum(parts) % MOD)
