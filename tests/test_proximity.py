"""Exact distributed EDT vs brute-force Euclidean oracle."""

import numpy as np
import ray.data as rd

from gdal_ray.stages import proximity
from tests.test_collar import _tiles_from_mosaic


def _brute_edt(targets: np.ndarray) -> np.ndarray:
    ys, xs = np.nonzero(targets)
    h, w = targets.shape
    gy, gx = np.mgrid[0:h, 0:w]
    if xs.size == 0:
        return np.full((h, w), np.nan)
    d2 = (gx.ravel()[:, None] - xs) ** 2 + (gy.ravel()[:, None] - ys) ** 2
    return np.sqrt(d2.min(axis=1)).reshape(h, w)


def test_proximity_exact_vs_brute():
    rng = np.random.default_rng(21)
    size = 16
    arr = np.zeros((48, 32), dtype=np.uint8)
    pts = rng.integers(0, [48, 32], (12, 2))
    arr[pts[:, 0], pts[:, 1]] = 7
    tiles = _tiles_from_mosaic(arr, size)
    out = proximity.proximity(rd.from_arrow(tiles), target_value=7.0).take_all()
    got = np.full((48, 32), np.nan)
    for r in out:
        a = np.frombuffer(r["data"], np.float64).reshape(size, size)
        got[r["y"] * size : (r["y"] + 1) * size, r["x"] * size : (r["x"] + 1) * size] = a
    expect = _brute_edt(arr == 7)
    assert np.allclose(got, expect)


def test_proximity_empty_columns_and_no_targets():
    size = 8
    arr = np.zeros((16, 16), dtype=np.uint8)
    arr[3, 3] = 1  # single target; most columns empty
    tiles = _tiles_from_mosaic(arr, size)
    out = proximity.proximity(rd.from_arrow(tiles), target_value=1.0).take_all()
    got = np.full((16, 16), np.nan)
    for r in out:
        a = np.frombuffer(r["data"], np.float64).reshape(size, size)
        got[r["y"] * size : (r["y"] + 1) * size, r["x"] * size : (r["x"] + 1) * size] = a
    expect = _brute_edt(arr == 1)
    assert np.allclose(got, expect)
    assert got[3, 3] == 0.0
    # no targets at all -> NaN everywhere
    arr0 = np.zeros((16, 16), dtype=np.uint8)
    out0 = proximity.proximity(
        rd.from_arrow(_tiles_from_mosaic(arr0, size)), target_value=1.0
    ).take_all()
    a0 = np.frombuffer(out0[0]["data"], np.float64)
    assert np.isnan(a0).all()
