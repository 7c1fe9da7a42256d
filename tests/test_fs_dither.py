"""Floyd-Steinberg row-band pipeline vs an independent whole-image replay."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.stages import fillpalette as fp


def _reference_fs(img, pal):
    """Straight transliteration of the alg/gdaldither.cpp scan (single
    band): whole image, one error line, C-truncated sixths."""
    h, w = img.shape
    idx = np.zeros((h, w), np.int64)
    err = np.zeros(w + 2, np.int64)
    for y in range(h):
        nxt = np.zeros(w + 2, np.int64)
        last = 0
        for x in range(w):
            v = int(img[y, x]) + int(err[x + 1])
            v = min(255, max(0, v))
            v = min(255, max(0, v + last))
            j = int(np.argmin(np.abs(pal - v)))
            idx[y, x] = j
            e = v - int(pal[j])
            sixth = -((-e) // 6) if e < 0 else e // 6
            nxt[x] += sixth
            nxt[x + 2] = sixth
            nxt[x + 1] += e - 5 * sixth
            last = 2 * sixth
        err = nxt
    return idx


def _tiles_of(arr, tile):
    H, W = arr.shape
    rows = []
    for ty in range(H // tile):
        for tx in range(W // tile):
            sub = arr[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            rows.append({"z": 0, "x": tx, "y": ty, "band": 1, "width": tile,
                         "height": tile, "crs": "EPSG:3857", "nodata": -1.0,
                         "dtype": "uint8",
                         "data": np.ascontiguousarray(sub).tobytes()})
    return pa.Table.from_pylist(rows)


def test_fs_pipeline_matches_reference_scan(ray_session):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (96, 128)).astype(np.uint8)
    pal = np.array([0, 85, 170, 255], np.int64)
    exp_idx = _reference_fs(img, pal)
    exp = {}
    for ty in range(3):
        for tx in range(4):
            sub = exp_idx[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32]
            n = np.bincount(sub.ravel(), minlength=4)
            for j in np.flatnonzero(n):
                exp[(tx, ty, int(j))] = int(n[j])
    got_t = fp.dither_floyd_steinberg(
        rd.from_arrow(_tiles_of(img, 32)), pal, nx=4, ny=3, tile_size=32)
    got = {(r["x"], r["y"], r["idx"]): r["n"] for r in got_t.to_pylist()}
    assert got == exp


def test_fs_smooth_gradient_average_preserved(ray_session):
    """Error diffusion preserves the mean: dithering a flat 100 gray to
    palette {0,255} must keep the average near 100 (Bayer would too, but a
    naive nearest-only quantizer would give 0)."""
    img = np.full((64, 64), 100, np.uint8)
    pal = np.array([0, 255], np.int64)
    out = fp.dither_floyd_steinberg(
        rd.from_arrow(_tiles_of(img, 64)), pal, nx=1, ny=1,
        tile_size=64).to_pylist()
    n1 = sum(r["n"] for r in out if r["idx"] == 1)
    mean = 255.0 * n1 / (64 * 64)
    assert abs(mean - 100.0) < 4.0
