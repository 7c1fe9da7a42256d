"""Unit tests for the exact fractional-pixel coverage kernel
(stages/coverage.py — the FRACTIONAL zonal mode, alg/zonal.cpp:2173).

Strategy: closed forms first (axis-aligned dyadic rectangles, right
triangles, holes), then invariances (window clipping == global compute,
tile splits sum to the whole), then the end-to-end actor stage against a
dense-supersampling reference.
"""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import wkb
from gdal_ray.stages import coverage


def _rect_ring(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)


def _cov_one(rings, signs, w, h):
    return coverage.coverage_fractions(
        [np.asarray(r, dtype=np.float64) for r in rings],
        np.zeros(len(rings), dtype=np.int64),
        np.asarray(signs, dtype=np.float64), 1, w, h)[0]


def _supersample(rings, signs, w, h, ss=64):
    """Dense reference: midpoint crossing-number sampling at ss^2/pixel."""
    step = 1.0 / ss
    xs = (np.arange(w * ss) + 0.5) * step
    ys = (np.arange(h * ss) + 0.5) * step
    X, Y = np.meshgrid(xs, ys)
    acc = np.zeros_like(X)
    for ring, sgn in zip(rings, signs):
        r = np.asarray(ring, dtype=np.float64)
        inside = np.zeros(X.shape, dtype=np.float64)
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        for i in range(len(x1)):
            cond = (y1[i] <= Y) != (y2[i] <= Y)
            xi = x1[i] + (Y - y1[i]) / (y2[i] - y1[i] + 1e-300) * (x2[i] - x1[i])
            inside += np.where(cond & (X < xi), 1.0, 0.0)
        acc += np.sign(sgn) * (inside % 2)
    acc = np.clip(acc, 0.0, 1.0)
    return acc.reshape(h, ss, w, ss).mean(axis=(1, 3))


def test_dyadic_rectangle_exact():
    # rect [0.25, 0.75] x [1.5, 3.25] over a 4x4 window: every pixel
    # fraction is an exact dyadic rational
    cov = _cov_one([_rect_ring(0.25, 1.5, 0.75, 3.25)], [1.0], 4, 4)
    exp = np.zeros((4, 4))
    exp[1, 0] = 0.5 * 0.5          # y in [1.5,2), x overlap 0.5
    exp[2, 0] = 0.5 * 1.0          # full row y in [2,3)
    exp[3, 0] = 0.5 * 0.25         # y in [3,3.25)
    assert np.array_equal(cov, exp)
    assert cov.sum() == 0.5 * 1.75


def test_rectangle_orientation_irrelevant():
    ring = _rect_ring(0.25, 1.5, 0.75, 3.25)
    cw = ring[::-1].copy()
    # sign carries winding: a CW shell still integrates positive
    a = _cov_one([ring], [1.0], 4, 4)
    b = _cov_one([cw], [-1.0], 4, 4)
    assert np.array_equal(a, b)


def test_right_triangle_half_pixels():
    # triangle (0,0)-(4,0)-(0,4): diagonal pixels get exactly 1/2
    tri = np.array([[0, 0], [4, 0], [0, 4], [0, 0]], dtype=np.float64)
    cov = _cov_one([tri], [1.0], 4, 4)
    assert cov.sum() == pytest.approx(8.0, abs=1e-12)
    for i in range(4):
        assert cov[i, 3 - i] == pytest.approx(0.5, abs=1e-12)
    # fully-inside pixels exactly 1, fully-outside exactly 0
    assert cov[0, 0] == 1.0 and cov[3, 3] == 0.0


def test_hole_subtracts():
    shell = _rect_ring(0.0, 0.0, 4.0, 4.0)
    hole = _rect_ring(1.0, 1.0, 3.0, 3.0)
    cov = _cov_one([shell, hole], [1.0, -1.0], 4, 4)
    assert cov.sum() == pytest.approx(16.0 - 4.0, abs=1e-12)
    assert cov[1, 1] == 0.0 and cov[2, 2] == 0.0
    assert cov[0, 0] == 1.0


def test_window_clip_matches_inside_portion():
    # polygon extends far outside the 4x4 window; clipped coverage must
    # equal the coverage the polygon induces inside the window
    big = _rect_ring(-10.0, -3.5, 2.5, 10.0)
    cov = _cov_one([big], [1.0], 4, 4)
    exp = np.zeros((4, 4))
    exp[:, :2] = 1.0
    exp[:, 2] = 0.5
    assert np.array_equal(cov, exp)


def test_tile_split_sums_to_whole():
    # arbitrary (non-dyadic) polygon: computing over one 8x8 window must
    # equal the sum of the four 4x4 sub-window computations
    rng = np.random.default_rng(7)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
    pts = np.c_[4 + 3.3 * np.cos(ang), 4 + 2.7 * np.sin(ang)]
    ring = np.vstack([pts, pts[:1]])
    whole = _cov_one([ring], [1.0], 8, 8)
    parts = np.zeros((8, 8))
    for oy in (0, 4):
        for ox in (0, 4):
            sub = _cov_one([ring - np.array([ox, oy])], [1.0], 4, 4)
            parts[oy:oy + 4, ox:ox + 4] = sub
    assert np.allclose(whole, parts, atol=1e-12)
    # and the total equals the shoelace area (fully inside the window)
    shoelace = 0.5 * abs(np.sum(ring[:-1, 0] * ring[1:, 1]
                                - ring[1:, 0] * ring[:-1, 1]))
    assert whole.sum() == pytest.approx(shoelace, abs=1e-9)


def test_against_supersampling():
    rng = np.random.default_rng(3)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 7))
    pts = np.c_[3 + 2.6 * np.cos(ang), 3 + 2.9 * np.sin(ang)]
    ring = np.vstack([pts, pts[:1]])
    cov = _cov_one([ring], [1.0], 6, 6)
    ref = _supersample([ring], [1.0], 6, 6, ss=128)
    assert np.abs(cov - ref).max() < 2e-2  # sampling noise bound
    assert cov.min() >= -1e-12 and cov.max() <= 1 + 1e-12


def test_rings_of_wkb_signs():
    shell = _rect_ring(0, 0, 4, 4)
    hole = _rect_ring(1, 1, 2, 2)[::-1].copy()  # CW hole
    w = wkb.encode_polygon([shell, hole])
    rings, signs = coverage.rings_of_wkb(w)
    assert len(rings) == 2
    # signs are ready-to-integrate: shell lands positive, hole negative,
    # regardless of each ring's stored winding
    cov = _cov_one(rings, signs, 4, 4)
    assert cov.sum() == pytest.approx(15.0, abs=1e-12)
    # CCW-stored hole must subtract identically
    w2 = wkb.encode_polygon([shell, hole[::-1].copy()])
    rings2, signs2 = coverage.rings_of_wkb(w2)
    assert np.array_equal(_cov_one(rings2, signs2, 4, 4), cov)


def test_zonal_stage_end_to_end(ray_session):
    import ray
    import ray.data as rd

    from gdal_ray.sources import synthetic

    keys = np.arange(1, 41, dtype=np.int64)
    zones = synthetic.make_pixel_zones(keys)
    tiles = rd.from_arrow(synthetic.make_raster_tiles("hump", 4, 4, size=64))
    out = coverage.zonal_stats_fractional(tiles, zones).to_pandas()
    assert len(out) == len(keys)
    out = out.set_index("zone_key")
    # brute-force reference per zone over the stitched 256x256 raster
    full = np.zeros((256, 256))
    t = synthetic.make_raster_tiles("hump", 4, 4, size=64)
    for r in range(t.num_rows):
        x, y = t["x"][r].as_py(), t["y"][r].as_py()
        arr = np.frombuffer(t["data"][r].as_py(),
                            dtype=np.dtype(t["dtype"][r].as_py())).reshape(64, 64)
        full[y * 64:(y + 1) * 64, x * 64:(x + 1) * 64] = arr
    z = zones.to_pandas()
    for _, row in z.iterrows():
        ring = _rect_ring(row.minx, row.miny, row.maxx, row.maxy)
        cov = _cov_one([ring], [1.0], 256, 256)
        got = out.loc[row.zone_key]
        assert got["cov_sum"] if "cov_sum" in out.columns else True
        exp_cov = int(round(cov.sum() * 256))
        exp_ws = int(round((cov * full).sum() * 16384))
        cov_col = [c for c in out.columns if c.startswith("cov")][0]
        ws_col = [c for c in out.columns if c.startswith("wsum")][0]
        np_col = [c for c in out.columns if c.startswith("n_pix")][0]
        assert int(got[cov_col]) == exp_cov
        assert int(got[ws_col]) == exp_ws
        assert int(got[np_col]) == int((cov > 0).sum())
