"""Unit tests for the pure-numpy geodesy kernels.

Oracles here are closed-form / independent reimplementations (math module,
brute force), mirroring the reference's autotest style of literal expected
values (e.g. autotest/alg/rasterize.py golden checksums).
"""

import math

import numpy as np
import pytest

from gdal_ray.functions import geo


def test_mercator_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179.9, 179.9, 5000)
    lat = rng.uniform(-84.9, 84.9, 5000)
    mx, my = geo.lonlat_to_mercator(lon, lat)
    lo, la = geo.mercator_to_lonlat(mx, my)
    assert np.allclose(lon, lo, atol=1e-9)
    assert np.allclose(lat, la, atol=1e-9)


def test_mercator_known_values():
    mx, my = geo.lonlat_to_mercator(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
    assert mx[0] == 0.0 and my[0] == pytest.approx(0.0, abs=1e-6)
    assert mx[1] == pytest.approx(geo.ORIGIN_SHIFT)


def test_tile_math_vs_scalar_reference():
    """Vectorized numpy tile math must agree with a scalar libm (math module)
    implementation on the derived-coordinate grid — this is the same check
    that guards the DuckDB oracle expressions."""
    keys = np.arange(0, 200_000, dtype=np.int64)
    lon, lat = geo.derive_lonlat(keys)
    for z in (0, 4, 8, 12):
        tx, ty = geo.lonlat_to_tile(lon, lat, z)
        n = 1 << z
        sample = np.linspace(0, keys.size - 1, 500).astype(int)
        for i in sample:
            sx = math.floor((lon[i] + 180.0) / 360.0 * n)
            lr = math.radians(lat[i])
            sy = math.floor((1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr)) / math.pi) / 2.0 * n)
            assert tx[i] == min(max(sx, 0), n - 1)
            assert ty[i] == min(max(sy, 0), n - 1)


def test_tile_known_values():
    # lon=0,lat=0 at z=1 -> tile (1, 0) boundary: x=1, y must be 0 (just above equator? no: y=1)
    tx, ty = geo.lonlat_to_tile(np.array([0.0]), np.array([0.0]), 1)
    assert tx[0] == 1 and ty[0] == 1
    tx, ty = geo.lonlat_to_tile(np.array([-180.0]), np.array([85.0]), 2)
    assert tx[0] == 0 and ty[0] == 0


def test_geotransform_roundtrip():
    gt = geo.tile_geotransform(3, 2, 5, 256)
    inv = geo.inv_geotransform(gt)
    px = np.array([0.0, 128.0, 256.0])
    py = np.array([0.0, 77.0, 256.0])
    gx, gy = geo.apply_geotransform(gt, px, py)
    bx, by = geo.apply_geotransform(inv, gx, gy)
    assert np.allclose(bx, px) and np.allclose(by, py)


def test_morton_roundtrip_and_locality():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 28, 10_000)
    y = rng.integers(0, 1 << 28, 10_000)
    c = geo.morton_encode(x, y)
    x2, y2 = geo.morton_decode(c)
    assert (x == x2).all() and (y == y2).all()


def test_hilbert_is_permutation():
    order = 5
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    d = geo.hilbert_encode(gx.ravel(), gy.ravel(), order)
    assert sorted(d.tolist()) == list(range(n * n))
    # adjacent along the curve -> grid distance exactly 1
    pos = np.empty(n * n, dtype=np.int64)
    pos[d] = np.arange(n * n)
    xs, ys = gx.ravel()[pos], gy.ravel()[pos]
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (step == 1).all()


def test_cell_ids_roundtrip():
    rng = np.random.default_rng(11)
    res = 9
    tx = rng.integers(0, 1 << res, 1000)
    ty = rng.integers(0, 1 << res, 1000)
    c = geo.cell_id(res, tx, ty)
    r2, x2, y2 = geo.cell_decode(c)
    assert (r2 == res).all() and (x2 == tx).all() and (y2 == ty).all()


def test_bbox_cover_cells_brute():
    minx = np.array([-10.0, 100.0])
    miny = np.array([-5.0, 40.0])
    maxx = np.array([12.0, 101.0])
    maxy = np.array([8.0, 41.0])
    res = 5
    rows, cells = geo.bbox_cover_cells(minx, miny, maxx, maxy, res)
    for i in range(2):
        got = set(cells[rows == i].tolist())
        x0, y1 = geo.lonlat_to_tile(minx[i : i + 1], miny[i : i + 1], res)
        x1, y0 = geo.lonlat_to_tile(maxx[i : i + 1], maxy[i : i + 1], res)
        expect = set()
        for cx in range(int(x0[0]), int(x1[0]) + 1):
            for cy in range(int(y0[0]), int(y1[0]) + 1):
                expect.add(int(geo.cell_id(res, np.array([cx]), np.array([cy]))[0]))
        assert got == expect


def test_neighbor_cells():
    c = int(geo.cell_id(4, np.array([5]), np.array([5]))[0])
    ring = geo.neighbor_cells(c, 1)
    assert len(ring) == 9
    assert c in set(ring.tolist())


def test_derive_lonlat_range():
    keys = np.arange(0, 1_000_000, 7919, dtype=np.int64)
    lon, lat = geo.derive_lonlat(keys)
    assert lon.min() >= -180 and lon.max() < 180
    assert lat.min() >= -85 and lat.max() < 85


def test_srs_info():
    """gdalsrsinfo surface (apps/gdalsrsinfo.cpp): family + proj4 report
    for every routed code; honest guard elsewhere."""
    from gdal_ray.functions import geo

    i = geo.srs_info("EPSG:2154")
    assert i["family"] == "lcc"
    assert "+proj=lcc" in i["proj4"] and "+lat_1=44" in i["proj4"]
    assert geo.srs_info("EPSG:4326")["family"] == "geographic"
    assert geo.srs_info("EPSG:32701")["family"] == "tmerc"
    assert "+lat_0=-90" in geo.srs_info("EPSG:3031")["proj4"]
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        geo.srs_info("EPSG:99999")
    # every table-routed code reports without raising
    for code in list(geo._EPSG_TABLE):
        geo.srs_info(code)
