"""WKB codec + exact predicate tests with independent oracles.

The PIP oracle is an independent winding-number implementation (different
algorithm from the engine's crossing-number), evaluated on off-boundary
fixtures — the autotest pattern (SURVEY §5 style 1).
"""

import numpy as np

from gdal_ray.functions import pip, wkb


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def winding_number_inside(px, py, ring):
    """Independent oracle: winding number (nonzero rule; equals even-odd for
    simple rings)."""
    wn = 0
    for i in range(len(ring) - 1):
        x0, y0 = ring[i]
        x1, y1 = ring[i + 1]
        if y0 <= py:
            if y1 > py and (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0) > 0:
                wn += 1
        else:
            if y1 <= py and (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0) < 0:
                wn -= 1
    return wn != 0


def test_point_roundtrip_bulk():
    rng = np.random.default_rng(5)
    x = rng.uniform(-180, 180, 1000)
    y = rng.uniform(-85, 85, 1000)
    ws = wkb.encode_points(x, y)
    x2, y2 = wkb.decode_points(ws)
    assert (x == x2).all() and (y == y2).all()
    g = wkb.decode(ws[0])
    assert g.kind == wkb.POINT and g.vertices()[0, 0] == x[0]


def test_polygon_roundtrip_area_centroid():
    ring = _sq(0, 0, 10, 4)
    g = wkb.decode(wkb.encode_polygon([ring]))
    assert wkb.geom_area(g) == 40
    assert wkb.geom_centroid(g) == (5, 2)
    hole = _sq(1, 1, 2, 2)
    g2 = wkb.decode(wkb.encode_polygon([ring, hole]))
    assert wkb.geom_area(g2) == 39
    assert g2.bbox() == (0, 0, 10, 4)


def test_multipolygon_and_linestring():
    mp = wkb.decode(wkb.encode_multipolygon([[_sq(0, 0, 1, 1)], [_sq(5, 5, 7, 7)]]))
    assert mp.kind == wkb.MULTIPOLYGON
    assert wkb.geom_area(mp) == 1 + 4
    ls = wkb.decode(wkb.encode_linestring(np.array([[0, 0], [3, 4]], float)))
    assert ls.kind == wkb.LINESTRING
    assert len(ls.vertices()) == 2


def test_pip_vs_winding_oracle_random_polygons():
    rng = np.random.default_rng(17)
    for trial in range(20):
        # random star-shaped polygon around a center (simple by construction)
        n = rng.integers(5, 12)
        angles = np.sort(rng.uniform(0, 2 * np.pi, n))
        radii = rng.uniform(1, 5, n)
        cx, cy = rng.uniform(-50, 50, 2)
        ring = np.column_stack([cx + radii * np.cos(angles), cy + radii * np.sin(angles)])
        ring = np.vstack([ring, ring[:1]])
        px = rng.uniform(cx - 6, cx + 6, 300)
        py = rng.uniform(cy - 6, cy + 6, 300)
        got = pip.points_in_ring(px, py, ring)
        expect = np.array([winding_number_inside(px[i], py[i], ring) for i in range(300)])
        assert (got == expect).all()


def test_pip_hole_and_multi():
    g = wkb.decode(wkb.encode_polygon([_sq(0, 0, 10, 10), _sq(4, 4, 6, 6)]))
    px = np.array([5.0, 3.0, 11.0, 4.5])
    py = np.array([5.0, 3.0, 5.0, 4.5])
    assert pip.points_in_geom(px, py, g).tolist() == [False, True, False, False]
    mp = wkb.decode(wkb.encode_multipolygon([[_sq(0, 0, 2, 2)], [_sq(8, 8, 9, 9)]]))
    assert pip.points_in_geom(np.array([1.0, 8.5, 5.0]), np.array([1.0, 8.5, 5.0]), mp).tolist() == [
        True,
        True,
        False,
    ]


def test_polygons_intersect_cases():
    a = wkb.decode(wkb.encode_polygon([_sq(0, 0, 10, 10)]))
    assert pip.geom_intersects(a, wkb.decode(wkb.encode_polygon([_sq(5, 5, 15, 15)])))  # overlap
    assert pip.geom_intersects(a, wkb.decode(wkb.encode_polygon([_sq(10, 0, 20, 10)])))  # touch edge
    assert pip.geom_intersects(a, wkb.decode(wkb.encode_polygon([_sq(2, 2, 3, 3)])))  # containment
    assert not pip.geom_intersects(a, wkb.decode(wkb.encode_polygon([_sq(11, 11, 20, 20)])))
    # cross without any vertex inside (plus-sign configuration)
    h = wkb.decode(wkb.encode_polygon([_sq(-5, 4, 15, 6)]))
    assert pip.geom_intersects(a, h)
    # point vs polygon
    p_in = wkb.decode(wkb.encode_points(np.array([5.0]), np.array([5.0]))[0])
    p_out = wkb.decode(wkb.encode_points(np.array([50.0]), np.array([5.0]))[0])
    assert pip.geom_intersects(a, p_in)
    assert not pip.geom_intersects(a, p_out)


def test_bbox_matrices():
    a = np.array([[0, 0, 2, 2], [5, 5, 6, 6]], float)
    b = np.array([[1, 1, 3, 3], [10, 10, 11, 11]], float)
    m = pip.bbox_intersects(a, b)
    assert m.tolist() == [[True, False], [False, False]]
    pts = pip.bbox_contains_points(a, np.array([1.0, 5.5]), np.array([1.0, 5.5]))
    assert pts.tolist() == [[True, False], [False, True]]
