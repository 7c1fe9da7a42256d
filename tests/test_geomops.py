"""Geometry scalar operator tests (own-implementation oracles)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.functions import pip, wkb
from gdal_ray.stages import geomops


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def _tbl(wkbs):
    return pa.table({"fid": pa.array(range(len(wkbs)), pa.int64()),
                     "wkb": pa.array(wkbs, pa.binary())})


def test_area_centroid():
    t = geomops.area_centroid_batch(_tbl([wkb.encode_polygon([_sq(0, 0, 4, 2)])]))
    assert t["area"][0].as_py() == 8.0
    assert t["cx"][0].as_py() == 2.0 and t["cy"][0].as_py() == 1.0


def test_buffer_points_contains_disk():
    pts = wkb.encode_points(np.array([10.0]), np.array([20.0]))
    t = geomops.buffer_points_batch(_tbl(pts), distance=2.0, segments=64)
    g = wkb.decode(t["wkb"][0].as_py())
    # inscribed: points within r*cos(pi/n) are inside
    inner = 2.0 * np.cos(np.pi / 64) * 0.99
    assert pip.points_in_geom(np.array([10.0 + inner]), np.array([20.0]), g)[0]
    assert not pip.points_in_geom(np.array([12.5]), np.array([20.0]), g)[0]
    assert abs(wkb.geom_area(g) - np.pi * 4) < 0.05


def test_simplify_removes_collinear():
    line = np.array([[0, 0], [1, 0.001], [2, 0], [3, 5], [4, 0]], float)
    t = geomops.simplify_batch(_tbl([wkb.encode_linestring(line)]), tolerance=0.01)
    g = wkb.decode(t["wkb"][0].as_py())
    assert len(g.parts[0]) == 4  # middle near-collinear vertex dropped
    assert (g.parts[0][0] == [0, 0]).all() and (g.parts[0][-1] == [4, 0]).all()


def test_convex_hull():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]], float)
    ring = geomops.convex_hull(pts)
    assert abs(wkb.ring_area(ring)) == 16.0
    assert len(ring) == 5


def test_segmentize():
    t = geomops.segmentize_batch(
        _tbl([wkb.encode_linestring(np.array([[0, 0], [10, 0]], float))]), max_len=3.0
    )
    g = wkb.decode(t["wkb"][0].as_py())
    pts = g.parts[0]
    assert len(pts) == 5  # 4 segments of 2.5
    seglens = np.hypot(*np.diff(pts, axis=0).T)
    assert (seglens <= 3.0 + 1e-12).all()


def test_swap_and_precision():
    t = geomops.swap_xy_batch(_tbl(wkb.encode_points(np.array([1.0]), np.array([2.0]))))
    v = wkb.decode(t["wkb"][0].as_py()).vertices()[0]
    assert (v == [2.0, 1.0]).all()
    t2 = geomops.set_precision_batch(
        _tbl(wkb.encode_points(np.array([1.234]), np.array([5.678]))), grid=0.1
    )
    v2 = wkb.decode(t2["wkb"][0].as_py()).vertices()[0]
    assert np.allclose(v2, [1.2, 5.7])


def test_explode_collections():
    mp = wkb.encode_multipolygon([[_sq(0, 0, 1, 1)], [_sq(5, 5, 6, 6)]])
    single = wkb.encode_polygon([_sq(9, 9, 10, 10)])
    ds = rd.from_arrow(_tbl([mp, single]))
    rows = geomops.explode_collections(ds).take_all()
    assert len(rows) == 3
    kinds = [wkb.geom_type(r["wkb"]) for r in rows]
    assert kinds == [wkb.POLYGON] * 3
    fids = sorted(r["fid"] for r in rows)
    assert fids == [0, 0, 1]


def test_linearize_arcs():
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.stages.geomops import linearize_arcs, linearize_batch

    # CCW quarter circle on the unit circle: (1,0) -> (0,1) via 45 deg
    a = np.radians([0.0, 45.0, 90.0])
    pts = np.stack([np.cos(a), np.sin(a)], axis=1)
    out = linearize_arcs(pts, max_angle_deg=4.0)
    assert len(out) == int(np.ceil(90 / 4.0)) + 1  # 23 segments, 24 vertices
    assert np.allclose(out[0], pts[0]) and np.allclose(out[-1], pts[2])
    # every sampled vertex lies on the circle
    assert np.allclose(np.hypot(out[:, 0], out[:, 1]), 1.0, atol=1e-12)
    # monotone CCW progression through the middle control point
    ang = np.unwrap(np.arctan2(out[:, 1], out[:, 0]))
    assert (np.diff(ang) > 0).all()

    # CW arc: (0,1) -> (1,0) the short way (through 45 deg, decreasing angle)
    out_cw = linearize_arcs(pts[::-1], max_angle_deg=4.0)
    ang_cw = np.unwrap(np.arctan2(out_cw[:, 1], out_cw[:, 0]))
    assert (np.diff(ang_cw) < 0).all()

    # collinear control points degenerate to the chord
    line = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    assert np.array_equal(linearize_arcs(line), np.array([[0.0, 0.0], [2.0, 0.0]]))

    # batch wrapper: CircularString becomes LineString, others untouched
    cs = wkb_f.encode_circularstring(pts)
    ls = wkb_f.encode_linestring(pts)
    t = pa.table({"wkb": pa.array([cs, ls], pa.binary())})
    r = linearize_batch(t, max_angle_deg=4.0)
    g0 = wkb_f.decode(r["wkb"][0].as_py())
    assert g0.kind == wkb_f.LINESTRING and len(g0.parts[0]) == 24
    assert r["wkb"][1].as_py() == ls

    # odd-count validation
    import pytest

    with pytest.raises(ValueError, match="odd point count"):
        wkb_f.encode_circularstring(pts[:2])


def test_linearize_compound_and_curvepolygon():
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.stages.geomops import linearize_batch

    # CompoundCurve: straight segment then a CCW half-circle back over it
    seg = wkb_f.encode_linestring(np.array([[-1.0, 0.0], [1.0, 0.0]]))
    a = np.radians([0.0, 90.0, 180.0])
    arc = wkb_f.encode_circularstring(np.stack([np.cos(a), np.sin(a)], axis=1))
    cc = wkb_f.encode_compoundcurve([seg, arc])
    t = pa.table({"wkb": pa.array([cc], pa.binary())})
    g = wkb_f.decode(linearize_batch(t, 4.0)["wkb"][0].as_py())
    assert g.kind == wkb_f.LINESTRING
    pts = g.parts[0]
    # 2 (segment) + 45 arc vertices, joint vertex (1,0) deduplicated
    assert len(pts) == 2 + int(np.ceil(180 / 4.0))
    assert np.allclose(pts[0], [-1, 0]) and np.allclose(pts[-1], [-1, 0])
    r = np.hypot(pts[2:, 0], pts[2:, 1])
    assert np.allclose(r, 1.0, atol=1e-12)

    # CurvePolygon: full circle as one closed two-arc CircularString ring
    a2 = np.radians([0.0, 90.0, 180.0, 270.0, 360.0])
    ring = wkb_f.encode_circularstring(
        np.stack([np.cos(a2), np.sin(a2)], axis=1))
    cp = wkb_f.encode_curvepolygon([ring])
    t2 = pa.table({"wkb": pa.array([cp], pa.binary())})
    g2 = wkb_f.decode(linearize_batch(t2, 4.0)["wkb"][0].as_py())
    assert g2.kind == wkb_f.POLYGON
    rpts = g2.parts[0][0]
    assert np.allclose(rpts[0], rpts[-1])  # ring stays closed
    # shoelace area approaches the unit-circle area from below
    x, y = rpts[:, 0], rpts[:, 1]
    area = 0.5 * abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
    assert 0.995 * np.pi < area < np.pi


def test_force_2d():
    import struct as st

    import pyarrow as pa
    import pytest

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.stages.geomops import force_2d_batch

    pz = b"\x01" + st.pack("<I", 1001) + st.pack("<ddd", 1.0, 2.0, 99.0)
    # strict decode refuses Z; force-2d mode drops it
    with pytest.raises(ValueError, match="force_2d"):
        wkb_f.decode(pz)
    lzm = (b"\x01" + st.pack("<II", 3002, 2)
           + st.pack("<dddd", 0.0, 0.0, 5.0, 6.0)
           + st.pack("<dddd", 1.0, 1.0, 7.0, 8.0))
    ewkb_polyz = (b"\x01" + st.pack("<II", 0x80000003, 1) + st.pack("<I", 4)
                  + st.pack("<ddd", 0, 0, 3) + st.pack("<ddd", 1, 0, 3)
                  + st.pack("<ddd", 1, 1, 3) + st.pack("<ddd", 0, 0, 3))
    plain = wkb_f.encode_linestring(np.array([[5.0, 6.0], [7.0, 8.0]]))
    t = pa.table({"wkb": pa.array([pz, lzm, ewkb_polyz, plain], pa.binary())})
    r = force_2d_batch(t)
    g0 = wkb_f.decode(r["wkb"][0].as_py())
    assert g0.kind == wkb_f.POINT and np.allclose(g0.parts[0], [[1.0, 2.0]])
    g1 = wkb_f.decode(r["wkb"][1].as_py())
    assert g1.kind == wkb_f.LINESTRING
    assert np.allclose(g1.parts[0], [[0, 0], [1, 1]])
    g2 = wkb_f.decode(r["wkb"][2].as_py())
    assert g2.kind == wkb_f.POLYGON and len(g2.parts[0][0]) == 4
    # plain 2-D WKB passes through byte-identical
    assert r["wkb"][3].as_py() == plain


def test_curve_area_exact():
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.stages.geomops import curve_area_batch

    # full unit circle (two arcs): pi exactly (to float ulp)
    a = np.radians([0.0, 90.0, 180.0, 270.0, 360.0])
    circle = wkb_f.encode_circularstring(np.stack([np.cos(a), np.sin(a)], 1))
    # same ring traversed CW: |area| identical
    circle_cw = wkb_f.encode_circularstring(
        np.stack([np.cos(a[::-1]), np.sin(a[::-1])], 1))
    # stadium: 2x1 rectangle capped by two half circles r=0.5 -> 2 + pi/4
    m = 0.5
    cap1 = wkb_f.encode_circularstring(
        np.array([[2.0, 0.0], [2.0 + m, 0.5], [2.0, 1.0]]))
    cap2 = wkb_f.encode_circularstring(
        np.array([[0.0, 1.0], [-m, 0.5], [0.0, 0.0]]))
    top = wkb_f.encode_linestring(np.array([[2.0, 1.0], [0.0, 1.0]]))
    bot = wkb_f.encode_linestring(np.array([[0.0, 0.0], [2.0, 0.0]]))
    stadium = wkb_f.encode_curvepolygon(
        [wkb_f.encode_compoundcurve([bot, cap1, top, cap2])])
    # inward-bulging arc subtracts: unit square with a half-disc bite r=0.5
    bite = wkb_f.encode_circularstring(
        np.array([[0.0, 0.0], [0.5, 0.5], [1.0, 0.0]]))  # bulges INTO the square
    rest = wkb_f.encode_linestring(
        np.array([[1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]))
    bitten = wkb_f.encode_curvepolygon(
        [wkb_f.encode_compoundcurve([bite, rest])])
    t = pa.table({"wkb": pa.array(
        [wkb_f.encode_curvepolygon([circle]),
         wkb_f.encode_curvepolygon([circle_cw]), stadium, bitten],
        pa.binary())})
    r = curve_area_batch(t)["area"].to_pylist()
    assert abs(r[0] - np.pi) < 1e-12
    assert abs(r[1] - np.pi) < 1e-12
    assert abs(r[2] - (2.0 + np.pi / 4.0)) < 1e-12
    assert abs(r[3] - (1.0 - np.pi / 8.0)) < 1e-12


def test_curve_wkt_roundtrip():
    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.functions.wkt import encode_wkt, parse_wkt

    cases = [
        "CIRCULARSTRING (0 0, 1 1, 2 0)",
        "COMPOUNDCURVE ((0 0, 2 0), CIRCULARSTRING (2 0, 3 1, 4 0))",
        "CURVEPOLYGON (CIRCULARSTRING (0 0, 1 1, 2 0, 1 -1, 0 0))",
        "CURVEPOLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
        "CIRCULARSTRING (1 1, 2 2, 3 1, 2 0.5, 1 1))",
        "CURVEPOLYGON (COMPOUNDCURVE ((0 0, 2 0), "
        "CIRCULARSTRING (2 0, 1 1, 0 0)))",
    ]
    for w in cases:
        blob = parse_wkt(w)
        assert encode_wkt(blob) == w  # repr round trip is bitwise-stable
        # re-parse of the re-rendered text gives identical WKB
        assert parse_wkt(encode_wkt(blob)) == blob
    # curve WKT -> linearize -> area consistency: circle of radius 1
    import pyarrow as pa

    from gdal_ray.stages.geomops import curve_area_batch

    cp = parse_wkt("CURVEPOLYGON (CIRCULARSTRING (1 0, 0 1, -1 0, 0 -1, 1 0))")
    t = pa.table({"wkb": pa.array([cp], pa.binary())})
    assert abs(curve_area_batch(t)["area"][0].as_py() - np.pi) < 1e-12


def test_geometrycollection(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.functions.wkt import encode_wkt, parse_wkt
    from gdal_ray.stages.geomops import explode_collections

    w = parse_wkt("GEOMETRYCOLLECTION (POINT (1 2), "
                  "LINESTRING (0 0, 1 1), "
                  "POLYGON ((0 0, 1 0, 1 1, 0 0)), "
                  "MULTIPOINT (5 5, 6 6), "
                  "GEOMETRYCOLLECTION (POINT (9 9)))")
    # WKT round trip is bitwise-stable
    assert parse_wkt(encode_wkt(w)) == w
    g = wkb_f.decode(w)
    assert g.kind == wkb_f.GEOMETRYCOLLECTION and len(g.parts) == 5
    # explode flattens nested collections and multis into 6 single parts
    ds = rd.from_arrow(pa.table({"fid": pa.array([7], pa.int64()),
                                 "wkb": pa.array([w], pa.binary())}))
    rows = explode_collections(ds).take_all()
    kinds = sorted(wkb_f.geom_type(r["wkb"]) for r in rows)
    assert kinds == [wkb_f.POINT, wkb_f.POINT, wkb_f.POINT, wkb_f.POINT,
                     wkb_f.LINESTRING, wkb_f.POLYGON]
    assert all(r["fid"] == 7 for r in rows)


def test_multicurve_multisurface():
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.functions.wkt import encode_wkt, parse_wkt
    from gdal_ray.stages.geomops import curve_area_batch, linearize_batch

    mc = parse_wkt("MULTICURVE ((0 0, 1 1), "
                   "CIRCULARSTRING (2 0, 3 1, 4 0), "
                   "COMPOUNDCURVE ((5 0, 6 0), CIRCULARSTRING (6 0, 7 1, 8 0)))")
    ms = parse_wkt("MULTISURFACE (((0 0, 1 0, 1 1, 0 0)), "
                   "CURVEPOLYGON (CIRCULARSTRING (3 0, 4 1, 5 0, 4 -1, 3 0)))")
    # WKT bitwise round trips
    for w in (mc, ms):
        assert parse_wkt(encode_wkt(w)) == w
    # linearize: MultiCurve -> MultiLineString, MultiSurface -> MultiPolygon
    t = pa.table({"wkb": pa.array([mc, ms], pa.binary())})
    r = linearize_batch(t, 4.0)
    g0 = wkb_f.decode(r["wkb"][0].as_py())
    assert g0.kind == wkb_f.MULTILINESTRING and len(g0.parts) == 3
    assert len(g0.parts[1]) == int(np.ceil(180 / 4.0)) + 1  # half circle r=1
    g1 = wkb_f.decode(r["wkb"][1].as_py())
    assert g1.kind == wkb_f.MULTIPOLYGON and len(g1.parts) == 2
    # the triangle member passes through exactly
    assert np.array_equal(g1.parts[0][0],
                          np.array([[0, 0], [1, 0], [1, 1], [0, 0]]))


def test_polyhedral_surface_tin_triangle_wkb():
    """ISO WKB 15/16/17 (ogr/ogrpolyhedralsurface.cpp, ogrtriangle.cpp):
    parse/encode roundtrip, patch areas, triangle ring contract."""
    import numpy as np
    import pytest

    from gdal_ray.functions import wkb as W

    t1 = [np.array([[0.0, 0], [2, 0], [0, 2], [0, 0]])]
    t2 = [np.array([[2.0, 0], [2, 2], [0, 2], [2, 0]])]
    tin = W.encode_surface([t1, t2], W.TIN)
    g = W.decode(tin)
    assert g.kind == W.TIN and len(g.parts) == 2
    assert W.geom_area(g) == pytest.approx(4.0)
    assert W.encode_geom(g) == tin
    ps = W.encode_surface(
        [[np.array([[0.0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])],
         [np.array([[1.0, 0], [3, 0], [3, 1], [1, 1], [1, 0]])]],
        W.POLYHEDRALSURFACE)
    g2 = W.decode(ps)
    assert g2.kind == W.POLYHEDRALSURFACE
    assert W.geom_area(g2) == pytest.approx(3.0)
    assert g2.vertices().shape == (10, 2)
    assert g2.bbox() == (0.0, 0.0, 3.0, 1.0)
    tr = W.decode(W.encode_triangle(t1))
    assert tr.kind == W.TRIANGLE and W.geom_area(tr) == pytest.approx(2.0)
    with pytest.raises(ValueError, match="4-point"):
        W.encode_triangle([np.array([[0.0, 0], [1, 0], [1, 1], [0, 1],
                                     [0, 0]])])
    # a 5-point "triangle" in the byte stream is rejected on decode too
    fake = bytearray(W.encode_polygon(
        [np.array([[0.0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])]))
    fake[1:5] = (17).to_bytes(4, "little")
    with pytest.raises(ValueError, match="4-point"):
        W.decode(bytes(fake))


def test_surface_wkt_roundtrip():
    """TIN / POLYHEDRALSURFACE / TRIANGLE text grammar, bitwise WKB
    roundtrip."""
    import numpy as np

    from gdal_ray.functions import wkb as W
    from gdal_ray.functions import wkt as T

    t1 = [np.array([[0.0, 0], [2, 0], [0, 2], [0, 0]])]
    t2 = [np.array([[2.0, 0], [2, 2], [0, 2], [2, 0]])]
    for wkb in (W.encode_surface([t1, t2], W.TIN),
                W.encode_surface(
                    [[np.array([[0.0, 0], [1, 0], [1, 1], [0, 1], [0, 0]])]],
                    W.POLYHEDRALSURFACE),
                W.encode_triangle(t1)):
        assert T.parse_wkt(T.encode_wkt(wkb)) == wkb
    assert T.encode_wkt(W.encode_triangle(t1)) == \
        "TRIANGLE ((0 0, 2 0, 0 2, 0 0))"
