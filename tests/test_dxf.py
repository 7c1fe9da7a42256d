"""DXF driver (ogr/ogrsf_frmts/dxf): entity translation table, HATCH
polygons with holes, legacy POLYLINE, parallel range reads."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import wkb as W
from gdal_ray.sources import dxf


def _mk(kind, parts):
    return W.encode_geom(W.Geom(kind, parts))


def test_point_line_polyline_roundtrip(tmp_path):
    pt = W.encode_points(np.array([1.5]), np.array([2.25]))[0]
    ln = _mk(W.LINESTRING, [np.array([[0.0, 0.0], [3.5, 4.5]])])
    pl = _mk(W.LINESTRING, [np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 1.0]])])
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                     [0.0, 0.0]])
    closed = _mk(W.LINESTRING, [ring])
    p = str(tmp_path / "e.dxf")
    dxf.write_dxf(p, [pt, ln, pl, closed],
                  pa.table({"Layer": ["a", "b", "c", "d"]}))
    t = dxf.read_dxf(p)
    assert t.num_rows == 4
    assert t["Layer"].to_pylist() == ["a", "b", "c", "d"]
    assert t["wkb"].to_pylist() == [pt, ln, pl, closed]
    # handles are sequential hex
    assert t["EntityHandle"].to_pylist()[0] == "100"


def test_hatch_polygon_with_hole(tmp_path):
    shell = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
                      [0.0, 0.0]])
    hole = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0],
                     [2.0, 2.0]])
    poly = _mk(W.POLYGON, [[shell, hole]])
    p = str(tmp_path / "h.dxf")
    dxf.write_dxf(p, [poly])
    t = dxf.read_dxf(p)
    assert t.num_rows == 1
    g = W.decode(t["wkb"][0].as_py())
    assert g.kind == W.POLYGON and len(g.parts[0]) == 2
    np.testing.assert_array_equal(g.parts[0][0], shell)
    np.testing.assert_array_equal(g.parts[0][1], hole)


def test_text_circle_arc(tmp_path):
    pt = W.encode_points(np.array([5.0]), np.array([6.0]))[0]
    p = str(tmp_path / "t.dxf")
    dxf.write_dxf(p, [pt], pa.table({"Text": ["hello"]}))
    # hand-rolled CIRCLE + ARC entities appended
    body = open(p).read().replace(
        "0\nENDSEC\n0\nEOF\n",
        "0\nCIRCLE\n5\n200\n8\n0\n10\n1.0\n20\n2.0\n40\n3.0\n"
        "0\nARC\n5\n201\n8\n0\n10\n0.0\n20\n0.0\n40\n2.0\n"
        "50\n0.0\n51\n90.0\n"
        "0\nENDSEC\n0\nEOF\n")
    open(p, "w").write(body)
    t = dxf.read_dxf(p)
    assert t.num_rows == 3
    assert t["Text"].to_pylist()[0] == "hello"
    c = W.decode(t["wkb"][1].as_py(), allow_zm=True)
    assert c.kind == W.CIRCULARSTRING if hasattr(W, "CIRCULARSTRING") else True
    # arc endpoints: (r,0) -> (0,r)
    a = W.decode(t["wkb"][2].as_py(), allow_zm=True)
    v = a.parts[0] if a.parts else None
    np.testing.assert_allclose(v[0], [2.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(v[-1], [0.0, 2.0], atol=1e-12)


def test_legacy_polyline_seqend(tmp_path):
    raw = ("0\nSECTION\n2\nENTITIES\n"
           "0\nPOLYLINE\n5\nA1\n8\nold\n70\n0\n"
           "0\nVERTEX\n8\nold\n10\n0.0\n20\n0.0\n"
           "0\nVERTEX\n8\nold\n10\n1.0\n20\n1.0\n"
           "0\nVERTEX\n8\nold\n10\n2.0\n20\n0.5\n"
           "0\nSEQEND\n"
           "0\nENDSEC\n0\nEOF\n")
    p = str(tmp_path / "l.dxf")
    open(p, "w").write(raw)
    t = dxf.read_dxf(p)
    assert t.num_rows == 1
    g = W.decode(t["wkb"][0].as_py())
    np.testing.assert_array_equal(
        g.parts[0], np.array([[0, 0], [1, 1], [2, 0.5]], np.float64))
    assert t["Layer"].to_pylist() == ["old"]


def test_parallel_read_matches_eager(tmp_path):
    n = 200
    rng = np.random.default_rng(3)
    wkbs = W.encode_points(rng.uniform(-10, 10, n), rng.uniform(-10, 10, n))
    p = str(tmp_path / "many.dxf")
    dxf.write_dxf(p, wkbs)
    eager = dxf.read_dxf(p)
    got = dxf.read_dxf_dataset(p, per_block=32).take_all()
    assert len(got) == n
    by_handle = {r["EntityHandle"]: r["wkb"] for r in got}
    for h, wkb in zip(eager["EntityHandle"].to_pylist(),
                      eager["wkb"].to_pylist()):
        assert by_handle[h] == wkb


def test_identify_and_open(tmp_path):
    from gdal_ray.sources import openvector as OV

    p = str(tmp_path / "z.dxf")
    dxf.write_dxf(p, W.encode_points(np.array([1.0]), np.array([2.0])))
    assert OV.identify(p) == "DXF"
    assert OV.open_vector(p).num_rows == 1
