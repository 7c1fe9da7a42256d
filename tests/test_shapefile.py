"""Shapefile driver (ogr/ogrsf_frmts/shape parity): .shp/.shx/.dbf round
trips, ring winding + hole regrouping, dBase C/N typing, null shapes, and
the shx-manifest Ray path."""
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import wkb as wkb_f
from gdal_ray.sources import shapefile as shp


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def test_polygon_hole_winding_roundtrip(tmp_path):
    """WKB polygon-with-hole -> shp (CW shell, CCW hole) -> WKB: area and
    ring count survive; a multipolygon regroups from flat rings."""
    base = str(tmp_path / "poly")
    w1 = wkb_f.encode_polygon([sq(0, 0, 10, 10), sq(2, 2, 4, 4)])
    w2 = wkb_f.encode_multipolygon([[sq(20, 0, 25, 5)],
                                    [sq(40, 0, 60, 20), sq(45, 5, 55, 15)]])
    shp.write_shapefile(base, [w1, w2])
    t = shp.read_shapefile(base)
    g1, g2 = wkb_f.decode(t["wkb"][0].as_py()), wkb_f.decode(t["wkb"][1].as_py())
    assert g1.kind == wkb_f.POLYGON and len(g1.parts[0]) == 2
    assert abs(wkb_f.geom_area(g1) - (100 - 4)) < 1e-9
    assert g2.kind == wkb_f.MULTIPOLYGON and len(g2.parts) == 2
    assert abs(wkb_f.geom_area(g2) - (25 + 400 - 100)) < 1e-9


def test_dbf_types_and_null_shapes(tmp_path):
    base = str(tmp_path / "attrs")
    pts = wkb_f.encode_points(np.array([1.0]), np.array([2.0]))
    attrs = pa.table({"name": pa.array(["hello", "wo rld", ""]),
                      "n": pa.array([-42, 0, 2**40], pa.int64()),
                      "f": pa.array([1.5, -0.25, 1e6])})
    shp.write_shapefile(base, [pts[0], None, None], attrs)
    t = shp.read_shapefile(base)
    assert t["wkb"][1].as_py() is None and t["wkb"][2].as_py() is None
    assert t["name"].to_pylist() == ["hello", "wo rld", ""]
    assert t["n"].to_pylist() == [-42, 0, 2**40]
    assert t["f"].to_pylist() == [1.5, -0.25, 1e6]


def test_polyline_multipoint_roundtrip(tmp_path):
    base = str(tmp_path / "lines")
    ls = wkb_f.encode_linestring(np.array([[0, 0], [3, 4], [6, 0]], float))
    shp.write_shapefile(base, [ls])
    g = wkb_f.decode(shp.read_shapefile(base)["wkb"][0].as_py())
    assert g.kind == wkb_f.LINESTRING
    assert np.allclose(g.parts[0], [[0, 0], [3, 4], [6, 0]])


def test_shx_manifest_dataset_matches_eager(tmp_path, ray_session):
    base = str(tmp_path / "ds")
    rng = np.random.default_rng(3)
    n = 300
    wkbs = wkb_f.encode_points(rng.uniform(-180, 180, n), rng.uniform(-85, 85, n))
    attrs = pa.table({"k": pa.array(np.arange(n), pa.int64())})
    shp.write_shapefile(base, list(wkbs), attrs)
    rows = shp.read_shapefile_dataset(base, records_per_block=64).take_all()
    assert len(rows) == n
    eager = shp.read_shapefile(base)
    by_fid = {r["fid"]: r for r in rows}
    for i in range(n):
        assert by_fid[i]["wkb"] == eager["wkb"][i].as_py()
        assert by_fid[i]["k"] == i


def test_rejects_malformed(tmp_path):
    bad = tmp_path / "bad.shx"
    bad.write_bytes(b"\x00" * 120)
    with pytest.raises(ValueError, match="file code"):
        shp.read_shx(str(tmp_path / "bad"))
