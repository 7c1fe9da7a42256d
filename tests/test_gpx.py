"""GPX driver (ogr/ogrsf_frmts/gpx): waypoints/routes/tracks layers,
spec + extensions field mapping, bitwise f64 roundtrip, parallel read."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import wkb as W
from gdal_ray.sources import gpx


def _mk(kind, parts):
    return W.encode_geom(W.Geom(kind, parts))


def test_waypoints_roundtrip(tmp_path):
    x = np.array([8.53, -122.123456789012])
    y = np.array([47.37, 37.5])
    wkbs = W.encode_points(x, y)
    attrs = pa.table({"name": ["zurich", "sf"],
                      "ele": [408.25, None],
                      "station_id": [17, 23]})
    p = str(tmp_path / "w.gpx")
    gpx.write_gpx(p, wkbs, attrs)
    t = gpx.read_gpx(p, "waypoints")
    assert t["wkb"].to_pylist() == list(wkbs)  # repr floats = bitwise
    assert t["name"].to_pylist() == ["zurich", "sf"]
    assert t["ele"].to_pylist() == ["408.25", None]
    assert t["station_id"].to_pylist() == ["17", "23"]  # via <extensions>


def test_routes_and_tracks_roundtrip(tmp_path):
    rte = _mk(W.LINESTRING,
              [np.array([[0.5, 1.5], [2.25, 3.125], [4.0, 5.0]])])
    trk = _mk(W.MULTILINESTRING,
              [np.array([[0.0, 0.0], [1.0, 1.0]]),
               np.array([[5.0, 5.0], [6.5, 7.75], [8.0, 9.0]])])
    p = str(tmp_path / "rt.gpx")
    gpx.write_gpx(p, [rte, trk],
                  pa.table({"name": ["r1", "t1"], "grade": ["a", "b"]}))
    r = gpx.read_gpx(p, "routes")
    assert r["wkb"].to_pylist() == [rte]
    assert r["name"].to_pylist() == ["r1"] and r["grade"].to_pylist() == ["a"]
    t = gpx.read_gpx(p, "tracks")
    assert t["wkb"].to_pylist() == [trk]  # one trkseg per member
    assert t["name"].to_pylist() == ["t1"]


def test_polygon_rejected(tmp_path):
    poly = _mk(W.POLYGON, [[np.array([[0, 0], [1, 0], [1, 1], [0, 0]],
                                     np.float64)]])
    with pytest.raises(ValueError, match="points/lines"):
        gpx.write_gpx(str(tmp_path / "p.gpx"), [poly])


def test_parallel_read_matches_eager(tmp_path):
    n = 300
    rng = np.random.default_rng(7)
    x = rng.uniform(-180, 180, n)
    y = rng.uniform(-85, 85, n)
    wkbs = W.encode_points(x, y)
    p = str(tmp_path / "many.gpx")
    gpx.write_gpx(p, wkbs, pa.table({"name": [f"p{i}" for i in range(n)]}))
    ds = gpx.read_gpx_dataset(p, "waypoints", per_block=64)
    got = ds.take_all()
    eager = gpx.read_gpx(p, "waypoints")
    assert sorted(r["name"] for r in got) == sorted(
        eager["name"].to_pylist())
    by_name = {r["name"]: r["wkb"] for r in got}
    for nm, wkb in zip(eager["name"].to_pylist(),
                       eager["wkb"].to_pylist()):
        assert by_name[nm] == wkb


def test_identify_and_open(tmp_path):
    from gdal_ray.sources import openvector as OV

    x = np.array([1.0]); y = np.array([2.0])
    p = str(tmp_path / "one.gpx")
    gpx.write_gpx(p, W.encode_points(x, y), pa.table({"name": ["n"]}))
    assert OV.identify(p) == "GPX"
    t = OV.open_vector(p)
    assert t.num_rows == 1 and t["name"].to_pylist() == ["n"]
    # explicit empty layer request
    assert OV.open_vector(p, layer="routes").num_rows == 0
