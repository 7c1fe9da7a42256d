"""FlatGeobuf driver (spec at flatgeobuf.org; from-scratch flatbuffers):
roundtrips of all supported geometry kinds + property types, structural
header checks, distributed part sink."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import wkb as W
from gdal_ray.sources import flatgeobuf as FGB
from gdal_ray.sources.synthetic import rect_wkbs


def all_kind_table():
    wkbs = [
        W.encode_points(np.array([1.5]), np.array([-2.25]))[0],
        W.encode_linestring(np.array([[0.0, 0.0], [3.0, 4.0], [5.0, 5.0]])),
        rect_wkbs(np.array([1.0]), np.array([2.0]), np.array([4.0]),
                  np.array([6.0]))[0],
        W.encode_polygon([
            np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
                      [0.0, 0.0]]),
            np.array([[2.0, 2.0], [2.0, 4.0], [4.0, 4.0], [4.0, 2.0],
                      [2.0, 2.0]])]),
        W.encode_multipolygon([
            [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])],
            [np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]])]]),
    ]
    return pa.table({
        "fid": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "name": pa.array(["a", None, "c", "dd", "e"], pa.string()),
        "score": pa.array([0.5, 1.25, None, 3.0, -1.0], pa.float64()),
        "wkb": pa.array(wkbs, pa.binary())})


def test_fgb_roundtrip_all_kinds(tmp_path):
    t = all_kind_table()
    path = str(tmp_path / "t.fgb")
    assert FGB.write_flatgeobuf(t, path) == 5
    back = FGB.read_flatgeobuf(path)
    assert back["fid"].to_pylist() == [1, 2, 3, 4, 5]
    assert back["name"].to_pylist() == ["a", None, "c", "dd", "e"]
    assert back["score"].to_pylist() == [0.5, 1.25, None, 3.0, -1.0]
    for i in range(5):
        canon = W.encode_geom(W.decode(t["wkb"][i].as_py()))
        assert back["wkb"][i].as_py() == canon  # bitwise through columnar xy


def test_fgb_header_structure(tmp_path):
    t = all_kind_table()
    path = str(tmp_path / "t.fgb")
    FGB.write_flatgeobuf(t, path, name="zones", crs_code=3857)
    buf = open(path, "rb").read()
    assert buf[:8] == FGB.MAGIC
    (hlen,) = struct.unpack_from("<I", buf, 8)
    header = FGB.Tbl.root(memoryview(buf)[12:12 + hlen])
    assert header.string(0) == "zones"
    assert header.scalar(8, "Q") == 5          # features_count
    assert header.scalar(9, "H", 16) == 0      # no index written
    assert header.table(10).scalar(1, "i") == 3857  # Crs.code
    cols = [(c.string(0), c.scalar(1, "B")) for c in header.vector_tables(7)]
    assert cols == [("fid", FGB.CT_LONG), ("name", FGB.CT_STRING),
                    ("score", FGB.CT_DOUBLE)]


def test_fgb_bad_magic_rejected(tmp_path):
    p = tmp_path / "junk.fgb"
    p.write_bytes(b"NOTFGB__" + b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        FGB.read_flatgeobuf(str(p))


def test_fgb_parts_sink(ray_session, tmp_path):
    import ray.data as rd

    t = all_kind_table()
    out = FGB.write_flatgeobuf_parts(
        rd.from_arrow(t), str(tmp_path / "parts")).take_all()
    assert sum(r["n_features"] for r in out) == 5
    total = pa.concat_tables(
        [FGB.read_flatgeobuf(r["path"]) for r in out])
    assert total.num_rows == 5


def test_fgb_hilbert_index_bbox_read(tmp_path):
    """Packed Hilbert R-tree: bbox reads return exactly the brute-force
    intersection set; a no-index file rejects bbox reads clearly."""
    rng = np.random.default_rng(11)
    n = 300
    x0 = rng.uniform(-100, 100, n)
    y0 = rng.uniform(-50, 50, n)
    w = rng.uniform(1, 5, n)
    h = rng.uniform(1, 5, n)
    t = pa.table({"fid": pa.array(np.arange(n), pa.int64()),
                  "wkb": pa.array(list(rect_wkbs(x0, y0, x0 + w, y0 + h)),
                                  pa.binary())})
    path = str(tmp_path / "i.fgb")
    FGB.write_flatgeobuf(t, path, index_node_size=16)
    assert sorted(FGB.read_flatgeobuf(path)["fid"].to_pylist()) == \
        list(range(n))
    for q in [(-10, -10, 10, 10), (50, 0, 60, 20), (99, 49, 100, 50)]:
        got = sorted(FGB.read_flatgeobuf(path, bbox=q)["fid"].to_pylist())
        exp = sorted(int(f) for f in range(n)
                     if not (x0[f] > q[2] or x0[f] + w[f] < q[0]
                             or y0[f] > q[3] or y0[f] + h[f] < q[1]))
        assert got == exp, q
    noidx = str(tmp_path / "n.fgb")
    FGB.write_flatgeobuf(t, noidx)
    with pytest.raises(ValueError, match="no .*index|spatial index"):
        FGB.read_flatgeobuf(noidx, bbox=(0, 0, 1, 1))
