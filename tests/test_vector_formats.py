"""GeoJSON(-Seq) and GeoPackage drivers: bitwise WKB round trips, property
typing, null geometries, spec metadata, and the parallel read paths."""
import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import wkb as wkb_f
from gdal_ray.sources import geojson as gj
from gdal_ray.sources import gpkg


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def all_kinds():
    w_mpt = struct.pack("<BII", 1, wkb_f.MULTIPOINT, 2) + b"".join(
        struct.pack("<BI2d", 1, wkb_f.POINT, x, y) for x, y in [(1, 2), (3.5, -4)])
    return [
        wkb_f.encode_points(np.array([1.125]), np.array([-2.0625]))[0],
        wkb_f.encode_linestring(np.array([[0, 0], [5.5, 5.5], [7, -1]], float)),
        wkb_f.encode_polygon([sq(0, 0, 10, 10), sq(2, 2, 4, 4)]),
        wkb_f.encode_multipolygon([[sq(20, 0, 25, 5)], [sq(40, 0, 60, 20)]]),
        w_mpt,
        None,
    ]


def test_geojson_all_kinds_bitwise(tmp_path):
    wkbs = all_kinds()
    attrs = pa.table({"i": pa.array(range(6), pa.int64()),
                      "t": pa.array(list("abcdef"))})
    p = str(tmp_path / "fc.geojson")
    gj.write_geojson(p, wkbs, attrs)
    t = gj.read_geojson(p)
    assert [t["wkb"][i].as_py() for i in range(6)] == wkbs
    assert t["t"].to_pylist() == list("abcdef")
    p2 = str(tmp_path / "fc.geojsonl")
    gj.write_geojson(p2, wkbs, attrs, seq=True)
    t2 = gj.read_geojson(p2)
    assert [t2["wkb"][i].as_py() for i in range(6)] == wkbs


def test_geojsonseq_dataset_parallel(tmp_path, ray_session):
    n = 500
    wkbs = wkb_f.encode_points(np.arange(n, dtype=float),
                               np.arange(n, dtype=float) * 0.5)
    p = str(tmp_path / "pts.geojsonl")
    gj.write_geojson(p, list(wkbs),
                     pa.table({"k": pa.array(range(n), pa.int64())}), seq=True)
    rows = gj.read_geojsonseq_dataset(p).take_all()
    assert sorted(r["k"] for r in rows) == list(range(n))
    by_k = {r["k"]: r["wkb"] for r in rows}
    assert all(by_k[i] == wkbs[i] for i in range(n))


def test_gpkg_roundtrip_and_spec_tables(tmp_path):
    wkbs = all_kinds()
    attrs = pa.table({"name": pa.array(["x"] * 6),
                      "v": pa.array([0.5] * 6)})
    p = str(tmp_path / "t.gpkg")
    gpkg.write_gpkg(p, "layer1", wkbs, attrs)
    assert gpkg.list_layers(p) == ["layer1"]
    t = gpkg.read_gpkg(p, "layer1")
    assert [t["wkb"][i].as_py() for i in range(6)] == wkbs
    con = sqlite3.connect(p)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == 0x47504B47
    rows = con.execute("SELECT table_name, data_type, srs_id FROM gpkg_contents").fetchall()
    assert rows == [("layer1", "features", 4326)]
    assert con.execute("SELECT count(*) FROM gpkg_spatial_ref_sys WHERE srs_id = 4326").fetchone()[0] == 1
    con.close()


def test_gpkg_gp_header_envelope_variants():
    w = wkb_f.encode_points(np.array([1.0]), np.array([2.0]))[0]
    assert gpkg.gp_unwrap(gpkg.gp_wrap(w)) == w
    # synthetic blob with an XY envelope (indicator 1 -> 4 doubles)
    blob = b"GP" + bytes([0, 0x03]) + struct.pack("<i", 4326) + \
        struct.pack("<4d", 0, 0, 0, 0) + w
    assert gpkg.gp_unwrap(blob) == w
    with pytest.raises(ValueError, match="GeoPackage"):
        gpkg.gp_unwrap(b"XX" + b"\x00" * 10)


def test_wkt_bitwise_roundtrip_all_kinds():
    from gdal_ray.functions import wkt as wkt_f

    for w in all_kinds():
        if w is None:
            continue
        assert wkt_f.parse_wkt(wkt_f.encode_wkt(w)) == w
    assert wkt_f.parse_wkt("POINT EMPTY") is None
    assert wkt_f.parse_wkt("MULTIPOINT ((1 2), (3 4))") == \
        wkt_f.parse_wkt("MULTIPOINT (1 2, 3 4)")
    # curve + surface WKT parse since round 4 (test_geomops covers the
    # full round trips); TIN joined the grammar in session 8
    tin = wkt_f.parse_wkt("TIN (((0 0, 1 0, 0 1, 0 0)))")
    assert wkt_f.parse_wkt(wkt_f.encode_wkt(tin)) == tin
    with pytest.raises(ValueError, match="unsupported WKT"):
        wkt_f.parse_wkt("NOTAGEOMETRY (0 0)")


def test_csv_layer_distributed_roundtrip(tmp_path, ray_session):
    import ray.data as rd

    from gdal_ray.sources import csvgeo

    n = 200
    wkbs = wkb_f.encode_points(np.arange(n) + 0.125, np.arange(n) * -0.5)
    tbl = pa.table({"k": pa.array(range(n), pa.int64()),
                    "wkb": pa.array(list(wkbs), pa.binary()),
                    "label": pa.array([f"x,{i}" for i in range(n)])})
    out = str(tmp_path / "csv_layer")
    csvgeo.write_csv_layer(rd.from_arrow(tbl), out)
    rows = csvgeo.read_csv_layer(out).take_all()
    assert len(rows) == n
    by_k = {r["k"]: r for r in rows}
    for i in range(n):
        assert by_k[i]["wkb"] == wkbs[i]
        assert by_k[i]["label"] == f"x,{i}"  # comma survives quoting


def test_kml_roundtrip_geometry_kinds(tmp_path):
    """KML writer/reader: point, line, polygon-with-hole, multipolygon all
    roundtrip bitwise; XML-special attribute values escape correctly."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.sources import kml as kml_drv

    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]])
    wkbs = [
        wkb_f.encode_points(np.array([1.25]), np.array([-2.5]))[0],
        wkb_f.encode_linestring(np.array([[0.1, 0.2], [3.4, 5.6], [7.8, 9.0]])),
        wkb_f.encode_polygon([sq, hole]),
        wkb_f.encode_multipolygon([[sq], [sq + 10.0]]),
    ]
    attrs = pa.table({"name": ["a<b", 'q"uote', "amp&ersand", "plain"],
                      "k": [1, 2, 3, 4]})
    path = str(tmp_path / "t.kml")
    kml_drv.write_kml(path, wkbs, attrs)
    back = kml_drv.read_kml(path)
    assert back.num_rows == 4
    assert back["name"].to_pylist() == ["a<b", 'q"uote', "amp&ersand", "plain"]
    assert back["k"].to_pylist() == ["1", "2", "3", "4"]  # KML attrs untyped
    for orig, got in zip(wkbs, back["wkb"].to_pylist()):
        a, b = wkb_f.decode(orig), wkb_f.decode(got)
        assert a.kind == b.kind
        assert np.array_equal(a.vertices(), b.vertices())


def test_kml_range_scan_matches_eager(tmp_path, ray_session):
    """Parallel byte-range read == eager full parse, across block splits."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.sources import kml as kml_drv

    n = 37
    wkbs = [wkb_f.encode_points(np.array([float(i)]), np.array([float(-i)]))[0]
            for i in range(n)]
    path = str(tmp_path / "many.kml")
    kml_drv.write_kml(path, wkbs, pa.table({"i": list(range(n))}))
    assert len(kml_drv.placemark_ranges(path)) == n
    rows = kml_drv.read_kml_dataset(path, per_block=5).take_all()
    got = sorted(int(r["i"]) for r in rows)
    assert got == list(range(n))
    by_i = {int(r["i"]): r["wkb"] for r in rows}
    for i in range(n):
        assert np.array_equal(wkb_f.decode(by_i[i]).vertices(),
                              np.array([[float(i), float(-i)]]))


def test_gml_roundtrip_geometry_kinds(tmp_path):
    """GML writer/reader: point, line, polygon-with-hole, multipolygon
    roundtrip bitwise; attributes come back as strings."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.sources import gml as gml_drv

    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]])
    wkbs = [
        wkb_f.encode_points(np.array([1.25]), np.array([-2.5]))[0],
        wkb_f.encode_linestring(np.array([[0.1, 0.2], [3.4, 5.6]])),
        wkb_f.encode_polygon([sq, hole]),
        wkb_f.encode_multipolygon([[sq], [sq + 7.0]]),
    ]
    path = str(tmp_path / "t.gml")
    gml_drv.write_gml(path, wkbs, pa.table({"nm": ["a<b", "x", "y", "z&w"]}))
    back = gml_drv.read_gml(path)
    assert back["nm"].to_pylist() == ["a<b", "x", "y", "z&w"]
    for orig, got in zip(wkbs, back["wkb"].to_pylist()):
        a, b = wkb_f.decode(orig), wkb_f.decode(got)
        assert a.kind == b.kind
        assert np.array_equal(a.vertices(), b.vertices())


def test_gml_range_scan_matches_eager(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkb_f
    from gdal_ray.sources import gml as gml_drv

    n = 23
    wkbs = [wkb_f.encode_points(np.array([float(i)]), np.array([float(i + 1)]))[0]
            for i in range(n)]
    path = str(tmp_path / "many.gml")
    gml_drv.write_gml(path, wkbs, pa.table({"i": list(range(n))}))
    assert len(gml_drv.feature_ranges(path)) == n
    rows = gml_drv.read_gml_dataset(path, per_block=4).take_all()
    assert sorted(int(r["i"]) for r in rows) == list(range(n))


def test_mvt_codec_roundtrip():
    """Protobuf tile codec: ids, cursor-delta geometry, shared key/value
    tables with string / negative-int / bool values all roundtrip."""
    import numpy as np

    from gdal_ray.sources import mvt

    ids = np.array([7, 3, 12], dtype=np.int64)
    px = np.array([0, 4095, 2048], dtype=np.int64)
    py = np.array([4095, 0, 17], dtype=np.int64)
    attrs = {
        "n": np.array([-5, 0, 123456789], dtype=np.int64),
        "s": np.array(["alpha", "beta", "alpha"]),  # dedup in value table
        "b": np.array([True, False, True]),
    }
    blob = mvt.encode_point_layer("docs", ids, px, py, attrs)
    (layer,) = mvt.parse_tile(blob)
    assert layer["version"] == 2 and layer["extent"] == 4096
    assert layer["name"] == "docs"
    # value table dedup: 3 n-values + 2 strings + 2 bools
    assert len(layer["values"]) == 7
    assert len(layer["features"]) == 3
    for j, f in enumerate(layer["features"]):
        assert f["id"] == ids[j] and f["type"] == mvt.POINT
        assert f["points"] == [(px[j], py[j])]
        assert f["attrs"]["n"] == attrs["n"][j]
        assert f["attrs"]["s"] == attrs["s"][j]
        assert f["attrs"]["b"] == bool(attrs["b"][j])


def test_mvt_tiles_deterministic(ray_session):
    """Same input -> byte-identical tile blobs (feature order pinned by id)."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.sources import mvt

    t = pa.table({
        "doc_id": pa.array([5, 1, 9], pa.int64()),
        "n_chars": pa.array([10, 20, 30], pa.int64()),
    })
    a = {(r["tx"], r["ty"]): r["mvt"] for r in
         mvt.mvt_point_tiles(rd.from_arrow(t), zoom=4).take_all()}
    b = {(r["tx"], r["ty"]): r["mvt"] for r in
         mvt.mvt_point_tiles(rd.from_arrow(t), zoom=4).take_all()}
    assert a == b and len(a) >= 1


def test_arrow_ipc_parallel_read_roundtrip(ray_session, tmp_path):
    """IPC write with a batch cap, footer-manifest parallel read: every row
    returns exactly once with its batch index."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.sources import arrowipc

    t = pa.table({"k": pa.array(np.arange(1000, dtype=np.int64)),
                  "v": pa.array(np.arange(1000, dtype=np.float64) / 8.0)})
    path = str(tmp_path / "t.arrow")
    nb = arrowipc.write_ipc(t, path, batch_rows=128)
    assert nb == 8  # ceil(1000/128)
    got = arrowipc.read_ipc(path, with_batch_idx=True).to_pandas()
    assert len(got) == 1000
    assert sorted(got["k"]) == list(range(1000))
    # batch index = sequential split
    assert (got.sort_values("k")["batch_idx"].to_numpy()
            == np.arange(1000) // 128).all()


def test_geoparquet_metadata_and_resume(tmp_path, ray_session):
    """GeoParquet (OGC 1.1): per-file 'geo' footers with bbox/types, the
    O(files) metadata fold, value roundtrip, and file-level resume."""
    import json
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from gdal_ray.functions import wkb as wkbf
    from gdal_ray.sources import geoparquet as gpq

    def rect(x0, y0, x1, y1):
        return wkbf.encode_polygon([np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])

    t = pa.table({"fid": pa.array([1, 2], pa.int64()),
                  "wkb": pa.array([rect(0, 0, 2, 1), rect(5, -3, 7, 4)])})
    root = str(tmp_path / "gp")
    list(gpq.write_geoparquet(rd.from_arrow(t), root,
                              crs="EPSG:4326").iter_batches())
    files = [f for f in os.listdir(root) if f.endswith(".parquet")]
    assert files
    geo = json.loads(pq.read_schema(
        os.path.join(root, files[0])).metadata[b"geo"])
    assert geo["version"] == gpq.GEO_VERSION
    assert geo["primary_column"] == "wkb"
    assert geo["columns"]["wkb"]["encoding"] == "WKB"
    meta = gpq.read_geo_metadata(root)
    assert meta["bbox"] == [0.0, -3.0, 7.0, 4.0]
    assert meta["geometry_types"] == ["Polygon"]
    assert meta["crs"] == "EPSG:4326"
    back = gpq.read_geoparquet(root).take_all()
    assert sorted(r["fid"] for r in back) == [1, 2]
    # resume: re-running the sink skips existing parts (same bytes)
    sizes = {f: os.path.getsize(os.path.join(root, f)) for f in files}
    list(gpq.write_geoparquet(rd.from_arrow(t), root).iter_batches())
    assert {f: os.path.getsize(os.path.join(root, f))
            for f in os.listdir(root) if f.endswith(".parquet")} == sizes
    # non-geoparquet input rejected loudly
    pq.write_table(pa.table({"a": [1]}), str(tmp_path / "gp" / "plain.parquet"))
    import pytest as _pt
    with _pt.raises(ValueError, match="geo"):
        gpq.read_geo_metadata(root)
