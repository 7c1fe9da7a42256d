"""VSI container layer (/vsizip, /vsigzip, /vsitar — port/cpl_vsil_gzip.cpp,
cpl_vsil_tar.cpp): archive members resolve to readable files, sidecars come
along, openers accept vsi paths end-to-end."""

import gzip
import os
import tarfile
import zipfile

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources import vsi
from gdal_ray.sources.synthetic import rect_wkbs


def fixture_table():
    wkbs = rect_wkbs(np.array([1.0, 5.0]), np.array([2.0, 6.0]),
                     np.array([3.0, 8.0]), np.array([4.0, 9.0]))
    return pa.table({"zone_key": pa.array([10, 20], pa.int64()),
                     "zone_id": pa.array(["a", "b"], pa.string()),
                     "wkb": pa.array(list(wkbs), pa.binary())})


def test_vsizip_geojson_roundtrip(tmp_path):
    from gdal_ray.sources import geojson, openvector

    t = fixture_table()
    p = str(tmp_path / "zones.geojson")
    geojson.write_geojson(p, t["wkb"].to_pylist(),
                          t.select(["zone_key", "zone_id"]))
    arch = str(tmp_path / "zones.zip")
    with zipfile.ZipFile(arch, "w") as z:
        z.write(p, "zones.geojson")
    got = openvector.open_vector(f"/vsizip/{arch}/zones.geojson")
    assert got["wkb"].to_pylist() == t["wkb"].to_pylist()
    # single-member shorthand: no inner path needed
    got2 = openvector.open_vector(f"/vsizip/{arch}")
    assert got2["wkb"].to_pylist() == t["wkb"].to_pylist()


def test_vsizip_shapefile_sidecars(tmp_path):
    from gdal_ray.sources import openvector, shapefile

    t = fixture_table()
    stem = str(tmp_path / "zones")
    shapefile.write_shapefile(stem, t["wkb"].to_pylist(),
                              t.select(["zone_key", "zone_id"]))
    arch = str(tmp_path / "shp.zip")
    with zipfile.ZipFile(arch, "w") as z:
        for ext in (".shp", ".shx", ".dbf"):
            z.write(stem + ext, "zones" + ext)
    got = openvector.open_vector(f"/vsizip/{arch}/zones.shp")
    # shapefile normalizes ring winding: compare vertex multisets
    from gdal_ray.functions import wkb as W
    for a, b in zip(got["wkb"].to_pylist(), t["wkb"].to_pylist()):
        va = np.sort(W.decode(a).vertices(), axis=0)
        vb = np.sort(W.decode(b).vertices(), axis=0)
        np.testing.assert_array_equal(va, vb)
    # the .dbf attributes came along with the .shp
    assert got["zone_id"].to_pylist() == ["a", "b"]


def test_vsigzip_and_vsitar(tmp_path):
    from gdal_ray.sources import geojson, openvector

    t = fixture_table()
    p = str(tmp_path / "zones.geojson")
    geojson.write_geojson(p, t["wkb"].to_pylist(),
                          t.select(["zone_key", "zone_id"]))
    gz = vsi.gzip_file(p)
    got = openvector.open_vector(f"/vsigzip/{gz}")
    assert got["wkb"].to_pylist() == t["wkb"].to_pylist()

    arch = str(tmp_path / "zones.tar")
    with tarfile.open(arch, "w") as tf:
        tf.add(p, "inner/zones.geojson")
    got = openvector.open_vector(f"/vsitar/{arch}/inner/zones.geojson")
    assert got["wkb"].to_pylist() == t["wkb"].to_pylist()


def test_vsizip_raster(tmp_path):
    from gdal_ray.sources import openraster
    from gdal_ray.sources.aaigrid import write_asc

    arr = (np.arange(48, dtype=np.float64).reshape(6, 8) * 0.5)
    p = str(tmp_path / "grid.asc")
    write_asc(p, arr)
    arch = str(tmp_path / "grid.zip")
    with zipfile.ZipFile(arch, "w") as z:
        z.write(p, "grid.asc")
    ds = openraster.open_raster_tiles(f"/vsizip/{arch}/grid.asc",
                                      tile_size=8)
    tot = 0.0
    for b in ds.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            h, w = b["height"][i].as_py(), b["width"][i].as_py()
            tot += np.frombuffer(b["data"][i].as_py(),
                                 np.float32).reshape(h, w).sum()
    assert tot == arr.sum()


def test_zip_sink_dir_roundtrip(tmp_path):
    src = tmp_path / "tree" / "4" / "3"
    src.mkdir(parents=True)
    (src / "2.txt").write_bytes(b"hello")
    arch = vsi.zip_sink_dir(str(tmp_path / "tree"), str(tmp_path / "t.zip"))
    assert vsi.list_members(arch) == ["4/3/2.txt"]
    got = vsi.vsi_resolve(f"/vsizip/{arch}/4/3/2.txt")
    assert open(got, "rb").read() == b"hello"


def test_vsi_errors(tmp_path):
    arch = str(tmp_path / "two.zip")
    with zipfile.ZipFile(arch, "w") as z:
        z.writestr("a.txt", "a")
        z.writestr("b.txt", "b")
    with pytest.raises(ValueError, match="2 members"):
        vsi.vsi_resolve(f"/vsizip/{arch}")
    with pytest.raises(FileNotFoundError, match="not in"):
        vsi.vsi_resolve(f"/vsizip/{arch}/missing.txt")
    with pytest.raises(FileNotFoundError, match="no archive"):
        vsi.vsi_resolve("/vsizip/" + str(tmp_path / "nope.zip") + "/x")
    assert vsi.vsi_resolve("/plain/path.tif") == "/plain/path.tif"


def test_vsi_cache_reuse(tmp_path):
    p = tmp_path / "d.txt"
    p.write_bytes(b"data")
    with gzip.open(str(p) + ".gz", "wb") as g:
        g.write(b"data")
    a = vsi.vsi_resolve(f"/vsigzip/{p}.gz")
    b = vsi.vsi_resolve(f"/vsigzip/{p}.gz")
    assert a == b and open(a, "rb").read() == b"data"
    st0 = os.stat(a).st_mtime_ns
    vsi.vsi_resolve(f"/vsigzip/{p}.gz")
    assert os.stat(a).st_mtime_ns == st0  # second resolve did not rewrite
