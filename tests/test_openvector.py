"""GDALOpen vector identify loop (gcore/gdaldataset.cpp GDAL_OF_VECTOR):
every in-repo vector driver's files probe to the right driver and open to
the standard (wkb + attrs) rows."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import wkb as W
from gdal_ray.sources import openvector as OV
from gdal_ray.sources.synthetic import rect_wkbs


def fixture_table():
    wkbs = rect_wkbs(np.array([1.0, 5.0]), np.array([2.0, 6.0]),
                     np.array([3.0, 8.0]), np.array([4.0, 9.0]))
    return pa.table({"zone_key": pa.array([10, 20], pa.int64()),
                     "zone_id": pa.array(["a", "b"], pa.string()),
                     "wkb": pa.array(list(wkbs), pa.binary())})


def test_identify_and_open_all_vector_drivers(tmp_path):
    from gdal_ray.sources import (flatgeobuf, geojson, gml, gpkg, kml,
                                  shapefile)

    t = fixture_table()
    attrs = t.select(["zone_key", "zone_id"])
    wkbs = t["wkb"].to_pylist()

    made = {}
    p = str(tmp_path / "z.gpkg")
    gpkg.write_gpkg(p, "zones", wkbs, attrs)
    made[p] = "GPKG"
    p = str(tmp_path / "z.fgb")
    flatgeobuf.write_flatgeobuf(t, p)
    made[p] = "FlatGeobuf"
    p = str(tmp_path / "z.geojson")
    geojson.write_geojson(p, wkbs, attrs)
    made[p] = "GeoJSON"
    p = str(tmp_path / "z.gml")
    gml.write_gml(p, wkbs, attrs)
    made[p] = "GML"
    p = str(tmp_path / "z.kml")
    kml.write_kml(p, wkbs, attrs)
    made[p] = "KML"
    shapefile.write_shapefile(str(tmp_path / "z"), wkbs, attrs)
    made[str(tmp_path / "z.shp")] = "ESRI Shapefile"

    for path, want in made.items():
        assert OV.identify(path) == want, path
        out = OV.open_vector(path)
        assert out.num_rows == 2, path
        g = W.decode(out["wkb"][0].as_py())
        assert g.kind == W.POLYGON, path


def test_identify_rejects_junk(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00\x01\x02\x03" * 16)
    with pytest.raises(ValueError, match="no vector driver"):
        OV.identify(str(p))
