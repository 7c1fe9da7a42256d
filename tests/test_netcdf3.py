"""NetCDF classic (CDF-1) driver: typed variables, attributes, validation."""

import numpy as np
import pytest


def test_netcdf3_roundtrip(tmp_path):
    from gdal_ray.sources.netcdf3 import read_netcdf3, write_netcdf3

    rng = np.random.default_rng(7)
    t = (rng.standard_normal((12, 18)) * 5).astype(np.float32)
    elev = rng.integers(-100, 4000, (12, 18)).astype(np.int16)
    counts = rng.integers(0, 1000, (12, 18)).astype(np.int32)
    dbl = rng.standard_normal((12, 18))
    lat = np.linspace(-10.0, 10.0, 12)
    path = str(tmp_path / "grid.nc")
    write_netcdf3(
        path,
        {"temp": (("y", "x"), t), "elev": (("y", "x"), elev),
         "counts": (("y", "x"), counts), "dbl": (("y", "x"), dbl),
         "lat": (("y",), lat)},
        global_attrs={"title": "test", "version": np.int32(3)},
        var_attrs={"temp": {"units": "degC",
                            "scale_factor": np.float64(0.1)}})
    dims, vs, g = read_netcdf3(path)
    assert dims == {"y": 12, "x": 18}
    assert g["title"] == "test" and g["version"].tolist() == [3]
    assert vs["temp"][0] == ("y", "x")
    assert np.array_equal(vs["temp"][1], t)
    assert vs["temp"][2]["units"] == "degC"
    assert np.array_equal(vs["elev"][1], elev) and vs["elev"][1].dtype == np.int16
    assert np.array_equal(vs["counts"][1], counts)
    assert np.array_equal(vs["dbl"][1], dbl)
    assert np.array_equal(vs["lat"][1], lat)
    # values are genuinely big-endian on disk (spec, not native dump)
    raw = open(path, "rb").read()
    assert raw[:4] == b"CDF\x01"
    with pytest.raises(ValueError, match="NetCDF classic"):
        read_netcdf3(__file__)
    with pytest.raises(ValueError, match="inconsistent"):
        write_netcdf3(str(tmp_path / "bad.nc"),
                      {"a": (("y",), np.zeros(3, np.int32)),
                       "b": (("y",), np.zeros(4, np.int32))})


def test_netcdf3_tiles(tmp_path, ray_session):
    from gdal_ray.sources.netcdf3 import read_netcdf3_tiles, write_netcdf3

    gy, gx = np.mgrid[0:100, 0:70]
    arr = (3 * gx + gy).astype(np.float32)
    path = str(tmp_path / "t.nc")
    write_netcdf3(path, {"v": (("y", "x"), arr)})
    rows = read_netcdf3_tiles(path, "v", tile_size=64).take_all()
    assert len(rows) == 2 * 2
    r = next(r for r in rows if (r["x"], r["y"]) == (1, 1))
    sub = np.frombuffer(r["data"], np.float32).reshape(r["height"], r["width"])
    assert sub.shape == (36, 6) and sub[0, 0] == 3 * 64 + 64
    with pytest.raises(KeyError):
        read_netcdf3_tiles(path, "nope")


def test_netcdf3_cdf2_and_windows(tmp_path):
    from gdal_ray.sources.netcdf3 import (read_header, read_netcdf3,
                                          read_netcdf3_window, write_netcdf3)

    gy, gx = np.mgrid[0:50, 0:80]
    arr = (gx * 7 + gy).astype(np.int32)
    p2 = str(tmp_path / "v2.nc")
    write_netcdf3(p2, {"v": (("y", "x"), arr)}, version=2)
    assert open(p2, "rb").read(4) == b"CDF\x02"
    _d, vs, _g = read_netcdf3(p2)
    assert np.array_equal(vs["v"][1], arr)
    # header-only parse never touches the data block
    dims, meta, _ = read_header(p2)
    assert dims == {"y": 50, "x": 80} and meta["v"][1] == (50, 80)
    # windowed read == the corresponding slice
    win = read_netcdf3_window(p2, "v", 10, 30, 5, 25)
    assert np.array_equal(win, arr[10:30, 5:25])
    with pytest.raises(ValueError, match="version"):
        write_netcdf3(str(tmp_path / "bad.nc"), {"v": (("y", "x"), arr)},
                      version=3)
