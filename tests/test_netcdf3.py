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


class TestRecordDimension:
    """Spec record layout: unlimited dim, interleaved per-record slabs."""

    def test_sole_record_var_roundtrip(self, tmp_path):
        from gdal_ray.sources import netcdf3
        path = str(tmp_path / "rec1.nc")
        v = np.arange(5 * 7 * 9, dtype=np.int32).reshape(5, 7, 9)
        netcdf3.write_netcdf3(path, {"v": (("time", "y", "x"), v)},
                              record_dim="time")
        dims, variables, _g = netcdf3.read_netcdf3(path)
        assert dims["time"] == 5
        got = variables["v"][1]
        assert np.array_equal(got, v)

    def test_sole_record_var_odd_slab_unpadded(self, tmp_path):
        # int16 x 3 elements = 6 bytes/record: the sole-var special case
        # stores records UNPADDED (stride 6, not 8)
        from gdal_ray.sources import netcdf3
        path = str(tmp_path / "rec_odd.nc")
        v = np.arange(4 * 3, dtype=np.int16).reshape(4, 3)
        netcdf3.write_netcdf3(path, {"v": (("t", "x"), v)}, record_dim="t")
        _d, meta, _g = netcdf3.read_header(path)
        assert meta["v"][5] == 6  # stride == raw per-record bytes
        _dims, variables, _g2 = netcdf3.read_netcdf3(path)
        assert np.array_equal(variables["v"][1], v)

    def test_multi_record_vars_interleaved(self, tmp_path):
        from gdal_ray.sources import netcdf3
        path = str(tmp_path / "rec2.nc")
        a = np.arange(6 * 5, dtype=np.int16).reshape(6, 5)      # 10B -> pad 12
        b = (np.arange(6 * 4, dtype=np.float32) / 3).reshape(6, 4)
        static = np.arange(8, dtype=np.float64)
        netcdf3.write_netcdf3(
            path, {"a": (("t", "x"), a), "zfix": (("k",), static),
                   "b": (("t", "w"), b)}, record_dim="t")
        _d, meta, _g = netcdf3.read_header(path)
        assert meta["a"][5] == meta["b"][5] == 12 + 16  # shared stride
        assert meta["zfix"][5] is None
        _dims, variables, _g2 = netcdf3.read_netcdf3(path)
        assert np.array_equal(variables["a"][1], a)
        assert np.array_equal(variables["b"][1], b)
        assert np.array_equal(variables["zfix"][1], static)

    def test_record_hyperslab_and_window(self, tmp_path):
        from gdal_ray.sources import netcdf3
        path = str(tmp_path / "rec3.nc")
        v = np.arange(7 * 10 * 12, dtype=np.float32).reshape(7, 10, 12)
        w2d = np.arange(7 * 11, dtype=np.int32).reshape(7, 11)
        netcdf3.write_netcdf3(
            path, {"v": (("t", "y", "x"), v), "m": (("t", "c"), w2d)},
            record_dim="t")
        got = netcdf3.read_netcdf3_hyperslab(path, "v", [2, 3, 5], [4, 6, 7])
        assert np.array_equal(got, v[2:6, 3:9, 5:12])
        win = netcdf3.read_netcdf3_window(path, "m", 1, 5, 2, 9)
        assert np.array_equal(win, w2d[1:5, 2:9])

    def test_record_dim_must_be_first(self, tmp_path):
        from gdal_ray.sources import netcdf3
        import pytest as _pt
        path = str(tmp_path / "bad.nc")
        v = np.zeros((3, 4), dtype=np.int32)
        with _pt.raises(ValueError):
            netcdf3.write_netcdf3(path, {"v": (("y", "t"), v)},
                                  record_dim="t")

    def test_mdim_chunks_over_record_file(self, ray_session, tmp_path):
        from gdal_ray.sources import netcdf3
        from gdal_ray.stages import mdim
        path = str(tmp_path / "rec4.nc")
        t, y, x = np.meshgrid(np.arange(6), np.arange(20), np.arange(24),
                              indexing="ij")
        v = ((3 * t + 2 * y + x) % 53).astype(np.int32)
        netcdf3.write_netcdf3(path, {"v": (("time", "y", "x"), v)},
                              record_dim="time")
        ds, md = mdim.read_mdarray_chunks(path, "v",
                                          {"time": 4, "y": 8, "x": 16})
        out, rmd = mdim.axis_reduce(ds, md, "time", "sum")
        assert np.array_equal(mdim.assemble(out, rmd),
                              v.sum(axis=0, dtype=np.int64))
