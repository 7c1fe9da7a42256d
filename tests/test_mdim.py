"""Multidim (MDArray) surface tests — gcore/gdalmultidim.cpp semantics:
chunked N-D reads, axis reductions, slicing, transpose, classic-raster
export, structure report."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources import netcdf3
from gdal_ray.stages import mdim


@pytest.fixture(scope="module")
def nc3d(tmp_path_factory):
    """v(t,y,x) int32 with non-divisible edge chunks (t=5, y=50, x=70)."""
    path = str(tmp_path_factory.mktemp("mdim") / "cube.nc")
    t, y, x = np.meshgrid(np.arange(5), np.arange(50), np.arange(70),
                          indexing="ij")
    v = ((7 * t + 5 * y + 3 * x) % 97).astype(np.int32)
    netcdf3.write_netcdf3(path, {"v": (("time", "y", "x"), v)})
    return path, v


def test_hyperslab_read(nc3d):
    path, v = nc3d
    got = netcdf3.read_netcdf3_hyperslab(path, "v", [1, 10, 30], [3, 20, 25])
    assert np.array_equal(got, v[1:4, 10:30, 30:55])
    with pytest.raises(ValueError):
        netcdf3.read_netcdf3_hyperslab(path, "v", [0, 0, 60], [1, 1, 20])
    with pytest.raises(ValueError):
        netcdf3.read_netcdf3_hyperslab(path, "v", [0, 0], [1, 1])


def test_chunk_read_reassembles(ray_session, nc3d):
    path, v = nc3d
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 2, "y": 16, "x": 32})
    assert md.grid == [3, 4, 3]  # ragged edges on every dim
    assert np.array_equal(mdim.assemble(ds, md), v)


@pytest.mark.parametrize("dim,ax", [("time", 0), ("y", 1), ("x", 2)])
def test_axis_reduce_sum(ray_session, nc3d, dim, ax):
    path, v = nc3d
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 2, "y": 16, "x": 32})
    out, rmd = mdim.axis_reduce(ds, md, dim, "sum")
    assert rmd.names == [n for n in ("time", "y", "x") if n != dim]
    got = mdim.assemble(out, rmd)
    assert got.dtype == np.int64
    assert np.array_equal(got, v.sum(axis=ax, dtype=np.int64))


def test_axis_reduce_mean_min_max_count(ray_session, nc3d):
    path, v = nc3d
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 2, "y": 16, "x": 32})
    out, rmd = mdim.axis_reduce(ds, md, "y", "mean")
    assert np.allclose(mdim.assemble(out, rmd), v.mean(axis=1), atol=1e-12)
    out, rmd = mdim.axis_reduce(ds, md, "time", "min")
    got = mdim.assemble(out, rmd)
    assert got.dtype == np.int32 and np.array_equal(got, v.min(axis=0))
    out, rmd = mdim.axis_reduce(ds, md, "time", "max")
    assert np.array_equal(mdim.assemble(out, rmd), v.max(axis=0))
    out, rmd = mdim.axis_reduce(ds, md, "x", "count")
    assert np.array_equal(mdim.assemble(out, rmd),
                          np.full((5, 50), 70, dtype=np.int64))


def test_two_step_reduce_4d(ray_session, tmp_path):
    path = str(tmp_path / "cube4.nc")
    rng = np.random.default_rng(11)
    v = rng.integers(0, 100, (4, 3, 20, 24)).astype(np.int16)
    netcdf3.write_netcdf3(path, {"v": (("t", "z", "y", "x"), v)})
    ds, md = mdim.read_mdarray_chunks(
        path, "v", {"t": 2, "z": 2, "y": 8, "x": 16})
    s1, m1 = mdim.axis_reduce(ds, md, "t", "sum")
    s2, m2 = mdim.axis_reduce(s1, m1, "z", "sum")
    assert np.array_equal(mdim.assemble(s2, m2),
                          v.sum(axis=(0, 1), dtype=np.int64))


def test_slice(ray_session, nc3d):
    path, v = nc3d
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 2, "y": 16, "x": 32})
    # interior index and chunk-boundary index
    for idx in (3, 2, 0, 4):
        out, rmd = mdim.mdim_slice(ds, md, "time", idx)
        assert np.array_equal(mdim.assemble(out, rmd), v[idx])
    out, rmd = mdim.mdim_slice(ds, md, "x", 32)  # first index of chunk 1
    assert np.array_equal(mdim.assemble(out, rmd), v[:, :, 32])
    with pytest.raises(IndexError):
        mdim.mdim_slice(ds, md, "time", 5)


def test_transpose(ray_session, nc3d):
    path, v = nc3d
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 2, "y": 16, "x": 32})
    out, rmd = mdim.transpose_chunks(ds, md, ["x", "time", "y"])
    assert rmd.names == ["x", "time", "y"]
    assert rmd.sizes == [70, 5, 50]
    assert np.array_equal(mdim.assemble(out, rmd), v.transpose(2, 0, 1))
    with pytest.raises(ValueError):
        mdim.transpose_chunks(ds, md, ["x", "y"])


def test_to_raster_tiles_composes(ray_session, nc3d):
    from gdal_ray.functions import checksum as cks_f

    path, v = nc3d
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 2, "y": 16, "x": 32})
    sl, rmd = mdim.mdim_slice(ds, md, "time", 2)
    tiles = mdim.to_raster_tiles(sl, rmd).to_pandas()
    assert set(tiles.columns) >= {"z", "x", "y", "band", "width", "height",
                                  "crs", "nodata", "dtype", "data"}
    # stitch and compare against the slice
    full = np.zeros((50, 70), dtype=np.int32)
    for _, r in tiles.iterrows():
        a = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(
            r["height"], r["width"])
        full[r["y"] * 16:r["y"] * 16 + r["height"],
             r["x"] * 32:r["x"] * 32 + r["width"]] = a
    assert np.array_equal(full, v[2])
    # tile checksums are well-defined (the shared golden mechanism)
    assert all(0 <= cks_f.tile_checksum(
        np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(
            r["height"], r["width"])) < 65536 for _, r in tiles.iterrows())


def test_mdim_info(nc3d):
    path, _v = nc3d
    info = mdim.mdim_info(path).to_pandas().set_index("name")
    assert info.loc["v", "kind"] == "array"
    assert info.loc["v", "dims"] == "time,y,x"
    assert info.loc["v", "shape"] == "5,50,70"
    assert info.loc["v", "dtype"] == "int32"
    assert info.loc["v", "n_values"] == 5 * 50 * 70
    assert info.loc["time", "kind"] == "dimension"
    assert info.loc["time", "n_values"] == 5


def test_mdim_concat(ray_session, tmp_path):
    pa_, pb = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    rng = np.random.default_rng(9)
    va = rng.integers(0, 50, (8, 12, 16)).astype(np.int32)
    vb = rng.integers(0, 50, (5, 12, 16)).astype(np.int32)
    netcdf3.write_netcdf3(pa_, {"v": (("t", "y", "x"), va)})
    netcdf3.write_netcdf3(pb, {"v": (("t", "y", "x"), vb)})
    chunks = {"t": 4, "y": 6, "x": 8}
    da, ma = mdim.read_mdarray_chunks(pa_, "v", chunks)
    db, mb = mdim.read_mdarray_chunks(pb, "v", chunks)
    ds, md = mdim.mdim_concat([(da, ma), (db, mb)], "t")
    assert md.sizes == [13, 12, 16]
    full = np.concatenate([va, vb], axis=0)
    assert np.array_equal(mdim.assemble(ds, md), full)
    out, rmd = mdim.axis_reduce(ds, md, "t", "sum")
    assert np.array_equal(mdim.assemble(out, rmd),
                          full.sum(axis=0, dtype=np.int64))


def test_mdim_concat_misaligned_rejected(ray_session, tmp_path):
    pa_, pb = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    va = np.zeros((5, 8, 8), dtype=np.int32)  # 5 % 4 != 0, non-last part
    vb = np.zeros((4, 8, 8), dtype=np.int32)
    netcdf3.write_netcdf3(pa_, {"v": (("t", "y", "x"), va)})
    netcdf3.write_netcdf3(pb, {"v": (("t", "y", "x"), vb)})
    chunks = {"t": 4, "y": 8, "x": 8}
    da, ma = mdim.read_mdarray_chunks(pa_, "v", chunks)
    db, mb = mdim.read_mdarray_chunks(pb, "v", chunks)
    with pytest.raises(ValueError):
        mdim.mdim_concat([(da, ma), (db, mb)], "t")
    # last-part tail is fine the other way round
    ds, md = mdim.mdim_concat([(db, mb), (da, ma)], "t")
    assert md.sizes[0] == 9


def test_mdim_compare(ray_session, tmp_path):
    pa_, pb = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    rng = np.random.default_rng(4)
    va = rng.integers(0, 99, (3, 10, 12)).astype(np.int32)
    vb = va.copy()
    vb[1, 4, 7] += 5
    vb[2, 0, 0] -= 2
    netcdf3.write_netcdf3(pa_, {"v": (("t", "y", "x"), va)})
    netcdf3.write_netcdf3(pb, {"v": (("t", "y", "x"), vb)})
    chunks = {"t": 2, "y": 5, "x": 6}
    da, ma = mdim.read_mdarray_chunks(pa_, "v", chunks)
    db, mb = mdim.read_mdarray_chunks(pb, "v", chunks)
    out = mdim.mdim_compare(da, ma, db, mb).to_pandas().iloc[0]
    assert out["n_diff"] == 2
    assert out["max_abs_diff"] == 5.0
    assert out["sum_abs_diff"] == 7.0
    assert out["n_values"] == 3 * 10 * 12
    # identical arrays -> zero report
    da2, ma2 = mdim.read_mdarray_chunks(pa_, "v", chunks)
    db2, mb2 = mdim.read_mdarray_chunks(pa_, "v", chunks)
    out = mdim.mdim_compare(da2, ma2, db2, mb2).to_pandas().iloc[0]
    assert out["n_diff"] == 0 and out["max_abs_diff"] == 0.0


def test_mdim_reproject_flip(ray_session, tmp_path):
    path = str(tmp_path / "warpcube.nc")
    t, y, x = np.meshgrid(np.arange(3), np.arange(40), np.arange(48),
                          indexing="ij")
    v = ((3 * t + 5 * y + 2 * x) % 71).astype(np.int32)
    netcdf3.write_netcdf3(path, {"v": (("time", "y", "x"), v)})
    ds, md = mdim.read_mdarray_chunks(path, "v",
                                      {"time": 2, "y": 16, "x": 16})
    # vertical flip: dst row r samples src row H-1-r
    out, rmd = mdim.mdim_reproject(
        ds, md, src_gt=(0, 1, 0, 0, 0, 1), dst_gt=(0, 1, 0, 40, 0, -1),
        width=48, height=40, resample="nearest", tile=16)
    assert rmd.sizes == [3, 40, 48]
    got = mdim.assemble(out, rmd)
    assert np.array_equal(got, v[:, ::-1, :].astype(np.float64))
    # reduction composes over the warped cube
    red, rrmd = mdim.axis_reduce(out, rmd, "time", "sum")
    assert np.array_equal(mdim.assemble(red, rrmd),
                          v[:, ::-1, :].sum(axis=0, dtype=np.int64)
                          .astype(np.float64))


def test_mdim_reproject_identity_and_rank_guard(ray_session, tmp_path):
    path = str(tmp_path / "warpcube2.nc")
    v = np.arange(2 * 20 * 20, dtype=np.float32).reshape(2, 20, 20)
    netcdf3.write_netcdf3(path, {"v": (("t", "y", "x"), v)})
    ds, md = mdim.read_mdarray_chunks(path, "v", {"t": 1, "y": 10, "x": 10})
    out, rmd = mdim.mdim_reproject(
        ds, md, src_gt=(0, 1, 0, 0, 0, 1), dst_gt=(0, 1, 0, 0, 0, 1),
        width=20, height=20, resample="nearest", tile=10)
    assert np.array_equal(mdim.assemble(out, rmd), v.astype(np.float64))
    sl, smd = mdim.mdim_slice(ds, md, "t", 0)
    with pytest.raises(ValueError):
        mdim.mdim_reproject(sl, smd, (0, 1, 0, 0, 0, 1), (0, 1, 0, 0, 0, 1),
                            20, 20)
