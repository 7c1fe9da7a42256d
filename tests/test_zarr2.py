"""Zarr v2 store (gdal_ray.sources.zarr2, round 5).

Reference parity: frmts/zarr (v2 paths), validated against the public
autotest zarr fixtures (zarr-python-generated stores)."""
import glob
import os

import numpy as np
import pytest

from gdal_ray.sources import zarr2

REF = "/root/reference/autotest/gdrivers/data/zarr"


class TestWriterRoundtrip:
    @pytest.mark.parametrize("compressor", [None, {"id": "zlib", "level": 6},
                                            {"id": "gzip", "level": 4},
                                            {"id": "lzma"}])
    def test_roundtrip(self, tmp_path, compressor):
        root = str(tmp_path / "s.zarr")
        a = (np.arange(3 * 20 * 30).reshape(3, 20, 30) % 251) \
            .astype(np.int32)
        zarr2.write_zarr(root, {"v": (("t", "y", "x"), a)},
                         chunks={"v": (2, 8, 8)}, compressor=compressor)
        arrs = zarr2.open_zarr(root)
        za = arrs["v"]
        assert (za.read() == a).all()
        assert za.dims == ["t", "y", "x"]

    def test_hyperslab(self, tmp_path):
        root = str(tmp_path / "h.zarr")
        a = np.arange(40 * 50, dtype=np.float64).reshape(40, 50)
        zarr2.write_zarr(root, {"v": (("y", "x"), a)},
                         chunks={"v": (16, 16)})
        got = zarr2.read_hyperslab(root, "v", (5, 7), (20, 33))
        assert (got == a[5:25, 7:40]).all()

    def test_missing_chunks_fill(self, tmp_path):
        root = str(tmp_path / "f.zarr")
        a = np.ones((8, 8), np.int16)
        zarr2.write_zarr(root, {"v": (("y", "x"), a)}, chunks={"v": (4, 4)})
        os.unlink(os.path.join(root, "v", "1.1"))
        got = zarr2.open_zarr(root)["v"].read()
        assert got[:4, :4].all() and got[4:, 4:].sum() == 0

    def test_consolidated(self, tmp_path):
        root = str(tmp_path / "c.zarr")
        zarr2.write_zarr(root, {"v": (("y",), np.arange(5, dtype="i4"))})
        assert os.path.exists(os.path.join(root, ".zmetadata"))
        assert "v" in zarr2.open_zarr(root)

    def test_is_zarr(self, tmp_path):
        root = str(tmp_path / "z.zarr")
        zarr2.write_zarr(root, {"v": (("y",), np.zeros(3, "f4"))})
        assert zarr2.is_zarr(root)
        assert not zarr2.is_zarr(str(tmp_path))


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference fixtures not present")
class TestReferenceFixtures:
    def test_sweep(self):
        ok = ni = 0
        for p in sorted(glob.glob(f"{REF}/*.zarr")):
            try:
                arrs = zarr2.open_zarr(p)
                for n, za in arrs.items():
                    za.read()
                ok += 1 if arrs else 0
            except NotImplementedError:
                ni += 1  # blosc/zstd/lz4/imagecodecs/compound: no codec here
        assert ok >= 30, ok

    def test_delta_filter(self):
        (za,) = zarr2.open_zarr(f"{REF}/delta_filter_i4.zarr").values()
        assert list(za.read()) == list(range(10))

    def test_endianness(self):
        (be,) = zarr2.open_zarr(f"{REF}/f2_be.zarr").values()
        (le,) = zarr2.open_zarr(f"{REF}/f2_le.zarr").values()
        assert np.array_equal(np.asarray(be.read(), "f8"),
                              np.asarray(le.read(), "f8"), equal_nan=True)

    def test_order_f(self):
        p = f"{REF}/order_f_u1.zarr"
        if not os.path.isdir(p):
            pytest.skip("fixture absent")
        (za,) = zarr2.open_zarr(p).values()
        a = za.read()
        # generate_test_files.py writes arange in F order
        assert a.flatten(order="C")[1] == a[0, 1]


class TestMdimIntegration:
    def test_zarr_through_mdim(self, ray_session, tmp_path):
        from gdal_ray.stages import mdim

        root = str(tmp_path / "m.zarr")
        v = ((np.arange(2 * 32 * 32).reshape(2, 32, 32)) % 53) \
            .astype(np.int32)
        zarr2.write_zarr(root, {"v": (("time", "y", "x"), v)},
                         chunks={"v": (1, 16, 16)})
        ds, md = mdim.read_mdarray_chunks(
            root, "v", {"time": 1, "y": 16, "x": 16})
        red, rmd = mdim.axis_reduce(ds, md, "time", "sum")
        assert (mdim.assemble(red, rmd) == v.sum(axis=0)).all()
