"""GRIB2 reader (gdal_ray.sources.grib2, round 5).

Reference parity: frmts/grib (degrib); validated against the public
autotest grib fixtures (NWP-toolchain-produced files)."""
import glob
import os

import numpy as np
import pytest

from gdal_ray.sources import grib2

REF = "/root/reference/autotest/gdrivers/data/grib"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference fixtures not present")


class TestDecode:
    def test_simple_packing_constant(self):
        d = grib2.read_grib2(f"{REF}/one_one.grib2")
        assert d["values"].shape == (1, 1)
        assert abs(float(d["values"][0, 0]) - 1.78) < 0.01

    def test_ieee_single_vs_double(self):
        a = grib2.read_grib2(f"{REF}/ieee754_single.grb2")["values"]
        b = grib2.read_grib2(f"{REF}/ieee754_double.grb2")["values"]
        assert a.shape == b.shape == (18, 22)
        assert np.allclose(a, b, rtol=1e-6)

    def test_complex_packing_nodata(self):
        # the fixture's name states its content: one value + nodata
        d = grib2.read_grib2(f"{REF}/one_value_and_nodata_points.grb2")
        v = d["values"]
        finite = v[np.isfinite(v)]
        assert len(np.unique(finite)) == 1
        assert np.isnan(v).sum() > 0

    def test_spatial_differencing(self):
        d = grib2.read_grib2(f"{REF}/spatial_differencing_order_1.grb2")
        v = d["values"]
        # temperature field: Kelvin range sanity
        assert 250 < np.nanmin(v) < np.nanmax(v) < 330

    def test_png_packing(self):
        d = grib2.read_grib2(
            f"{REF}/MRMS_EchoTop_18_00.50_20161015-133230.grib2")
        assert d["template"] == 41 and d["values"].shape == (1500, 3000)

    def test_latlon_georeferencing(self):
        d = grib2.read_grib2(f"{REF}/gfs.t06z.pgrb2.1p0.grib2")
        assert d["nx"] == 36 and d["ny"] == 18
        assert abs(abs(d["dlon"]) - 10.0) < 1e-9 or \
            abs(abs(d["dlon"]) - 1.0) < 1e-9

    def test_sweep(self):
        ok = ni = err = 0
        for p in sorted(glob.glob(f"{REF}/*.grb2")) \
                + sorted(glob.glob(f"{REF}/*.grib2")):
            msgs = [m for m in grib2.scan_messages(p)
                    if m["edition"] == 2]
            if not msgs:
                continue
            try:
                grib2.read_grib2(p)
                ok += 1
            except NotImplementedError:
                ni += 1
            except Exception:
                err += 1
        assert ok >= 30 and err == 0, (ok, ni, err)


class TestRaySurface:
    def test_message_dataset(self, ray_session):
        df = grib2.read_grib2_messages(
            f"{REF}/gfs.t06z.pgrb2.1p0.grib2").to_pandas()
        assert len(df) >= 1
        r = df.iloc[0]
        a = np.frombuffer(r["data"], np.float64).reshape(r["ny"], r["nx"])
        assert np.isfinite(a).all()
