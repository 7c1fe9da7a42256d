"""GTiff LZW/PackBits/Predictor codecs + COG layout (round 5).

Reference parity: frmts/gtiff COMPRESS=LZW/PACKBITS + TIFFTAG_PREDICTOR
(autotest gcore/tiff_read.py), frmts/gtiff/cogdriver.cpp layout rules
(autotest gdrivers/cog.py / validate_cloud_optimized_geotiff.py)."""
import numpy as np
import pytest

from gdal_ray.sources import gtiff, tiffcodec as tc


class TestLZW:
    def test_roundtrip_adversarial(self):
        rng = np.random.default_rng(11)
        cases = [
            b"", b"\x00" * 4096,
            bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),
            bytes(rng.integers(0, 3, 150000, dtype=np.uint8)),
            bytes(np.arange(256, dtype=np.uint8)) * 200,
        ]
        for c in cases:
            assert tc.lzw_decode(tc.lzw_encode(c)) == c

    def test_width_boundary(self):
        # force the table exactly through the 511/1023/2047 early-change
        # boundaries: distinct pairs grow the table deterministically
        data = bytes(np.random.default_rng(5).integers(
            0, 256, 20000, dtype=np.uint8))
        assert tc.lzw_decode(tc.lzw_encode(data)) == data

    def test_corrupt_raises(self):
        with pytest.raises(ValueError):
            # code far beyond the table right after a clear
            tc.lzw_decode(bytes([0x80, 0x1F, 0xF0, 0x00]) * 4)


class TestPackBits:
    def test_spec_vector(self):
        # TIFF 6.0 §9 worked example
        decoded = bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
                        + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10)
        encoded = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                         0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
        assert tc.packbits_decode(encoded) == decoded
        assert tc.packbits_decode(tc.packbits_encode(decoded)) == decoded

    def test_long_runs(self):
        data = b"\x07" * 1000 + b"ab" * 300 + b"\xff" * 129
        assert tc.packbits_decode(tc.packbits_encode(data)) == data


class TestPredictor:
    @pytest.mark.parametrize("dtype", ["uint8", "uint16", "int32"])
    def test_roundtrip(self, dtype):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 200, (33, 47)).astype(dtype)
        enc = tc.predictor2_encode(a.tobytes(), 47, 33, np.dtype(dtype))
        dec = tc.predictor2_decode(enc, 47, 33, np.dtype(dtype))
        assert dec == a.tobytes()

    def test_wraparound(self):
        a = np.array([[250, 10, 250, 10]], dtype=np.uint8)
        enc = tc.predictor2_encode(a.tobytes(), 4, 1, np.uint8)
        assert tc.predictor2_decode(enc, 4, 1, np.uint8) == a.tobytes()


class TestGTiffCompressed:
    @pytest.mark.parametrize("compress,predictor", [
        ("lzw", 1), ("lzw", 2), ("packbits", 1), ("deflate", 2)])
    @pytest.mark.parametrize("tiled", [True, False])
    def test_roundtrip(self, tmp_path, compress, predictor, tiled):
        rng = np.random.default_rng(4)
        a = rng.integers(0, 1000, (150, 130)).astype(np.uint16)
        p = str(tmp_path / "t.tif")
        gtiff.write_gtiff(p, a, tile_size=64 if tiled else None,
                          compress=compress, predictor=predictor)
        b, meta = gtiff.read_gtiff(p)
        assert (b == a).all()

    def test_predictor_rejects_float(self, tmp_path):
        with pytest.raises(ValueError, match="integer-only"):
            gtiff.write_gtiff(str(tmp_path / "t.tif"),
                              np.zeros((8, 8), np.float32),
                              compress="lzw", predictor=2)

    def test_unknown_compression_read_raises(self, tmp_path):
        p = str(tmp_path / "t.tif")
        gtiff.write_gtiff(p, np.zeros((8, 8), np.uint8))
        buf = bytearray(open(p, "rb").read())
        i = buf.find((259).to_bytes(2, "little"))  # Compression tag
        # 50000 = ZSTD: no codec in this environment -> clear error
        buf[i + 8:i + 10] = (50000).to_bytes(2, "little")
        open(p, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="Compression=50000"):
            gtiff.read_gtiff(p)


class TestCOG:
    def _hump(self):
        gy, gx = np.mgrid[0:700, 0:900]
        return (((gx - 450) ** 2 + (gy - 350) ** 2) // 64).astype(np.uint16)

    def test_layout_and_content(self, tmp_path):
        arr = self._hump()
        p = str(tmp_path / "c.tif")
        info = gtiff.write_cog(p, arr, tile_size=256, compress="deflate",
                               predictor=2)
        assert info["n_images"] == 3  # 900 -> 450 -> 225 (<= 256)
        v = gtiff.validate_cog(p)
        assert v["valid"], v["errors"]
        a0, meta = gtiff.read_gtiff(p, image=0)
        assert (a0 == arr).all()
        assert meta["n_images"] == 3

    def test_overview_content(self, tmp_path):
        arr = self._hump()
        p = str(tmp_path / "c.tif")
        gtiff.write_cog(p, arr, tile_size=256)
        a1, _ = gtiff.read_gtiff(p, image=1)
        # integer average decimation (round-half-up, gcore/overview.cpp)
        exp = gtiff._decimate_int(arr, 2, "average")
        assert a1.shape == exp.shape
        assert (a1 == exp).all()

    def test_ghost_area(self, tmp_path):
        p = str(tmp_path / "c.tif")
        gtiff.write_cog(p, self._hump(), tile_size=256)
        head = open(p, "rb").read(256)
        assert head[8:].startswith(b"GDAL_STRUCTURAL_METADATA_SIZE=")
        assert b"LAYOUT=IFDS_BEFORE_DATA" in head
        assert b"BLOCK_LEADER=SIZE_AS_UINT4" in head

    def test_plain_gtiff_fails_validation(self, tmp_path):
        p = str(tmp_path / "t.tif")
        gtiff.write_gtiff(p, self._hump()[:160, :160], tile_size=64)
        v = gtiff.validate_cog(p)
        assert not v["valid"]

    def test_lzw_cog(self, tmp_path):
        arr = self._hump()[:300, :300]
        p = str(tmp_path / "c.tif")
        gtiff.write_cog(p, arr, tile_size=128, compress="lzw", predictor=2)
        assert gtiff.validate_cog(p)["valid"]
        a0, _ = gtiff.read_gtiff(p)
        assert (a0 == arr).all()

    def test_float_cog(self, tmp_path):
        gy, gx = np.mgrid[0:300, 0:300]
        arr = ((gx + gy) / 3.0).astype(np.float32)
        p = str(tmp_path / "c.tif")
        gtiff.write_cog(p, arr, tile_size=128, compress="deflate")
        a0, _ = gtiff.read_gtiff(p)
        assert (a0 == arr).all()
        a1, _ = gtiff.read_gtiff(p, image=1)
        assert a1.shape == (150, 150)


class TestMultiBand:
    @pytest.mark.parametrize("compress,predictor", [
        (None, 1), ("deflate", 2), ("lzw", 2), ("packbits", 1)])
    def test_rgb_roundtrip(self, tmp_path, compress, predictor):
        rng = np.random.default_rng(9)
        rgb = rng.integers(0, 255, (150, 130, 3)).astype(np.uint8)
        p = str(tmp_path / "rgb.tif")
        gtiff.write_gtiff(p, rgb, tile_size=64, compress=compress,
                          predictor=predictor)
        b, meta = gtiff.read_gtiff(p)
        assert b.shape == rgb.shape and (b == rgb).all()
        assert meta["samples"] == 3

    def test_rgba_strips(self, tmp_path):
        rng = np.random.default_rng(2)
        rgba = rng.integers(0, 255, (90, 80, 4)).astype(np.uint8)
        p = str(tmp_path / "rgba.tif")
        gtiff.write_gtiff(p, rgba)
        b, _ = gtiff.read_gtiff(p)
        assert (b == rgba).all()

    def test_complex_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        c = (rng.random((20, 25)) + 1j * rng.random((20, 25))) \
            .astype(np.complex64)
        p = str(tmp_path / "c.tif")
        gtiff.write_gtiff(p, c)
        b, _ = gtiff.read_gtiff(p)
        assert b.dtype == np.complex64 and (b == c).all()


REF_GCORE = "/root/reference/autotest/gcore/data"


@pytest.mark.skipif(not __import__("os").path.isdir(REF_GCORE),
                    reason="reference fixtures not present")
class TestReferenceTiffFixtures:
    def test_cross_layout_equality(self):
        """The same RGB image in chunky-tiled / planar-tiled / stripped
        PackBits layouts decodes identically (big-endian files)."""
        a1, _ = gtiff.read_gtiff(f"{REF_GCORE}/contig_tiled.tif")
        a2, _ = gtiff.read_gtiff(f"{REF_GCORE}/separate_tiled.tif")
        a3, _ = gtiff.read_gtiff(f"{REF_GCORE}/contig_strip.tif")
        assert a1.shape == (37, 35, 3)
        assert (a1 == a2).all() and (a1 == a3).all()

    def test_rgbsmall_legacy_deflate_planar(self):
        a, meta = gtiff.read_gtiff(f"{REF_GCORE}/rgbsmall.tif")
        assert a.shape == (50, 50, 3) and a.dtype == np.uint8
        assert [int(a[:, :, i].sum()) for i in range(3)] == \
            [163597, 227577, 68920]

    def test_sweep_coverage(self):
        """At least 170 of the 235 public gcore TIFFs read fully (the
        remainder: JPEG/LERC/JXL codecs, intentionally-corrupt files,
        12-bit / YCbCr layouts)."""
        import glob

        ok = 0
        for p in sorted(glob.glob(f"{REF_GCORE}/*.tif")):
            try:
                gtiff.read_gtiff(p)
                ok += 1
            except Exception:
                pass
        assert ok >= 170, ok


@pytest.mark.skipif(not __import__("os").path.isdir(REF_GCORE),
                    reason="reference fixtures not present")
class TestJpegInTiff:
    def test_tables_splice(self):
        """New-style JPEG-in-TIFF: abbreviated chunk streams + shared
        JPEGTables decode through the in-repo JPEG codec."""
        a, _ = gtiff.read_gtiff(f"{REF_GCORE}/byte_jpg_tablesmodezero.tif")
        b, _ = gtiff.read_gtiff(f"{REF_GCORE}/byte_ovr_jpeg_tablesmode1.tif")
        assert a.shape == (20, 20) and b.shape == (20, 20)
        # both encode the classic 20x20 byte.tif image; JPEG loss is small
        assert abs(int(a.sum()) - int(b.sum())) < 2000

    def test_irregular_tiles(self):
        a, _ = gtiff.read_gtiff(
            f"{REF_GCORE}/irregular_tile_size_jpeg_in_tiff.tif")
        assert a.shape == (256, 512)
