"""MBTiles container + PMTiles conversion (round 5).

Reference parity: frmts/mbtiles/mbtilesdataset.cpp +
ogr/ogrsf_frmts/pmtiles/ogrpmtilesfrommbtiles.cpp; validated against the
public autotest mbtiles fixtures."""
import os

import pytest

from gdal_ray.sources import mbtiles as mb, pmtiles as pm

REF = "/root/reference/autotest/gdrivers/data/mbtiles"


class TestRoundtrip:
    def test_write_read(self, tmp_path):
        p = str(tmp_path / "t.mbtiles")
        tiles = [(2, x, y, bytes([x * 4 + y]) * 30)
                 for x in range(4) for y in range(4)]
        mb.write_mbtiles(p, tiles, metadata={"name": "t", "format": "png"})
        assert mb.read_metadata(p)["name"] == "t"
        assert mb.tile_index(p).num_rows == 16
        assert mb.get_tile(p, 2, 1, 3) == bytes([7]) * 30
        assert mb.get_tile(p, 9, 0, 0) is None

    def test_tms_flip(self, tmp_path):
        # XYZ (z=1, y=0) is stored as TMS row 1
        import sqlite3

        p = str(tmp_path / "f.mbtiles")
        mb.write_mbtiles(p, [(1, 0, 0, b"north")])
        con = sqlite3.connect(p)
        (row,) = con.execute("SELECT tile_row FROM tiles").fetchone()
        con.close()
        assert row == 1
        assert mb.get_tile(p, 1, 0, 0) == b"north"

    def test_gzip_tiles(self, tmp_path):
        p = str(tmp_path / "z.mbtiles")
        mb.write_mbtiles(p, [(0, 0, 0, b"payload" * 50)], gzip_tiles=True)
        assert mb.get_tile(p, 0, 0, 0, gunzip=True) == b"payload" * 50
        raw = mb.get_tile(p, 0, 0, 0, gunzip=False)
        assert raw[:2] == b"\x1f\x8b"

    def test_ray_read(self, ray_session, tmp_path):
        p = str(tmp_path / "r.mbtiles")
        mb.write_mbtiles(p, [(1, x, y, bytes([x, y]) * 10)
                             for x in (0, 1) for y in (0, 1)])
        df = mb.read_tiles(p).to_pandas()
        got = {(r.z, r.x, r.y): r.data for r in df.itertuples()}
        assert got[(1, 1, 0)] == bytes([1, 0]) * 10


class TestConversion:
    def test_mbtiles_pmtiles_roundtrip(self, tmp_path):
        src = str(tmp_path / "a.mbtiles")
        mid = str(tmp_path / "b.pmtiles")
        dst = str(tmp_path / "c.mbtiles")
        tiles = [(2, x, y, bytes([x * 4 + y]) * 30)
                 for x in range(4) for y in range(4)]
        mb.write_mbtiles(src, tiles, metadata={"format": "png"})
        info = mb.mbtiles_to_pmtiles(src, mid)
        assert info["n_entries"] == 16
        assert pm.get_tile(mid, 2, 1, 3) == bytes([7]) * 30
        mb.pmtiles_to_mbtiles(mid, dst)
        assert mb.get_tile(dst, 2, 1, 3) == bytes([7]) * 30


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference fixtures not present")
class TestReferenceFixtures:
    def test_byte_png(self):
        d = mb.get_tile(f"{REF}/byte.mbtiles", 11, 354, 818)
        assert d[:8] == b"\x89PNG\r\n\x1a\n"

    def test_jpeg_raster_converts(self, tmp_path):
        from gdal_ray.sources import jpeg

        dst = str(tmp_path / "w.pmtiles")
        mb.mbtiles_to_pmtiles(f"{REF}/world_l1.mbtiles", dst)
        h = pm.read_header(dst)
        assert h["tile_type"] == pm.TILETYPE_JPEG  # sniffed from payload
        a = jpeg.decode(pm.get_tile(dst, 0, 0, 0))
        assert a.shape == (256, 256, 3)


class TestGpkgRasterTiles:
    """GeoPackage TILES layers (ogrgeopackagedataset.cpp raster side)."""

    def test_write_read(self, ray_session, tmp_path):
        import numpy as np

        from gdal_ray.sources import gpkg, png

        p = str(tmp_path / "t.gpkg")
        rng = np.random.default_rng(4)
        arrs = {(1, x, y): rng.integers(0, 255, (64, 64)).astype(np.uint8)
                for x in (0, 1) for y in (0, 1)}
        gpkg.write_gpkg_tiles(
            p, "lay", [(z, x, y, png.encode_png(a))
                       for (z, x, y), a in arrs.items()], tile_size=64)
        assert gpkg.list_tile_layers(p) == ["lay"]
        tm = gpkg.tile_matrix(p, "lay")
        assert tm[0]["zoom_level"] == 1 and tm[0]["tile_width"] == 64
        df = gpkg.read_raster_tiles(p, "lay").to_pandas()
        assert len(df) == 4
        row = df[(df.x == 1) & (df.y == 0)].iloc[0]
        got = np.frombuffer(row["data"], np.uint8).reshape(64, 64)
        assert (got == arrs[(1, 1, 0)]).all()


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/autotest/gdrivers/data/gpkg"),
    reason="reference fixtures not present")
class TestGpkgReferenceFixtures:
    def test_byte_gpkg(self):
        import numpy as np

        from gdal_ray.sources import gpkg, png

        p = "/root/reference/autotest/gdrivers/data/gpkg/byte.gpkg"
        assert gpkg.list_tile_layers(p) == ["byte"]
        b = gpkg.get_raster_tile(p, "byte", 0, 0, 0)
        a = png.decode_png(b)  # gray+alpha PNG
        assert a.shape == (256, 256, 2)
        # data band == the classic byte.tif content (also pinned for the
        # netCDF container in test_hdf5)
        assert int(a[:, :, 0].astype(np.int64).sum()) == 50706

    def test_uint16_elevation(self):
        import numpy as np

        from gdal_ray.sources import gpkg, png

        p = ("/root/reference/autotest/gdrivers/data/gpkg/"
             "uint16-old-elevation-extension.gpkg")
        (lay,) = gpkg.list_tile_layers(p)
        b = gpkg.get_raster_tile(p, lay, 0, 0, 0)
        a = png.decode_png(b)  # 16-bit gray PNG
        assert a.dtype == np.uint16 and a.shape == (20, 20)
