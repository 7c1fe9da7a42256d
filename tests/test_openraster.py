"""GDALOpen-style driver probe (gcore/gdaldataset.cpp identify loop)."""

import numpy as np
import pytest

from gdal_ray.sources import openraster


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def test_identify_and_open_all_drivers(tmp_path, rng, ray_session):
    from gdal_ray.sources import (aaigrid, bmp, dted, envi, gif, hgt,
                                  netcdf3, pnm, tga)
    from gdal_ray.sources.jpeg import encode_baseline
    from gdal_ray.sources.png import encode_png

    a = rng.integers(0, 256, (70, 90), dtype=np.uint8)
    paths = {}
    bmp.write_bmp(str(tmp_path / "o.bmp"), a)
    paths["BMP"] = tmp_path / "o.bmp"
    gif.write_gif(str(tmp_path / "o.gif"), a)
    paths["GIF"] = tmp_path / "o.gif"
    pnm.write_pnm(str(tmp_path / "o.pgm"), a)
    paths["PNM"] = tmp_path / "o.pgm"
    (tmp_path / "o.png").write_bytes(encode_png(a))
    paths["PNG"] = tmp_path / "o.png"
    c8 = np.repeat(np.repeat(rng.integers(0, 256, (9, 12), dtype=np.uint8),
                             8, 0), 8, 1)
    (tmp_path / "o.jpg").write_bytes(encode_baseline(c8))
    paths["JPEG"] = tmp_path / "o.jpg"
    hgt.write_hgt(str(tmp_path / "N10E020.hgt"),
                  rng.integers(-100, 100, (1201, 1201)).astype(np.int16))
    paths["SRTMHGT"] = tmp_path / "N10E020.hgt"
    dted.write_dted(str(tmp_path / "o.dt0"),
                    rng.integers(-100, 100, (121, 121)).astype(np.int16))
    paths["DTED"] = tmp_path / "o.dt0"
    tga.write_tga(str(tmp_path / "o.tga"), a)
    paths["TGA"] = tmp_path / "o.tga"
    aaigrid.write_asc(str(tmp_path / "o.asc"), a.astype(np.float64))
    paths["AAIGrid"] = tmp_path / "o.asc"
    netcdf3.write_netcdf3(str(tmp_path / "o.nc"),
                          {"v": (("y", "x"), a.astype(np.float32))})
    paths["netCDF"] = tmp_path / "o.nc"
    envi.write_envi(str(tmp_path / "o_envi"), a[None].astype(np.float32))
    paths["ENVI"] = tmp_path / "o_envi.dat"

    for drv, p in paths.items():
        assert openraster.identify(str(p)) == drv
        tiles = openraster.open_raster_tiles(str(p), tile_size=64)
        rows = tiles.take_all()
        assert rows, drv
        # value transparency for the lossless byte formats
        if drv in ("BMP", "GIF", "PNM", "PNG", "TGA"):
            full = rows[0]
            got = np.frombuffer(full["data"], np.uint8).reshape(
                full["height"], full["width"])
            assert np.array_equal(got, a[:64, :64]), drv

    junk = tmp_path / "junk.zzz"
    junk.write_bytes(b"\x00" * 40)
    with pytest.raises(ValueError, match="no driver claims"):
        openraster.identify(str(junk))


def test_open_raster_pipeline_step(tmp_path, rng, ray_session):
    from gdal_ray.pipelines import steps
    from gdal_ray.sources import bmp

    a = rng.integers(0, 256, (70, 90), dtype=np.uint8)
    p = tmp_path / "s.bmp"
    bmp.write_bmp(str(p), a)
    out = steps.run_pipeline(None, f"open_raster path={p} ! limit n=2")
    assert out.count() == 2
    with pytest.raises(ValueError, match="path"):
        steps.run_pipeline(None, "open_raster")
