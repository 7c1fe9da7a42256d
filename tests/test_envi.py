"""ENVI driver: dtype/interleave/byte-order round trips + validation."""

import numpy as np
import pytest


def test_envi_roundtrips(tmp_path):
    from gdal_ray.sources.envi import read_envi, write_envi

    rng = np.random.default_rng(5)
    for dtype in (np.uint8, np.int16, np.int32, np.float32, np.float64,
                  np.uint16, np.uint32):
        a = rng.integers(0, 200, (3, 10, 14)).astype(dtype)
        for il in ("bsq", "bil", "bip"):
            for bo in (0, 1):
                base = str(tmp_path / f"t_{np.dtype(dtype).name}_{il}_{bo}")
                write_envi(base, a, interleave=il, byte_order=bo)
                back, hdr = read_envi(base)
                assert back.dtype == np.dtype(dtype).newbyteorder("=")
                assert np.array_equal(back, a), (dtype, il, bo)
                assert hdr["interleave"] == il
    # 2-D input becomes a 1-band dataset
    g = rng.standard_normal((7, 9)).astype(np.float32)
    base = str(tmp_path / "single")
    write_envi(base, g)
    back, _ = read_envi(base + ".hdr")
    assert back.shape == (1, 7, 9) and np.array_equal(back[0], g)
    # validation
    with pytest.raises(ValueError, match="unsupported ENVI dtype"):
        write_envi(str(tmp_path / "bad"), g.astype(np.complex64))
    with pytest.raises(ValueError, match="unknown interleave"):
        write_envi(str(tmp_path / "bad2"), g, interleave="bik")
    (tmp_path / "x.hdr").write_text("NOTENVI\nsamples = 2\n")
    with pytest.raises(ValueError, match="ENVI magic"):
        read_envi(str(tmp_path / "x"))
    # truncated data file fails loudly
    import os

    base = str(tmp_path / "trunc")
    write_envi(base, g)
    with open(base + ".dat", "r+b") as f:
        f.truncate(10)
    with pytest.raises(ValueError, match="expected"):
        read_envi(base)


def test_envi_tiles(tmp_path, ray_session):
    from gdal_ray.sources.envi import read_envi_tiles, write_envi

    gy, gx = np.mgrid[0:100, 0:130]
    arr = (gx + 2 * gy).astype(np.float32)
    base = str(tmp_path / "grid")
    write_envi(base, arr, interleave="bip")
    rows = read_envi_tiles(base, tile_size=64).take_all()
    assert len(rows) == 2 * 3  # 100x130 -> 2 tile rows x 3 tile cols
    r = next(r for r in rows if (r["x"], r["y"]) == (1, 1))
    sub = np.frombuffer(r["data"], np.float32).reshape(r["height"], r["width"])
    assert sub.shape == (36, 64)
    assert sub[0, 0] == 64.0 + 2 * 64.0


def test_envi_window_reads(tmp_path):
    from gdal_ray.sources.envi import read_envi_window, write_envi

    rng = np.random.default_rng(9)
    a = rng.integers(0, 1000, (2, 40, 60)).astype(np.int32)
    for il in ("bsq", "bil", "bip"):
        base = str(tmp_path / f"w_{il}")
        write_envi(base, a, interleave=il)
        for band in (1, 2):
            win = read_envi_window(base, band, 5, 25, 10, 50)
            assert np.array_equal(win, a[band - 1, 5:25, 10:50]), (il, band)
