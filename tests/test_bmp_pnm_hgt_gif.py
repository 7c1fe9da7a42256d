"""Round-4 continuation drivers: BMP, binary PNM, SRTM HGT, GIF (LZW)."""

import numpy as np
import pytest

from gdal_ray.sources import bmp, gif, hgt, pnm


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def test_bmp_roundtrips(tmp_path, rng):
    a8 = rng.integers(0, 256, (67, 93), dtype=np.uint8)  # odd width -> padding
    p = str(tmp_path / "a.bmp")
    bmp.write_bmp(p, a8)
    b, hdr = bmp.read_bmp(p)
    assert np.array_equal(a8, b)
    assert hdr["bpp"] == 8 and hdr["bottom_up"]
    assert np.array_equal(hdr["palette"],
                          np.stack([np.arange(256, dtype=np.uint8)] * 3, 1))
    # custom palette round-trips
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    bmp.write_bmp(p, a8, palette=pal)
    _, hdr = bmp.read_bmp(p)
    assert np.array_equal(hdr["palette"], pal)
    # 24-bit RGB
    a24 = rng.integers(0, 256, (50, 31, 3), dtype=np.uint8)
    bmp.write_bmp(p, a24)
    b, hdr = bmp.read_bmp(p)
    assert hdr["bpp"] == 24
    assert np.array_equal(a24, b)


def test_bmp_window_and_errors(tmp_path, rng):
    a = rng.integers(0, 256, (40, 70), dtype=np.uint8)
    p = str(tmp_path / "w.bmp")
    bmp.write_bmp(p, a)
    assert np.array_equal(bmp.read_bmp_window(p, 7, 23, 11, 70),
                          a[7:23, 11:70])
    with pytest.raises(ValueError, match="outside"):
        bmp.read_bmp_window(p, 0, 41, 0, 70)
    with pytest.raises(ValueError, match="uint8"):
        bmp.write_bmp(p, a.astype(np.int16))
    (tmp_path / "junk.bmp").write_bytes(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="magic"):
        bmp.read_bmp(str(tmp_path / "junk.bmp"))


def test_pnm_roundtrips(tmp_path, rng):
    p = str(tmp_path / "g.pgm")
    a = rng.integers(0, 256, (41, 77), dtype=np.uint8)
    pnm.write_pnm(p, a)
    b, hdr = pnm.read_pnm(p)
    assert np.array_equal(a, b) and hdr["maxval"] == 255
    a16 = rng.integers(0, 65536, (41, 77), dtype=np.uint16)
    pnm.write_pnm(p, a16)
    b, hdr = pnm.read_pnm(p)
    assert np.array_equal(a16, b) and b.dtype == np.uint16
    rgb = rng.integers(0, 256, (23, 19, 3), dtype=np.uint8)
    pp = str(tmp_path / "c.ppm")
    pnm.write_pnm(pp, rgb)
    b, hdr = pnm.read_pnm(pp)
    assert np.array_equal(rgb, b) and hdr["channels"] == 3
    assert np.array_equal(pnm.read_pnm_window(p, 3, 20, 4, 50),
                          a16[3:20, 4:50])


def test_pnm_header_comments_and_errors(tmp_path):
    # comments and arbitrary whitespace in the header are legal netpbm
    body = bytes(range(6))
    raw = b"P5 # comment\n# another\n 3\n2 # w h\n 255\n" + body
    p = tmp_path / "c.pgm"
    p.write_bytes(raw)
    a, hdr = pnm.read_pnm(str(p))
    assert a.shape == (2, 3) and np.array_equal(a.ravel(), np.arange(6))
    with pytest.raises(ValueError, match="P5 or P6"):
        pnm.read_pnm(str(tmp_path / "junk.pnm")) if (
            (tmp_path / "junk.pnm").write_bytes(b"P2\n1 1\n255\n0") or True
        ) else None
    short = tmp_path / "short.pgm"
    short.write_bytes(b"P5\n4 4\n255\n\x00\x00")
    with pytest.raises(ValueError, match="body"):
        pnm.read_pnm(str(short))


def test_hgt_roundtrip_window_geotransform(tmp_path, rng):
    dem = rng.integers(-500, 8000, (1201, 1201)).astype(np.int16)
    p = str(tmp_path / "N27E086.hgt")
    hgt.write_hgt(p, dem)
    assert np.array_equal(hgt.read_hgt(p), dem)
    assert np.array_equal(hgt.read_hgt_window(p, 100, 164, 1190, 1201),
                          dem[100:164, 1190:1201])
    assert hgt.parse_hgt_name(p) == (27, 86)
    gt = hgt.geotransform(p)
    assert gt[1] == pytest.approx(1 / 1200)
    assert gt[0] == pytest.approx(86 - 1 / 2400)
    assert gt[3] == pytest.approx(28 + 1 / 2400)
    assert hgt.parse_hgt_name("S14W077.hgt") == (-14, -77)
    with pytest.raises(ValueError, match="valid sizes"):
        bad = tmp_path / "N00E000.hgt"
        bad.write_bytes(b"\x00" * 100)
        hgt.read_hgt(str(bad))
    with pytest.raises(ValueError, match="int16"):
        hgt.write_hgt(p, dem.astype(np.float32))


def test_gif_lzw_roundtrips(tmp_path, rng):
    p = str(tmp_path / "t.gif")
    cases = {
        "noise": rng.integers(0, 256, (130, 201), dtype=np.uint8),
        # >4096 dictionary entries -> exercises the table-reset path
        "bignoise": rng.integers(0, 256, (400, 400), dtype=np.uint8),
        "smooth": (np.add.outer(np.arange(130), np.arange(201)) % 256
                   ).astype(np.uint8),
        "const": np.full((64, 64), 7, np.uint8),
        "tiny": np.array([[3]], np.uint8),
    }
    for name, img in cases.items():
        gif.write_gif(p, img)
        b, hdr = gif.read_gif(p)
        assert np.array_equal(img, b), name
    # compression actually compresses the compressible cases
    gif.write_gif(p, cases["const"])
    import os
    assert os.path.getsize(p) < cases["const"].size // 2


def test_gif_interlace_and_palette(tmp_path, rng):
    img = rng.integers(0, 256, (77, 50), dtype=np.uint8)
    p = str(tmp_path / "i.gif")
    gif.write_gif(p, img, interlace=True)
    b, hdr = gif.read_gif(p)
    assert hdr["interlaced"]
    assert np.array_equal(img, b)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    gif.write_gif(p, img, palette=pal)
    _, hdr = gif.read_gif(p)
    assert np.array_equal(hdr["palette"], pal)
    # extension blocks are skipped: splice a graphic-control ext before 0x2C
    raw = open(p, "rb").read()
    i = raw.index(b"\x2C", 13 + 768)
    spliced = raw[:i] + b"\x21\xF9\x04\x00\x00\x00\x00\x00" + raw[i:]
    p2 = str(tmp_path / "e.gif")
    open(p2, "wb").write(spliced)
    b2, _ = gif.read_gif(p2)
    assert np.array_equal(img, b2)


def test_driver_tiles_shape(tmp_path, rng, ray_session):
    """All four drivers emit the engine's standard tile rows."""
    a = rng.integers(0, 256, (100, 130), dtype=np.uint8)
    paths = {}
    bmp.write_bmp(str(tmp_path / "t.bmp"), a)
    pnm.write_pnm(str(tmp_path / "t.pgm"), a)
    gif.write_gif(str(tmp_path / "t.gif"), a)
    for fn, path in [(bmp.read_bmp_tiles, "t.bmp"),
                     (pnm.read_pnm_tiles, "t.pgm"),
                     (gif.read_gif_tiles, "t.gif")]:
        rows = fn(str(tmp_path / path), tile_size=64).take_all()
        assert len(rows) == 2 * 3
        full = rows[0]
        assert (full["width"], full["height"]) == (64, 64)
        got = np.frombuffer(full["data"], np.uint8).reshape(64, 64)
        assert np.array_equal(got, a[:64, :64]), path


def test_dted_roundtrip_window_checksum(tmp_path, rng):
    """DTED: signed-magnitude samples, per-column records, byte-sum
    checksums (frmts/dted/dted_api.c:640-703)."""
    from gdal_ray.sources import dted

    a = rng.integers(-12000, 9000, (121, 121)).astype(np.int16)
    a[3, 7] = -32767  # nodata survives signed magnitude
    p = str(tmp_path / "n45w010.dt0")
    dted.write_dted(p, a, lon0=-10, lat0=45, interval_tenths=300)
    b, hdr = dted.read_dted(p, verify_checksum=True)
    assert np.array_equal(a, b)
    assert (hdr["lon0"], hdr["lat0"]) == (-10.0, 45.0)
    assert np.array_equal(
        dted.read_dted_window(p, 10, 50, 100, 121, verify_checksum=True),
        a[10:50, 100:121])
    # a flipped bit in a record is caught by the checksum
    raw = bytearray(open(p, "rb").read())
    raw[dted._parse_header(p)["data_off"] + 5 * hdr["rec_len"] + 20] ^= 0xFF
    bad = tmp_path / "bad.dt0"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="checksum mismatch"):
        dted.read_dted(str(bad), verify_checksum=True)
    # missing UHL rejected
    junk = tmp_path / "junk.dt0"
    junk.write_bytes(b"XXL" + b"\x20" * 4000)
    with pytest.raises(ValueError, match="UHL"):
        dted.read_dted(str(junk))


def test_bmp_rle8_roundtrips(tmp_path, rng):
    """BI_RLE8 (frmts/bmp BMPC_RLE8): encoded runs, EOL/EOB, >255 runs."""
    cases = {
        "runs": np.repeat(rng.integers(0, 5, (50, 20), dtype=np.uint8),
                          13, axis=1)[:, :250],
        "noise": rng.integers(0, 256, (30, 77), dtype=np.uint8),
        "longrun": np.full((10, 600), 42, np.uint8),
    }
    for name, img in cases.items():
        p = str(tmp_path / f"{name}.bmp")
        bmp.write_bmp_rle8(p, img)
        b, hdr = bmp.read_bmp(p)
        assert hdr["comp"] == 1 and np.array_equal(img, b), name
        assert np.array_equal(
            bmp.read_bmp_window(p, 2, 9, 3, img.shape[1] - 1),
            img[2:9, 3:-1]), name
    import os
    assert os.path.getsize(str(tmp_path / "longrun.bmp")) < 6000 // 4


def test_png_filter_types(rng):
    """PNG spec 9.4 filters: every type round-trips through the full
    unfiltering decoder; filtered encodes beat filter-0 on smooth data."""
    from gdal_ray.sources.png import decode_png, encode_png

    g = rng.integers(0, 256, (70, 90), dtype=np.uint8)
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    smooth = (np.add.outer(np.arange(70), np.arange(90)) % 256
              ).astype(np.uint8)
    for ft in range(5):
        for arr in (g, rgb, smooth):
            assert np.array_equal(arr, decode_png(encode_png(arr, ft))), ft
    assert len(encode_png(smooth, 4)) < len(encode_png(smooth, 0))
    with pytest.raises(ValueError, match="filter type"):
        encode_png(g, 7)


def test_tga_roundtrips(tmp_path, rng):
    """TGA types 2/3/10/11, both row orders, run + raw RLE packets."""
    from gdal_ray.sources import tga

    g = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    runs = np.repeat(rng.integers(0, 4, (40, 10), dtype=np.uint8), 20, axis=1)
    rgb = rng.integers(0, 256, (33, 29, 3), dtype=np.uint8)
    p = str(tmp_path / "t.tga")
    for img in (g, runs, rgb):
        for rle in (False, True):
            for td in (True, False):
                tga.write_tga(p, img, rle=rle, top_down=td)
                b, hdr = tga.read_tga(p)
                assert hdr["rle"] == rle and hdr["top_down"] == td
                assert np.array_equal(img, b)
    import os
    tga.write_tga(p, runs, rle=True)
    assert os.path.getsize(p) < runs.nbytes // 4
    # color-mapped and odd types rejected
    bad = tmp_path / "bad.tga"
    bad.write_bytes(bytes([0, 1, 1]) + b"\x00" * 15)
    with pytest.raises(ValueError, match="image type|color-mapped"):
        tga.read_tga(str(bad))
