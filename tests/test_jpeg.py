"""Baseline JPEG codec (sources/jpeg): roundtrips, exactness, properties."""

import numpy as np
import pytest

from gdal_ray.sources import jpeg


def test_constant_block_exact_roundtrip():
    """Pure-DC blocks round-trip exactly when the DC quant step <= 8
    (quality >= 75) — the property the media oracle relies on."""
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 256, (4, 5)).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    for q in (75, 85, 90, 100):
        assert np.array_equal(jpeg.decode_baseline(
            jpeg.encode_baseline(img, quality=q)), img), q


def test_gray_and_rgb_psnr():
    yy, xx = np.mgrid[0:64, 0:72]
    g = ((np.sin(xx / 9.0) + np.cos(yy / 7.0)) * 60 + 128).astype(np.uint8)
    d = jpeg.decode_baseline(jpeg.encode_baseline(g, quality=90))
    mse = np.mean((d.astype(float) - g.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 40
    rgb = np.stack([(xx * 3 + yy) % 256, (xx + yy * 2) % 256,
                    (xx * 5) % 256], -1).astype(np.uint8)
    d3 = jpeg.decode_baseline(jpeg.encode_baseline(rgb, quality=95))
    assert d3.shape == rgb.shape
    mse3 = np.mean((d3.astype(float) - rgb.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse3) > 35


def test_odd_sizes_and_stuffing():
    """Non-multiple-of-8 sizes pad/crop; high-entropy data exercises 0xFF
    byte stuffing in the entropy stream."""
    rng = np.random.default_rng(7)
    for shape in ((37, 45), (8, 8), (1, 1), (9, 24)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        d = jpeg.decode_baseline(jpeg.encode_baseline(img, quality=95))
        assert d.shape == shape
        # lossy but close
        assert np.mean(np.abs(d.astype(int) - img.astype(int))) < 30


def test_quality_monotonic_size():
    yy, xx = np.mgrid[0:48, 0:48]
    img = ((xx * yy) % 256).astype(np.uint8)
    sizes = [len(jpeg.encode_baseline(img, quality=q)) for q in (20, 60, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_decoder_rejects_non_baseline():
    with pytest.raises(ValueError):
        jpeg.decode_baseline(b"\x89PNG\r\n")
    # progressive SOF2 marker is rejected explicitly
    buf = bytearray(jpeg.encode_baseline(np.zeros((8, 8), np.uint8)))
    i = bytes(buf).find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        jpeg.decode_baseline(bytes(buf))


def test_media_backend_sniffs_jpeg(tmp_path):
    from gdal_ray.stages import media

    ref = "media://image/000000042/1"
    buf = media.payload_for_ref(ref, 8, image_codec="jpeg")
    assert buf[:2] == b"\xff\xd8"
    be = media.DecodeBackend("real")
    # in-memory synthesis path stays PNG; decode via explicit bytes
    arr = jpeg.decode_baseline(buf)
    assert arr.shape == (64, 64)
    assert np.array_equal(arr[::8, ::8], media.fake_pixels(ref, 8))


def test_420_constant_macroblock_exact():
    """16x16-constant gray-valued RGB round-trips 4:2:0 exactly: Y is
    block-constant, Cb=Cr=128 exactly (r=g=b), the 2x2 box downsample is
    the identity on constants."""
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, (3, 5)).astype(np.uint8)
    g = np.repeat(np.repeat(vals, 16, 0), 16, 1)
    img = np.stack([g, g, g], -1)
    for ri in (0, 2):
        buf = jpeg.encode_baseline(img, quality=90, subsampling="420",
                                   restart_interval=ri)
        assert np.array_equal(jpeg.decode_baseline(buf), img), ri


def test_420_shape_and_luma_fidelity():
    """Odd sizes crop correctly; full-resolution luma survives 4:2:0 while
    pixel-level chroma is (by design) smoothed."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    out = jpeg.decode_baseline(
        jpeg.encode_baseline(img, quality=95, subsampling="420"))
    assert out.shape == img.shape

    def luma(a):
        return (0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2])

    err = np.abs(luma(out.astype(float)) - luma(img.astype(float))).mean()
    assert err < 4.0


def test_restart_markers_roundtrip():
    """DRI/RSTn: stream contains restart markers and decodes identically
    to the no-restart stream."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (48, 64), np.uint8)
    plain = jpeg.encode_baseline(img, quality=90)
    rst = jpeg.encode_baseline(img, quality=90, restart_interval=3)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert np.array_equal(jpeg.decode_baseline(plain),
                          jpeg.decode_baseline(rst))


def test_progressive_matches_baseline_pixels():
    """Progressive scans (DC first/refine, banded AC first/refine, EOB
    runs) reconstruct the SAME quantized coefficients as the baseline
    stream, so decoded pixels are bit-identical."""
    rng = np.random.default_rng(11)
    cases = [((33, 41, 3), "444", 0), ((37, 53, 3), "420", 0),
             ((48, 48), "444", 2), ((64, 96, 3), "420", 3)]
    for shape, sub, ri in cases:
        a = rng.integers(0, 256, shape, np.uint8)
        pb = jpeg.encode_progressive(a, quality=90, subsampling=sub,
                                     restart_interval=ri)
        bb = jpeg.encode_baseline(a, quality=90, subsampling=sub,
                                  restart_interval=ri)
        assert np.array_equal(jpeg.decode(pb), jpeg.decode(bb)), (shape, sub)


def test_progressive_sparse_eob_runs():
    """Near-empty images maximize EOB-run lengths and the
    history/zero-run interleave in AC refinement scans."""
    for q in (50, 85, 95):
        for seed in range(4):
            rng = np.random.default_rng(seed)
            img = np.zeros((64, 64), np.uint8)
            ys, xs = rng.integers(0, 64, 12), rng.integers(0, 64, 12)
            img[ys, xs] = rng.integers(1, 256, 12)
            pb = jpeg.encode_progressive(img, quality=q)
            bb = jpeg.encode_baseline(img, quality=q)
            assert np.array_equal(jpeg.decode(pb), jpeg.decode(bb)), (q, seed)


def test_decode_dispatch():
    img = np.repeat(np.repeat(
        np.arange(16, dtype=np.uint8).reshape(4, 4) * 16, 8, 0), 8, 1)
    base = jpeg.encode_baseline(img, quality=85)
    prog = jpeg.encode_progressive(img, quality=85)
    assert np.array_equal(jpeg.decode(base), jpeg.decode(prog))
    with pytest.raises(ValueError):
        jpeg.decode(b"\xff\xd8\xff\xd9")
