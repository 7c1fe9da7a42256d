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
    with pytest.raises(ValueError, match="baseline"):
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
