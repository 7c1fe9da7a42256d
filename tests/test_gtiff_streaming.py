"""Round-4 streaming GTiff sink: pixel bytes never transit the driver."""

import os
import resource

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.sources import gtiff


def test_streaming_write_roundtrip(ray_session, tmp_path):
    ts, ntx, nty = 64, 6, 5
    W, H = ntx * ts - 10, nty * ts - 3  # ragged edge tiles

    def _tile_value(tx, ty, ts):
        yy, xx = np.mgrid[0:ts, 0:ts]
        return ((xx + tx * ts) * 31 + (yy + ty * ts) * 17).astype(np.uint32)

    def gen(t: pa.Table) -> pa.Table:
        def _tv(tx, ty):
            yy, xx = np.mgrid[0:ts, 0:ts]
            return ((xx + tx * ts) * 31 + (yy + ty * ts) * 17).astype(np.uint32)

        rows = []
        for i in t["id"].to_pylist():
            tx, ty = i % ntx, i // ntx
            w = min(ts, W - tx * ts)
            h = min(ts, H - ty * ts)
            sub = _tv(tx, ty)[:h, :w]
            rows.append({"x": tx, "y": ty, "width": w, "height": h,
                         "dtype": "uint32",
                         "data": np.ascontiguousarray(sub).tobytes()})
        return pa.Table.from_pylist(rows)

    tiles = rd.range(ntx * nty).map_batches(gen, batch_format="pyarrow")
    path = str(tmp_path / "stream.tif")
    n = gtiff.write_gtiff_tiles_streaming(
        tiles, path, width=W, height=H, tile_size=ts, dtype="uint32",
        nodata=0.0)
    assert n == ntx * nty
    arr, meta = gtiff.read_gtiff(path)
    assert arr.shape == (H, W)
    full = np.zeros((nty * ts, ntx * ts), np.uint32)
    for ty in range(nty):
        for tx in range(ntx):
            full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts] = \
                _tile_value(tx, ty, ts)
    assert np.array_equal(arr, full[:H, :W])


def test_streaming_write_driver_rss_is_metadata_sized(ray_session, tmp_path):
    """256 MB of pixels; driver high-water RSS must grow far less (the
    tiles are generated AND written inside worker tasks)."""
    ts, ntx, nty = 256, 32, 32  # 8192x8192 uint32 = 256 MiB
    W = H = ntx * ts

    def gen(t: pa.Table) -> pa.Table:
        rows = []
        for i in t["id"].to_pylist():
            tx, ty = i % ntx, i // ntx
            a = np.full((ts, ts), (i * 2654435761) & 0xFFFFFFFF, np.uint32)
            rows.append({"x": tx, "y": ty, "width": ts, "height": ts,
                         "dtype": "uint32", "data": a.tobytes()})
        return pa.Table.from_pylist(rows)

    tiles = rd.range(ntx * nty, override_num_blocks=64).map_batches(
        gen, batch_format="pyarrow")
    path = str(tmp_path / "big.tif")
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    n = gtiff.write_gtiff_tiles_streaming(
        tiles, path, width=W, height=H, tile_size=ts, dtype="uint32")
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert n == ntx * nty
    assert os.path.getsize(path) > 256 * 1024 * 1024
    # driver high-water delta << pixel volume (allow 96 MB slack for Ray)
    assert (rss1 - rss0) * 1024 < 96 * 1024 * 1024, (rss0, rss1)
    # spot-check a few tiles through the seek-based manifest reader
    man = gtiff.read_gtiff_manifest(path)
    assert man["width"] == W and man["layout"] == "tiles"
    got = {(r["x"], r["y"]): r for r in
           gtiff.read_gtiff_tiles(path).take_all()
           if (r["x"], r["y"]) in {(0, 0), (31, 31), (5, 17)}}
    for (tx, ty), r in got.items():
        a = np.frombuffer(r["data"], np.uint32).reshape(ts, ts)
        assert (a == ((ty * 32 + tx) * 2654435761) & 0xFFFFFFFF).all()


def test_streaming_sink_bigtiff_roundtrip(ray_session, tmp_path):
    """BigTIFF (version 43, 8-byte offsets) streaming sink: forced-big
    output reads back pixel-identical to the classic file through the
    same reader (magic 43, LONG8 tile offsets)."""
    import ray.data as rd
    import struct

    from gdal_ray.sources import gtiff as gt

    rng = np.random.default_rng(5)
    tiles = []
    for ty in range(2):
        for tx in range(3):
            arr = rng.integers(0, 255, (32, 32)).astype(np.uint8)
            tiles.append({"x": tx, "y": ty, "width": 32, "height": 32,
                          "dtype": "uint8", "data": arr.tobytes()})
    ds = rd.from_arrow(pa.Table.from_pylist(tiles))

    classic = str(tmp_path / "c.tif")
    big = str(tmp_path / "b.tif")
    gt.write_gtiff_tiles_streaming(ds, classic, width=96, height=64,
                                   tile_size=32, dtype="uint8",
                                   bigtiff=False)
    gt.write_gtiff_tiles_streaming(ds, big, width=96, height=64,
                                   tile_size=32, dtype="uint8",
                                   bigtiff=True)
    with open(big, "rb") as f:
        head = f.read(16)
    assert struct.unpack("<H", head[2:4])[0] == 43
    a = gt.read_gtiff(classic)
    b = gt.read_gtiff(big)
    assert np.array_equal(a[0] if isinstance(a, tuple) else a,
                          b[0] if isinstance(b, tuple) else b)


def test_bigtiff_auto_threshold():
    """bigtiff='auto' flips to version 43 only past the 4 GiB layout."""
    from gdal_ray.sources import gtiff as gt

    h_small, *_ = gt._tiled_header(width=64, height=64, tile_size=32,
                                   dtype="uint8")
    assert h_small[2:4] == b"\x2a\x00"  # 42: classic
    # 70000x70000 float64 = ~39 GiB layout -> BigTIFF without writing it
    h_big, data_start, ntx, nty, chunk = gt._tiled_header(
        width=70000, height=70000, tile_size=1000, dtype="float64")
    assert h_big[2:4] == b"\x2b\x00"  # 43: BigTIFF
    assert data_start + ntx * nty * chunk > (1 << 35)
