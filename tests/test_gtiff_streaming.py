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
