"""Footprint + nearblack tests (BFS-oracle based)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.stages import collar
from tests.test_raster import _brute_ccl


def _tiles_from_mosaic(arr: np.ndarray, size: int) -> pa.Table:
    ny, nx = arr.shape[0] // size, arr.shape[1] // size
    rows = []
    for ty in range(ny):
        for tx in range(nx):
            rows.append(
                {
                    "z": 0, "x": tx, "y": ty, "band": 1, "width": size, "height": size,
                    "crs": "EPSG:3857", "nodata": 0.0, "dtype": "uint8",
                    "data": np.ascontiguousarray(
                        arr[ty * size : (ty + 1) * size, tx * size : (tx + 1) * size]
                    ).tobytes(),
                }
            )
    return pa.Table.from_pylist(rows)


def test_footprint_counts():
    size = 16
    arr = np.zeros((32, 32), dtype=np.uint8)
    arr[4:12, 4:28] = 5   # one region crossing a tile border
    arr[20:24, 2:6] = 9   # another region
    tiles = _tiles_from_mosaic(arr, size)
    out = collar.footprint(rd.from_arrow(tiles), nodata=0.0, tile_size=size).to_pandas()
    assert len(out) == 2
    assert sorted(out["n_pixels"]) == sorted([8 * 24, 4 * 4])


def test_nearblack_removes_edge_collar_keeps_interior():
    size = 16
    arr = np.full((32, 32), 100, dtype=np.uint8)
    # collar: near-black frame around the mosaic, 2px wide (crosses all tiles)
    arr[:2, :] = 3
    arr[-2:, :] = 3
    arr[:, :2] = 3
    arr[:, -2:] = 3
    # interior dark blob: must be PRESERVED
    arr[14:18, 14:18] = 3
    tiles = _tiles_from_mosaic(arr, size)
    out = collar.nearblack(
        rd.from_arrow(tiles), threshold=10.0, nodata=255.0, nx=2, ny=2
    ).take_all()
    got = np.zeros((32, 32), dtype=np.uint8)
    for r in out:
        a = np.frombuffer(r["data"], dtype=np.uint8).reshape(size, size)
        got[r["y"] * size : (r["y"] + 1) * size, r["x"] * size : (r["x"] + 1) * size] = a
    assert (got[:2, :] == 255).all() and (got[:, -2:] == 255).all()
    assert (got[14:18, 14:18] == 3).all()
    assert (got[4:12, 4:12] == 100).all()


def test_nearblack_collar_touching_interior_blob_via_bridge():
    size = 16
    arr = np.full((32, 32), 100, dtype=np.uint8)
    arr[:, :2] = 3           # left collar
    arr[15:17, 2:20] = 3     # bridge from collar into the interior (crosses tiles)
    tiles = _tiles_from_mosaic(arr, size)
    out = collar.nearblack(
        rd.from_arrow(tiles), threshold=10.0, nodata=255.0, nx=2, ny=2
    ).take_all()
    got = np.zeros((32, 32), dtype=np.uint8)
    for r in out:
        a = np.frombuffer(r["data"], dtype=np.uint8).reshape(size, size)
        got[r["y"] * size : (r["y"] + 1) * size, r["x"] * size : (r["x"] + 1) * size] = a
    # the whole connected dark structure is flooded
    assert (got[15:17, 2:20] == 255).all()
    assert (got[:, :2] == 255).all()
