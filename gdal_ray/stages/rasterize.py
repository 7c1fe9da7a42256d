"""Rasterize (vector -> raster) — scanline burn per tile.

Re-answers ``gdal_rasterize`` (reference: scanline fill
``alg/llrasterize.cpp`` GDALdllImageFilledPolygon parity rule, burn dispatch
``alg/gdalrasterize.cpp:187,314``, ALL_TOUCHED line-walk :717-751, MERGE_ALG
REPLACE/ADD, chunked row bands :1183-1197) Ray-Data-first:

  features -> flat_map to covered tiles (pixel-space bbox cover)
           -> groupby(tile) -> map_groups: numpy scanline fill per tile
           -> tile rows (data bytes + checksum)

Semantics (GDAL default path):
  - polygons: a pixel is burned iff its CENTER is inside (even-odd parity on
    the scanline through the center row, half-open interval per crossing pair)
  - points: the containing pixel
  - lines: supercover walk (every pixel the segment passes through) — this is
    GDAL's ALL_TOUCHED-style line burn
  - merge: REPLACE (later features win, feature order = feat_id asc) or ADD
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import checksum as cks
from ..functions import wkb as _wkb


class GridSpec:
    """Target grid: GDAL-style geotransform + size, tiled for distribution."""

    def __init__(self, gt, width: int, height: int, tile: int = 256, nodata: float = 0.0):
        self.gt = tuple(gt)
        if gt[2] != 0 or gt[4] != 0:
            raise ValueError("rotated geotransforms not supported")
        self.width = width
        self.height = height
        self.tile = tile
        self.nodata = nodata
        self.ntx = (width + tile - 1) // tile
        self.nty = (height + tile - 1) // tile

    def world_to_pixel(self, x: np.ndarray, y: np.ndarray):
        px = (np.asarray(x) - self.gt[0]) / self.gt[1]
        py = (np.asarray(y) - self.gt[3]) / self.gt[5]
        return px, py


def _scanline_fill(mask: np.ndarray, rings: list[np.ndarray], px_off: float, py_off: float):
    """Set mask[r, c] for pixels whose center (c+0.5+px_off, r+0.5+py_off)
    is inside the polygon (even-odd).  Operates in local pixel space.

    Vectorized over (edge x row): all crossings are computed in one shot,
    lexsorted by (row, x), paired even-odd per row, and the spans painted
    with a flat scatter — no Python loop over edges or rows."""
    h, w = mask.shape
    ex0 = np.concatenate([r[:-1, 0] for r in rings]) if rings else np.empty(0)
    ey0 = np.concatenate([r[:-1, 1] for r in rings]) if rings else np.empty(0)
    ex1 = np.concatenate([r[1:, 0] for r in rings]) if rings else np.empty(0)
    ey1 = np.concatenate([r[1:, 1] for r in rings]) if rings else np.empty(0)
    keep = ey0 != ey1
    if not keep.any():
        return
    ex0, ey0, ex1, ey1 = ex0[keep], ey0[keep], ex1[keep], ey1[keep]
    lo = np.minimum(ey0, ey1)
    hi = np.maximum(ey0, ey1)
    # rows with center yc = r + 0.5 + py_off in (lo, hi]
    r_lo = np.maximum(np.floor(lo - 0.5 - py_off).astype(np.int64) + 1, 0)
    r_hi = np.minimum(np.floor(hi - 0.5 - py_off).astype(np.int64), h - 1)
    cnt = np.maximum(r_hi - r_lo + 1, 0)
    total = int(cnt.sum())
    if total == 0:
        return
    eidx = np.repeat(np.arange(ex0.size), cnt)
    offs = np.zeros(ex0.size, dtype=np.int64)
    np.cumsum(cnt[:-1], out=offs[1:])
    rows = np.repeat(r_lo, cnt) + (np.arange(total) - np.repeat(offs, cnt))
    yc = rows + 0.5 + py_off
    xs = ex0[eidx] + (yc - ey0[eidx]) * (ex1[eidx] - ex0[eidx]) / (ey1[eidx] - ey0[eidx])
    order = np.lexsort((xs, rows))
    rows, xs = rows[order], xs[order]
    # even-odd pairing within each row.  Closed rings with the half-open rule
    # give even per-row parity; for degenerate (unclosed) input a row may have
    # an ODD count — drop that row's dangling LAST crossing (exactly what the
    # sequential pairing loop did) so later rows stay aligned.
    row_start = np.r_[True, rows[1:] != rows[:-1]]
    pos_in_row = np.arange(rows.size) - np.maximum.accumulate(
        np.where(row_start, np.arange(rows.size), 0)
    )
    starts_idx = np.flatnonzero(row_start)
    counts = np.diff(np.r_[starts_idx, rows.size])
    row_cnt = np.repeat(counts, counts)
    keep = pos_in_row < row_cnt - (row_cnt % 2)
    rows, xs, pos_in_row = rows[keep], xs[keep], pos_in_row[keep]
    even = pos_in_row % 2 == 0
    ie = np.flatnonzero(even)
    io = np.flatnonzero(~even)
    c0 = np.maximum(np.ceil(xs[ie] - 0.5 - px_off).astype(np.int64), 0)
    c1 = np.minimum(np.ceil(xs[io] - 0.5 - px_off).astype(np.int64), w)
    rr = rows[ie]
    ok = c1 > c0
    c0, c1, rr = c0[ok], c1[ok], rr[ok]
    if c0.size == 0:
        return
    lens = c1 - c0
    span_total = int(lens.sum())
    soffs = np.zeros(c0.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=soffs[1:])
    pos = (np.repeat(rr * w + c0, lens)
           + (np.arange(span_total) - np.repeat(soffs, lens)))
    mask.ravel()[pos] = True


def _traverse_line(x0: float, y0: float, x1: float, y1: float):
    """Amanatides-Woo grid traversal: the exact pixel set a segment passes
    through, computed in GLOBAL pixel space so the result is independent of
    tile decomposition (corner crossings step diagonally, deterministically).
    Reference semantics: ALL_TOUCHED line walk, alg/gdalrasterize.cpp:717-751.
    """
    px, py = int(np.floor(x0)), int(np.floor(y0))
    dx, dy = x1 - x0, y1 - y0
    step_x = 1 if dx > 0 else -1
    step_y = 1 if dy > 0 else -1
    t_max_x = np.inf if dx == 0 else ((px + (1 if dx > 0 else 0)) - x0) / dx
    t_max_y = np.inf if dy == 0 else ((py + (1 if dy > 0 else 0)) - y0) / dy
    t_dx = np.inf if dx == 0 else abs(1.0 / dx)
    t_dy = np.inf if dy == 0 else abs(1.0 / dy)
    out = [(px, py)]
    # march boundary crossings in t; a pixel entered at t >= 1 is past the
    # endpoint (endpoint exactly ON a boundary touches but does not enter)
    while True:
        if t_max_x < t_max_y:
            t = t_max_x
            px += step_x
            t_max_x += t_dx
        elif t_max_y < t_max_x:
            t = t_max_y
            py += step_y
            t_max_y += t_dy
        else:  # exact corner: deterministic diagonal step
            t = t_max_x
            if t == np.inf:
                break
            px += step_x
            py += step_y
            t_max_x += t_dx
            t_max_y += t_dy
        if t >= 1.0:
            break
        out.append((px, py))
    return out


def _supercover_line(mask: np.ndarray, p0, p1):
    """Mark every pixel a segment passes through (local tile coords: the
    traversal itself runs in global space via the caller's pre-shift, which
    preserves integer pixel boundaries exactly)."""
    h, w = mask.shape
    for cx, cy in _traverse_line(p0[0], p0[1], p1[0], p1[1]):
        if 0 <= cx < w and 0 <= cy < h:
            mask[cy, cx] = True


def _burn_features_into_tile(
    tile_arr: np.ndarray,
    feats: list[tuple[int, "_wkb.Geom", float]],
    ox: int,
    oy: int,
    merge_add: bool,
    all_touched: bool,
):
    """feats: (feat_key, geom-in-pixel-space, burn_value), sorted by key."""
    h, w = tile_arr.shape
    scratch = np.zeros((h, w), dtype=bool)
    for _, geom, burn in feats:
        scratch[:] = False
        polys = geom.shells_and_holes()
        if polys:
            for rings in polys:
                inner = np.zeros((h, w), dtype=bool)
                _scanline_fill(inner, [np.asarray(r) - [ox, oy] for r in rings[:1]], 0.0, 0.0)
                for hole in rings[1:]:
                    hole_m = np.zeros((h, w), dtype=bool)
                    _scanline_fill(hole_m, [np.asarray(hole) - [ox, oy]], 0.0, 0.0)
                    inner &= ~hole_m
                scratch |= inner
                if all_touched:
                    for r in rings:
                        rr = np.asarray(r) - [ox, oy]
                        for i in range(len(rr) - 1):
                            _supercover_line(scratch, rr[i], rr[i + 1])
        elif geom.kind in (_wkb.LINESTRING, _wkb.MULTILINESTRING):
            # Geom stores LINESTRING as [pts] and MULTILINESTRING as
            # [pts, pts, ...] — both iterate as a list of parts
            for pts in geom.parts:
                pp = np.asarray(pts) - [ox, oy]
                for i in range(len(pp) - 1):
                    _supercover_line(scratch, pp[i], pp[i + 1])
        else:  # POINT / MULTIPOINT
            v = geom.vertices() - [ox, oy]
            cx = np.floor(v[:, 0]).astype(np.int64)
            cy = np.floor(v[:, 1]).astype(np.int64)
            ok = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
            scratch[cy[ok], cx[ok]] = True
        if merge_add:
            tile_arr[scratch] += burn
        else:
            tile_arr[scratch] = burn


def rasterize(
    features_ds,
    grid: GridSpec,
    burn_col: str = "burn_value",
    id_col: str = "feat_id",
    merge_alg: str = "replace",
    all_touched: bool = False,
    seed_all_tiles: bool = False,
):
    """Distributed rasterize.  Returns a Dataset of tile rows
    (tx, ty, width, height, data: float64 bytes, checksum: int64).

    Shuffle key = tile id; features are duplicated only to tiles their bbox
    covers (the distributed analogue of gdalrasterize's cache-sized row-band
    chunking, alg/gdalrasterize.cpp:1183-1197).

    ``seed_all_tiles``: also emit every grid tile NOT touched by any feature
    bbox (as all-nodata) — required by consumers that must see the full
    extent, e.g. gdal_rasterize -i (invert burns exactly those pixels).
    Seed rows carry null wkb and are skipped by the burn loop; int64 feature
    ids assumed when seeding.
    """
    gt = grid.gt
    tile = grid.tile

    def expand(batch: pa.Table) -> pa.Table:
        keys, tids, wkbs, burns = [], [], [], []
        for key, geom_wkb, burn in zip(
            batch[id_col].to_pylist(), batch["wkb"].to_pylist(), batch[burn_col].to_pylist()
        ):
            g = _wkb.decode(geom_wkb)
            v = g.vertices()
            px, py = grid.world_to_pixel(v[:, 0], v[:, 1])
            tx0 = max(0, int(np.floor(px.min() / tile)))
            tx1 = min(grid.ntx - 1, int(np.floor(px.max() / tile)))
            ty0 = max(0, int(np.floor(py.min() / tile)))
            ty1 = min(grid.nty - 1, int(np.floor(py.max() / tile)))
            for ty in range(ty0, ty1 + 1):
                for tx in range(tx0, tx1 + 1):
                    keys.append(key)
                    tids.append(ty * grid.ntx + tx)
                    wkbs.append(geom_wkb)
                    burns.append(burn)
        return pa.table(
            {
                "tile_id": pa.array(tids, pa.int64()),
                id_col: pa.array(keys),
                "wkb": pa.array(wkbs, pa.binary()),
                burn_col: pa.array(burns, pa.float64()),
            }
        )

    expanded = features_ds.map_batches(expand, batch_format="pyarrow")
    if seed_all_tiles:
        import ray.data as _rd

        n_tiles = grid.ntx * grid.nty
        seed = pa.table({
            "tile_id": pa.array(np.arange(n_tiles, dtype=np.int64)),
            id_col: pa.nulls(n_tiles, pa.int64()),
            "wkb": pa.nulls(n_tiles, pa.binary()),
            burn_col: pa.nulls(n_tiles, pa.float64()),
        })
        expanded = expanded.union(_rd.from_arrow(seed))

    def burn_tile(group: pa.Table) -> pa.Table:
        tid = int(group["tile_id"][0].as_py())
        tx, ty = tid % grid.ntx, tid // grid.ntx
        ox, oy = tx * tile, ty * tile
        w = min(tile, grid.width - ox)
        h = min(tile, grid.height - oy)
        arr = np.full((h, w), grid.nodata, dtype=np.float64)
        feats = []
        for key, geom_wkb, burn in zip(
            group[id_col].to_pylist(), group["wkb"].to_pylist(), group[burn_col].to_pylist()
        ):
            if geom_wkb is None:  # seed row (seed_all_tiles)
                continue
            g = _wkb.decode(geom_wkb)
            # to pixel space
            parts_px = _geom_to_pixel(g, gt)
            feats.append((key, parts_px, float(burn)))
        feats.sort(key=lambda t: t[0])
        _burn_features_into_tile(arr, feats, ox, oy, merge_alg == "add", all_touched)
        return pa.table(
            {
                "tx": pa.array([tx], pa.int32()),
                "ty": pa.array([ty], pa.int32()),
                "width": pa.array([w], pa.int32()),
                "height": pa.array([h], pa.int32()),
                "data": pa.array([arr.tobytes()], pa.binary()),
                "checksum": pa.array(
                    [cks.tile_checksum(arr, ox, oy, grid.width)], pa.int64()
                ),
            }
        )

    return expanded.groupby("tile_id").map_groups(burn_tile, batch_format="pyarrow")


def _geom_to_pixel(g: "_wkb.Geom", gt) -> "_wkb.Geom":
    """Transform a geometry's coordinates world -> pixel space
    (same math as GridSpec.world_to_pixel, applied per vertex array)."""

    def tx(arr):
        out = np.empty_like(arr)
        out[:, 0] = (arr[:, 0] - gt[0]) / gt[1]
        out[:, 1] = (arr[:, 1] - gt[3]) / gt[5]
        return out

    if g.kind == _wkb.POLYGON:
        return _wkb.Geom(g.kind, [[tx(r) for r in g.parts[0]]])
    if g.kind == _wkb.MULTIPOLYGON:
        return _wkb.Geom(g.kind, [[tx(r) for r in rings] for rings in g.parts])
    return _wkb.Geom(g.kind, [tx(p) for p in g.parts])


def mosaic_checksum(tiles_ds) -> int:
    """Global checksum from per-tile partials (order-independent)."""
    parts = [r["checksum"] for r in tiles_ds.select_columns(["checksum"]).take_all()]
    return cks.combine_checksums(parts)


def assemble_array(tiles_ds, grid: GridSpec, dtype=np.float64) -> np.ndarray:
    """Test helper: mosaic the tile rows into one array (small grids only)."""
    out = np.full((grid.height, grid.width), grid.nodata, dtype=dtype)
    for r in tiles_ds.take_all():
        ox, oy = r["tx"] * grid.tile, r["ty"] * grid.tile
        arr = np.frombuffer(r["data"], dtype=np.float64).reshape(r["height"], r["width"])
        out[oy : oy + r["height"], ox : ox + r["width"]] = arr
    return out
