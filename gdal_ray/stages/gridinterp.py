"""Grid / interpolation (points -> raster) — the gdal_grid family.

Reference: ``alg/gdalgrid.cpp`` algorithms ``GGA_*`` (``alg/gdal_alg.h:402-416``):
inverse-distance (:GDALGridInverseDistanceToAPower), nearest
(:GDALGridNearestNeighbor :905), moving average, data metrics
(count/min/max/avg-distance).  SSE/AVX kernels are replaced by numpy.

Ray-Data shape (SURVEY §2.8): points are flat_mapped to every output tile
whose search-radius halo they fall in (duplication instead of neighbor
communication), then ``groupby(tile).map_groups`` computes the full tile cell
grid vectorized against the group's points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import checksum as cks


def tiles_to_cells(tiles_ds, grid: "InterpGrid", value_name: str,
                   finite_only: bool = False):
    """Lazy tile -> (cx, cy, value:int64) cell-row expansion (shared by the
    grid_count / grid_metrics queries).  finite_only drops NaN cells (the
    data-metric validity convention)."""

    def to_cells(t: pa.Table) -> pa.Table:
        cxs, cys, vs = [], [], []
        for i in range(t.num_rows):
            h, w = t["height"][i].as_py(), t["width"][i].as_py()
            tx, ty = t["tx"][i].as_py(), t["ty"][i].as_py()
            arr = np.frombuffer(t["data"][i].as_py(), dtype=np.float64).reshape(h, w)
            gy, gx = np.mgrid[0:h, 0:w]
            m = np.isfinite(arr) if finite_only else np.ones(arr.shape, dtype=bool)
            cxs.append((gx[m] + tx * grid.tile).astype(np.int64))
            cys.append((gy[m] + ty * grid.tile).astype(np.int64))
            vs.append(arr[m].astype(np.int64))
        if not cxs:
            return pa.table({"cx": pa.array([], pa.int64()), "cy": pa.array([], pa.int64()),
                             value_name: pa.array([], pa.int64())})
        return pa.table({"cx": pa.array(np.concatenate(cxs)),
                         "cy": pa.array(np.concatenate(cys)),
                         value_name: pa.array(np.concatenate(vs))})

    return tiles_ds.map_batches(to_cells, batch_format="pyarrow")


def delaunay_triangulate(pts: np.ndarray) -> list:
    """Bowyer-Watson incremental Delaunay triangulation (public algorithm;
    reference surface: alg/delaunay.c).  Returns triangle index triples.
    O(n^2) — intended for per-tile(+halo) point sets, not whole corpora."""
    n = len(pts)
    if n < 3:
        return []
    # super-triangle enclosing everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1e-9) * 20.0
    sp = np.array([[cx - span, cy - span], [cx + span, cy - span], [cx, cy + span]])
    P = np.vstack([pts, sp])
    tris = [(n, n + 1, n + 2)]

    def circum(tri):
        a, b, c = P[tri[0]], P[tri[1]], P[tri[2]]
        d = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        if d == 0:
            return (0.0, 0.0), np.inf
        ux = ((a[0] ** 2 + a[1] ** 2) * (b[1] - c[1]) + (b[0] ** 2 + b[1] ** 2) * (c[1] - a[1])
              + (c[0] ** 2 + c[1] ** 2) * (a[1] - b[1])) / d
        uy = ((a[0] ** 2 + a[1] ** 2) * (c[0] - b[0]) + (b[0] ** 2 + b[1] ** 2) * (a[0] - c[0])
              + (c[0] ** 2 + c[1] ** 2) * (b[0] - a[0])) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        return (ux, uy), r2

    circs = {tris[0]: circum(tris[0])}
    for i in range(n):
        px, py = P[i]
        bad = []
        for t in tris:
            (ux, uy), r2 = circs[t]
            if (px - ux) ** 2 + (py - uy) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t)
        # boundary of the cavity = edges appearing exactly once among bad tris
        edge_count: dict = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        for t in bad:
            tris.remove(t)
            circs.pop(t, None)
        for (a, b), cnt in edge_count.items():
            if cnt == 1:
                nt = (a, b, i)
                tris.append(nt)
                circs[nt] = circum(nt)
    out = [t for t in tris if max(t) < n]
    return out


def linear_interpolate_cells(pts: np.ndarray, vals: np.ndarray,
                             cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Barycentric (Delaunay-linear, GGA_Linear) interpolation of cell
    centers; NaN outside the triangulation's hull.  Each triangle evaluates
    only the cells inside its bbox (triangles are small vs the tile, so this
    is the O(total-coverage) path, not O(tris x cells))."""
    out = np.full(cx.shape, np.nan)
    tris = delaunay_triangulate(pts)
    for (i, j, k) in tris:
        a, b, c = pts[i], pts[j], pts[k]
        if not (np.isfinite(vals[i]) and np.isfinite(vals[j]) and np.isfinite(vals[k])):
            continue
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if det == 0:
            continue
        xs = (a[0], b[0], c[0])
        ys = (a[1], b[1], c[1])
        sel = np.flatnonzero(
            (cx >= min(xs) - 1e-12) & (cx <= max(xs) + 1e-12)
            & (cy >= min(ys) - 1e-12) & (cy <= max(ys) + 1e-12) & np.isnan(out)
        )
        if sel.size == 0:
            continue
        sx, sy = cx[sel], cy[sel]
        l1 = ((b[1] - c[1]) * (sx - c[0]) + (c[0] - b[0]) * (sy - c[1])) / det
        l2 = ((c[1] - a[1]) * (sx - c[0]) + (a[0] - c[0]) * (sy - c[1])) / det
        l3 = 1.0 - l1 - l2
        inside = (l1 >= -1e-12) & (l2 >= -1e-12) & (l3 >= -1e-12)
        tgt = sel[inside]
        out[tgt] = l1[inside] * vals[i] + l2[inside] * vals[j] + l3[inside] * vals[k]
    return out


class InterpGrid:
    """Output grid spec: world bbox + cells, tiled."""

    def __init__(self, x0, y0, x1, y1, nx, ny, tile: int = 64):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.nx, self.ny = nx, ny
        self.dx = (x1 - x0) / nx
        self.dy = (y1 - y0) / ny
        self.tile = tile
        self.ntx = (nx + tile - 1) // tile
        self.nty = (ny + tile - 1) // tile


def grid_interpolate(
    points_ds,
    grid: InterpGrid,
    algorithm: str = "invdist",
    radius: float = 0.0,
    power: float = 2.0,
    x_col: str = "lon",
    y_col: str = "lat",
    v_col: str = "value",
    seed_all_tiles: bool = False,
    min_points_per_quadrant: int = 0,
    max_points: int = 12,
):
    """algorithm: 'invdist' | 'invdistnn' | 'nearest' | 'average' | 'count' | 'linear'
    (Delaunay barycentric) | 'minimum' | 'maximum' | 'range' |
    'average_distance' (the GGA_* / data-metric set, alg/gdal_alg.h:402-416);
    min_points_per_quadrant applies the per-quadrant validity constraint of
    the data metrics.
    radius = search radius in world units (0 => invdist uses all points in
    tile+halo — halo must then cover the data extent, so pass a radius for
    distributed runs; nearest uses the nearest point within tile+halo).
    seed_all_tiles: emit every output tile even when no point falls in its
    halo (NaN seed rows union'd in; they never satisfy a radius test)."""
    if seed_all_tiles and radius <= 0:
        # with radius=0 every point (incl. the NaN seeds) enters every cell's
        # aggregate — the seeds would poison the grid
        raise ValueError("seed_all_tiles requires a positive search radius")
    halo = radius if radius > 0 else max(grid.dx, grid.dy) * grid.tile

    def expand(batch: pa.Table) -> pa.Table:
        px = batch[x_col].to_numpy(zero_copy_only=False)
        py = batch[y_col].to_numpy(zero_copy_only=False)
        pv = batch[v_col].to_numpy(zero_copy_only=False).astype(np.float64)
        tx0 = np.clip(((px - halo - grid.x0) / (grid.dx * grid.tile)).astype(np.int64), 0, grid.ntx - 1)
        tx1 = np.clip(((px + halo - grid.x0) / (grid.dx * grid.tile)).astype(np.int64), 0, grid.ntx - 1)
        ty0 = np.clip(((py - halo - grid.y0) / (grid.dy * grid.tile)).astype(np.int64), 0, grid.nty - 1)
        ty1 = np.clip(((py + halo - grid.y0) / (grid.dy * grid.tile)).astype(np.int64), 0, grid.nty - 1)
        rows = {"tile_id": [], "px": [], "py": [], "pv": []}
        for i in range(len(px)):
            for ty in range(ty0[i], ty1[i] + 1):
                for tx in range(tx0[i], tx1[i] + 1):
                    rows["tile_id"].append(ty * grid.ntx + tx)
                    rows["px"].append(px[i])
                    rows["py"].append(py[i])
                    rows["pv"].append(pv[i])
        return pa.table(
            {
                "tile_id": pa.array(rows["tile_id"], pa.int64()),
                "px": pa.array(rows["px"], pa.float64()),
                "py": pa.array(rows["py"], pa.float64()),
                "pv": pa.array(rows["pv"], pa.float64()),
            }
        )

    expanded = points_ds.map_batches(expand, batch_format="pyarrow")
    if seed_all_tiles:
        import ray.data as rd

        ntiles = grid.ntx * grid.nty
        nanv = np.full(ntiles, np.nan)
        seeds = pa.table(
            {
                "tile_id": pa.array(np.arange(ntiles, dtype=np.int64)),
                "px": pa.array(nanv), "py": pa.array(nanv), "pv": pa.array(nanv),
            }
        )
        expanded = expanded.union(rd.from_arrow(seeds))

    def per_tile(group: pa.Table) -> pa.Table:
        tid = int(group["tile_id"][0].as_py())
        tx, ty = tid % grid.ntx, tid // grid.ntx
        w = min(grid.tile, grid.nx - tx * grid.tile)
        h = min(grid.tile, grid.ny - ty * grid.tile)
        cx = grid.x0 + (tx * grid.tile + np.arange(w) + 0.5) * grid.dx
        cy = grid.y0 + (ty * grid.tile + np.arange(h) + 0.5) * grid.dy
        gx, gy = np.meshgrid(cx, cy)
        px = group["px"].to_numpy(zero_copy_only=False)
        py = group["py"].to_numpy(zero_copy_only=False)
        pv = group["pv"].to_numpy(zero_copy_only=False)
        # drop the NaN seed rows by construction (they are inert for the
        # radius algorithms but would poison the Delaunay triangulation)
        fin = np.isfinite(px) & np.isfinite(py)
        px, py, pv = px[fin], py[fin], pv[fin]
        if px.size == 0:
            arr = (np.zeros((h, w)) if algorithm == "count"
                   else np.full((h, w), np.nan))
            return pa.table(
                {"tx": pa.array([tx], pa.int32()), "ty": pa.array([ty], pa.int32()),
                 "width": pa.array([w], pa.int32()), "height": pa.array([h], pa.int32()),
                 "data": pa.array([arr.tobytes()], pa.binary()),
                 "checksum": pa.array([cks.tile_checksum(np.nan_to_num(arr))], pa.int64())}
            )
        d2 = (gx.ravel()[:, None] - px[None, :]) ** 2 + (gy.ravel()[:, None] - py[None, :]) ** 2
        if radius > 0:
            in_r = d2 <= radius * radius
        else:
            in_r = np.ones_like(d2, dtype=bool)
        if algorithm == "nearest":
            j = np.argmin(np.where(in_r, d2, np.inf), axis=1)
            any_in = in_r.any(axis=1)
            out = np.where(any_in, pv[j], np.nan)
        elif algorithm == "invdist":
            w_ = np.where(in_r, 1.0 / np.maximum(d2, 1e-300) ** (power / 2.0), 0.0)
            exact = (d2 <= 1e-24) & in_r
            has_exact = exact.any(axis=1)
            wsum = w_.sum(axis=1)
            out = np.where(wsum > 0, (w_ * pv[None, :]).sum(axis=1) / np.where(wsum == 0, 1, wsum), np.nan)
            if has_exact.any():
                je = np.argmax(exact, axis=1)
                out = np.where(has_exact, pv[je], out)
        elif algorithm == "invdistnn":
            # GDALGridInverseDistanceToAPowerNearestNeighbor
            # (alg/gdalgrid.cpp; gdalalg_vector_grid_invdistnn.cpp surface):
            # weights only the max_points NEAREST in-radius points
            d2m = np.where(in_r, d2, np.inf)
            k = int(min(max_points, d2m.shape[1]))
            if k <= 0:  # max_points=0 or zero candidates -> all nodata
                out = np.full(d2m.shape[0], np.nan)
            else:
                idx = np.argpartition(d2m, k - 1, axis=1)[:, :k]
                ri = np.arange(d2m.shape[0])[:, None]
                dk = d2m[ri, idx]
                vk = pv[idx]
                wk = np.where(np.isfinite(dk),
                              1.0 / np.maximum(dk, 1e-300) ** (power / 2.0),
                              0.0)
                wsum = wk.sum(axis=1)
                out = np.where(wsum > 0,
                               (wk * vk).sum(axis=1)
                               / np.where(wsum == 0, 1, wsum), np.nan)
                exact = (dk <= 1e-24) & np.isfinite(dk)
                has_exact = exact.any(axis=1)
                if has_exact.any():
                    je = np.argmax(exact, axis=1)
                    out = np.where(has_exact, vk[np.arange(len(vk)), je],
                                   out)
        elif algorithm == "average":
            n = in_r.sum(axis=1)
            out = np.where(n > 0, np.where(in_r, pv[None, :], 0.0).sum(axis=1) / np.maximum(n, 1), np.nan)
        elif algorithm == "count":
            out = in_r.sum(axis=1).astype(np.float64)
        elif algorithm in ("minimum", "maximum", "range"):
            vmin = np.where(in_r, pv[None, :], np.inf).min(axis=1)
            vmax = np.where(in_r, pv[None, :], -np.inf).max(axis=1)
            any_in = in_r.any(axis=1)
            if algorithm == "minimum":
                out = np.where(any_in, vmin, np.nan)
            elif algorithm == "maximum":
                out = np.where(any_in, vmax, np.nan)
            else:
                out = np.where(any_in, vmax - vmin, np.nan)
        elif algorithm == "average_distance":
            n = in_r.sum(axis=1)
            dsum = np.where(in_r, np.sqrt(d2), 0.0).sum(axis=1)
            out = np.where(n > 0, dsum / np.maximum(n, 1), np.nan)
        elif algorithm == "linear":
            # GGA_Linear (alg/delaunay.c role): barycentric interpolation on
            # the tile(+halo) point set's Delaunay triangulation.  Halo must
            # exceed the largest expected triangle edge for cross-tile
            # continuity (the documented partitioning assumption).
            pts_l = np.column_stack([px, py])
            out = linear_interpolate_cells(pts_l, pv, gx.ravel(), gy.ravel())
        else:
            raise ValueError(algorithm)
        if min_points_per_quadrant > 0:
            # GGA data-metric quadrant constraint (alg/gdalgrid.cpp): a cell
            # is valid only if every quadrant around it holds >= K in-radius
            # points; else nodata (NaN)
            qx = px[None, :] >= gx.ravel()[:, None]
            qy = py[None, :] >= gy.ravel()[:, None]
            ok = np.ones(out.shape, dtype=bool)
            for qmask in (qx & qy, qx & ~qy, ~qx & qy, ~qx & ~qy):
                ok &= (in_r & qmask).sum(axis=1) >= min_points_per_quadrant
            out = np.where(ok, out, np.nan)
        arr = out.reshape(h, w)
        return pa.table(
            {
                "tx": pa.array([tx], pa.int32()),
                "ty": pa.array([ty], pa.int32()),
                "width": pa.array([w], pa.int32()),
                "height": pa.array([h], pa.int32()),
                "data": pa.array([arr.tobytes()], pa.binary()),
                "checksum": pa.array([cks.tile_checksum(np.nan_to_num(arr))], pa.int64()),
            }
        )

    return expanded.groupby("tile_id").map_groups(per_tile, batch_format="pyarrow")
