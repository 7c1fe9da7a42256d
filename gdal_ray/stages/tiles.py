"""Tile-assignment stage — the engine's flagship map stage.

Re-answers the tile-index computation of ``gdal raster tile``
(``apps/gdalalg_raster_tile.cpp:435`` GetTileIndices) and gdal2tiles as a pure
vectorized ``map_batches`` over zero-copy Arrow batches: each document gets its
XYZ tile address + cell id per requested zoom.  Span columns pass through
untouched (per-row span-sequence invariant, BASELINE.json input_hint).

Scale notes: stateless tasks, no shuffle, column-pruned input — this stage
streams at memory-bandwidth and is the numerator of the headline docs/sec
metric.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geo


def derive_geometry_batch(batch: pa.Table, key_col: str = "doc_id") -> pa.Table:
    """Attach lon/lat derived from the int64 (or 'doc-%09d' string) key column.
    Pre-existing lon/lat columns are kept as-is (and nothing is recomputed)."""
    has_lon = "lon" in batch.column_names
    has_lat = "lat" in batch.column_names
    if has_lon and has_lat:
        return batch
    col = batch[key_col]
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        from ..sources.synthetic import doc_id_to_key

        keys = doc_id_to_key(col)
    else:
        keys = col.to_numpy(zero_copy_only=False).astype(np.int64)
    lon, lat = geo.derive_lonlat(keys)
    out = batch
    if not has_lon:
        out = out.append_column("lon", pa.array(lon))
    if not has_lat:
        out = out.append_column("lat", pa.array(lat))
    return out


def assign_tiles_batch(batch: pa.Table, zooms, with_cell: bool = True) -> pa.Table:
    """Add tx_{z}, ty_{z} (+ cell_{z} row-major cell id) per zoom level."""
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    out = batch
    for z in zooms:
        tx, ty = geo.lonlat_to_tile(lon, lat, z)
        out = out.append_column(f"tx_{z}", pa.array(tx))
        out = out.append_column(f"ty_{z}", pa.array(ty))
        if with_cell:
            # row-major id (SQL-mirrorable: tx * 2^z + ty); the engine's
            # internal Morton cell ids are geo.cell_id — used for partitioning
            out = out.append_column(f"cell_{z}", pa.array(tx * np.int64(1 << z) + ty))
    return out


def assign_tiles(ds, zooms=(8,), key_col: str = "doc_id", with_cell: bool = True):
    """Dataset stage: derive geometry (if needed) + tile assignment."""

    def fn(batch: pa.Table) -> pa.Table:
        return assign_tiles_batch(derive_geometry_batch(batch, key_col), zooms, with_cell)

    return ds.map_batches(fn, batch_format="pyarrow")


def quad_cell_cover(zones_ds, max_level: int = 8):
    """S2/H3-RegionCoverer-role quadtree cell cover (north-star surface;
    reference analogue: the tile-index walk of apps/gdalalg_raster_tile.cpp):
    each zone rectangle gets a MIXED-LEVEL set of XYZ cells — cells fully
    inside the zone emit at the coarsest level that fits ('contained'),
    boundary cells subdivide down to ``max_level`` ('partial').

    Fully vectorized level-synchronous BFS: one frontier array per level for
    the WHOLE batch (np.repeat fan-out to 4 children), no per-zone Python.
    Output: (zone_key, z, x, y, contained).
    """

    def cover(t: pa.Table) -> pa.Table:
        minx = t["minx"].to_numpy(zero_copy_only=False)
        miny = t["miny"].to_numpy(zero_copy_only=False)
        maxx = t["maxx"].to_numpy(zero_copy_only=False)
        maxy = t["maxy"].to_numpy(zero_copy_only=False)
        keys = t["zone_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.num_rows

        def clamp01(f):
            return np.minimum(np.maximum(f, 0.0), 1.0)

        def merc_y(lat):
            return (1.0 - np.log(np.tan(np.radians(lat))
                                 + 1.0 / np.cos(np.radians(lat))) / np.pi) / 2.0

        f0x0 = clamp01((minx + 180.0) / 360.0)
        f0x1 = clamp01((maxx + 180.0) / 360.0)
        f0y0 = clamp01(merc_y(maxy))  # top of rect = smaller tile y
        f0y1 = clamp01(merc_y(miny))

        r = np.arange(n, dtype=np.int64)
        x = np.zeros(n, dtype=np.int64)
        y = np.zeros(n, dtype=np.int64)
        out_k, out_z, out_x, out_y, out_c = [], [], [], [], []
        for z in range(max_level + 1):
            s = float(1 << z)
            fx0, fx1 = f0x0[r] * s, f0x1[r] * s
            fy0, fy1 = f0y0[r] * s, f0y1[r] * s
            inter = (x + 1 > fx0) & (x < fx1) & (y + 1 > fy0) & (y < fy1)
            cont = (x >= fx0) & (x + 1 <= fx1) & (y >= fy0) & (y + 1 <= fy1)
            done = inter & (cont | (z == max_level))
            if done.any():
                out_k.append(keys[r[done]])
                out_z.append(np.full(int(done.sum()), z, dtype=np.int64))
                out_x.append(x[done])
                out_y.append(y[done])
                out_c.append(cont[done].astype(np.int64))
            live = inter & ~cont & (z < max_level)
            if not live.any():
                break
            r = np.repeat(r[live], 4)
            cx = np.repeat(2 * x[live], 4) + np.tile([0, 1, 0, 1], int(live.sum()))
            cy = np.repeat(2 * y[live], 4) + np.tile([0, 0, 1, 1], int(live.sum()))
            x, y = cx, cy
        return pa.table({
            "zone_key": pa.array(np.concatenate(out_k) if out_k else np.array([], np.int64)),
            "z": pa.array(np.concatenate(out_z) if out_z else np.array([], np.int64)),
            "x": pa.array(np.concatenate(out_x) if out_x else np.array([], np.int64)),
            "y": pa.array(np.concatenate(out_y) if out_y else np.array([], np.int64)),
            "contained": pa.array(np.concatenate(out_c) if out_c else np.array([], np.int64)),
        })

    return zones_ds.map_batches(cover, batch_format="pyarrow")
