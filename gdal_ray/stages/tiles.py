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
