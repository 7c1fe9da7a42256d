"""Zonal statistics: raster/point x vector join + aggregate.

Reference: ``alg/zonal.cpp`` (per-zone count/min/max/mean/sum/...,
FEATURE_SEQUENTIAL vs RASTER_SEQUENTIAL strategies, :201-208, stat names
:661-701).  Ray-Data shape: the zone join is the broadcast spatial join
(points/pixels -> zone_id), then a pre-aggregated ``groupby(zone_id)``.

Stats are exact scaled integers (see relational.py numeric policy).
"""

from __future__ import annotations

import pyarrow as pa

from .join import broadcast_spatial_join
from .relational import partial_aggregate


def zonal_stats(
    points_ds,
    zones: pa.Table,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    predicate: str = "intersects",
    concurrency: int | tuple = 4,
):
    """Per-zone count / sum / min / max of an integer value column.

    Output: (zone_id, n_docs, {value}_sum, {value}_min, {value}_max).
    """
    pairs = broadcast_spatial_join(
        points_ds,
        zones,
        predicate=predicate,
        id_col=id_col,
        concurrency=concurrency,
        emit_cols=(value_col,),
    )
    return partial_aggregate(
        pairs,
        ["zone_id"],
        sums=[value_col],
        mins=[value_col],
        maxs=[value_col],
        count_alias="n_docs",
    )


def zonal_stats_dense(
    points_ds,
    zones: pa.Table,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    predicate: str = "intersects",
    concurrency: int | tuple = 8,
    batch_size: int = 32768,
) -> pa.Table:
    """Dense-key zonal aggregate: the scale plan when the zone count is
    bounded (the usual GDAL zonal case — zones are a layer, not a corpus).

    The per-zone reduction is PUSHED INTO the join actor (``zonal_reduce_col``
    on BroadcastPointJoin): each batch's matches collapse to fixed-length
    count/sum/min/max vectors inside the same actor, so the O(pairs) match set
    (~10x the input here) never crosses the object store.  The final combine
    is a tiny driver-side vector sum (merging histogram partials, SURVEY
    §2.5).  Without the pushdown, the pair materialization dominates the whole
    pipeline (measured: 314M pair rows for 32M docs).
    """
    import numpy as np

    from .join import broadcast_spatial_join

    n_zones = zones.num_rows
    partials = broadcast_spatial_join(
        points_ds,
        zones,
        predicate=predicate,
        id_col=id_col,
        concurrency=concurrency,
        batch_size=batch_size,
        zonal_reduce_col=value_col,
    )
    # tree reduce: merge partial vectors WITHIN each block first (one row out
    # per ~64 input partials), so the driver folds O(blocks/64) vectors instead
    # of one per batch — at 1M+ zones x thousands of batches the flat fold
    # would move GBs through the driver
    def merge_block(t: pa.Table) -> pa.Table:
        c = np.zeros(n_zones, dtype=np.int64)
        s = np.zeros(n_zones, dtype=np.int64)
        lo = np.full(n_zones, np.iinfo(np.int64).max, dtype=np.int64)
        hi = np.full(n_zones, np.iinfo(np.int64).min, dtype=np.int64)
        for i in range(t.num_rows):
            c += np.frombuffer(t["cnt"][i].as_py(), dtype=np.int64)
            s += np.frombuffer(t["sm"][i].as_py(), dtype=np.int64)
            lo = np.minimum(lo, np.frombuffer(t["mn"][i].as_py(), dtype=np.int64))
            hi = np.maximum(hi, np.frombuffer(t["mx"][i].as_py(), dtype=np.int64))
        return pa.table({"cnt": pa.array([c.tobytes()], pa.binary()),
                         "sm": pa.array([s.tobytes()], pa.binary()),
                         "mn": pa.array([lo.tobytes()], pa.binary()),
                         "mx": pa.array([hi.tobytes()], pa.binary())})

    partial_rows = partials.map_batches(
        merge_block, batch_format="pyarrow", batch_size=64
    ).take_all()
    cnt = np.zeros(n_zones, dtype=np.int64)
    sm = np.zeros(n_zones, dtype=np.int64)
    mn = np.full(n_zones, np.iinfo(np.int64).max, dtype=np.int64)
    mx = np.full(n_zones, np.iinfo(np.int64).min, dtype=np.int64)
    for r in partial_rows:
        cnt += np.frombuffer(r["cnt"], dtype=np.int64)
        sm += np.frombuffer(r["sm"], dtype=np.int64)
        mn = np.minimum(mn, np.frombuffer(r["mn"], dtype=np.int64))
        mx = np.maximum(mx, np.frombuffer(r["mx"], dtype=np.int64))
    hit = cnt > 0
    idx = np.nonzero(hit)[0]
    zone_ids = zones["zone_id"].take(pa.array(idx))
    return pa.table(
        {
            "zone_id": zone_ids,
            "n_docs": pa.array(cnt[idx]),
            f"{value_col}_sum": pa.array(sm[idx]),
            f"{value_col}_min": pa.array(mn[idx]),
            f"{value_col}_max": pa.array(mx[idx]),
        }
    )
