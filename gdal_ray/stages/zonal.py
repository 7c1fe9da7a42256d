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
