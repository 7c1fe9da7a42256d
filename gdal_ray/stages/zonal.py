"""Zonal statistics: raster/point x vector join + aggregate.

Reference: ``alg/zonal.cpp`` (per-zone count/min/max/mean/sum/...,
FEATURE_SEQUENTIAL vs RASTER_SEQUENTIAL strategies, :201-208, stat names
:661-701).  Ray-Data shape: the zone join is the broadcast spatial join
(points/pixels -> zone_id), then a pre-aggregated ``groupby(zone_id)``.

Stats are exact scaled integers (see relational.py numeric policy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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

    # two tree levels (64^2 partials collapse to one row) so the driver-side
    # fold below touches O(1) vectors even at thousands of batches — the
    # serial tail at high parallelism is one vector read, not a fold loop
    partial_rows = partials.map_batches(
        merge_block, batch_format="pyarrow", batch_size=64
    ).map_batches(
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


def zonal_stats_extended(
    points_ds,
    zones: pa.Table,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    predicate: str = "intersects",
    concurrency: int | tuple = 4,
):
    """Per-zone mean/stddev as EXACT integer sufficient statistics.

    GDAL's zonal mean/stddev (``alg/zonal.cpp:661-701``) emit floats; to keep
    the bit-stable hash policy we emit n, sum(v), and the variance numerator
    ``var_num = n * sum(v^2) - sum(v)^2`` (population variance = var_num/n^2,
    mean = sum/n) — all reductions are order-invariant int64 sums.  int64
    bound: |v| < ~3e4 with <1e6 rows/zone stays well inside 2^63.
    """

    def add_sq(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.int64())
        return t.append_column("_v2", pc.multiply(v, v))

    pairs = broadcast_spatial_join(
        points_ds,
        zones,
        predicate=predicate,
        id_col=id_col,
        concurrency=concurrency,
        emit_cols=(value_col,),
    ).map_batches(add_sq, batch_format="pyarrow")
    agg = partial_aggregate(
        pairs, ["zone_id"], sums=[value_col, "_v2"], count_alias="n_docs"
    )

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_docs"], pa.int64())
        s = pc.cast(t[f"{value_col}_sum"], pa.int64())
        s2 = pc.cast(t["_v2_sum"], pa.int64())
        var_num = pc.subtract(pc.multiply(n, s2), pc.multiply(s, s))
        return pa.table(
            {
                "zone_id": t["zone_id"],
                "n_docs": n,
                f"{value_col}_sum": s,
                "var_num": var_num,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def zonal_value_modes(
    points_ds,
    zones: pa.Table,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    predicate: str = "intersects",
    concurrency: int | tuple = 4,
    num_partitions: int = 64,
):
    """Per-zone MAJORITY / MINORITY value (stat names ``alg/zonal.cpp:661-701``):
    the most / least frequent value in the zone; ties resolve to the SMALLEST
    value (mirrors SQL ``row_number() OVER (... ORDER BY cnt DESC|ASC, v ASC)``).

    Scale shape: join pairs -> two-phase (zone, value) count (the per-batch
    combiner shrinks the shuffle to unique pairs per block) -> ONE hash
    shuffle of the already-global counts -> a single vectorized lexsort per
    partition resolves both extremes for every zone in it.  No per-key Python
    callback; the shuffle moves O(zones x distinct values) rows, not O(rows).
    """
    pairs = broadcast_spatial_join(
        points_ds,
        zones,
        predicate=predicate,
        id_col=id_col,
        concurrency=concurrency,
        emit_cols=(value_col,),
        emit_zone_index=True,
    )
    counts = partial_aggregate(pairs, ["zone_idx", value_col], count_alias="cnt")

    def tag(t: pa.Table) -> pa.Table:
        k = t["zone_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.abs((k * np.int64(2654435761)) % np.int64(num_partitions))
        return t.append_column("_part", pa.array(part))

    def per_part(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_part"])
        if g.num_rows == 0:
            return pa.table(
                {
                    "zone_idx": pa.array([], pa.int32()),
                    "majority_val": pa.array([], pa.int64()),
                    "minority_val": pa.array([], pa.int64()),
                }
            )
        k = g["zone_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        omaj = np.lexsort((v, -c, k))
        kmaj = k[omaj]
        first = np.r_[True, kmaj[1:] != kmaj[:-1]]
        omin = np.lexsort((v, c, k))
        firstn = np.r_[True, k[omin][1:] != k[omin][:-1]]
        return pa.table(
            {
                "zone_idx": pa.array(kmaj[first].astype(np.int32)),
                "majority_val": pa.array(v[omaj][first]),
                "minority_val": pa.array(v[omin][firstn]),
            }
        )

    modes = (
        counts.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )
    zone_ids = zones["zone_id"].combine_chunks()

    def resolve(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "zone_id": zone_ids.take(t["zone_idx"]),
                "majority_val": t["majority_val"],
                "minority_val": t["minority_val"],
            }
        )

    return modes.map_batches(resolve, batch_format="pyarrow")
