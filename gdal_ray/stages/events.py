"""Stream-shaped operators over the ordered events log.

The reference has no event-time machinery (SURVEY §2.12); these are the
batch-semantics equivalents the brief asks for: tumbling-window aggregates
(GROUP BY floor(epoch/window)) and an as-of join (each event matched to the
latest orders row of the same key at or before its timestamp).

Ordering contract: windows are pure keyed aggregates (order-free); the as-of
join sorts within (key) groups only — no global ordering assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .relational import partial_aggregate


def _epoch_us(col) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    return arr.astype("datetime64[us]").astype(np.int64)


def tumbling_window(ds, window_s: int = 3600, ts_col: str = "ts", key_col: str = "event_type"):
    """Count + exact value-cents sum per (key, window).

    window_id = floor(epoch_seconds / window_s) — integer arithmetic, SQL
    mirror: CAST(floor(epoch(ts)/W) AS BIGINT).
    """

    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sec = _epoch_us(batch[ts_col]) // 1_000_000
        wid = sec // window_s
        # half-away-from-zero to match SQL round() (see relational.py policy)
        value_c = pc.cast(
            pc.round(
                pc.multiply(batch["value"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                key_col: batch[key_col],
                "window_id": pa.array(wid),
                "value_cents": value_c,
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return partial_aggregate(
        tagged, [key_col, "window_id"], sums=["value_cents"], count_alias="n_events"
    )


def sliding_window(ds, window_s: int, step_s: int, ts_col: str = "ts", key_col: str = "event_type"):
    """Sliding windows: an event at second ``sec`` belongs to every window id
    w with w*step <= sec < w*step + window (flat_map to window ids ->
    pre-aggregated groupby).  Handles window_s not divisible by step_s: the
    per-event window count then varies by alignment."""
    max_windows = -(-window_s // step_s)  # ceil

    def tag(batch: pa.Table) -> pa.Table:
        sec = _epoch_us(batch[ts_col]) // 1_000_000
        base = sec // step_s
        keys_all, wids_all = [], []
        key_list = batch[key_col].to_pylist()
        for j in range(max_windows):
            wid = base - j
            keep = wid * step_s + window_s > sec  # window still covers sec
            wids_all.append(wid[keep])
            keys_all.extend(k for k, m in zip(key_list, keep) if m)
        return pa.table(
            {
                key_col: pa.array(keys_all),
                "window_id": pa.array(np.concatenate(wids_all)),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return partial_aggregate(tagged, [key_col, "window_id"], count_alias="n_events")


def session_windows(ds, gap_s: int, ts_col: str = "ts", key_col: str = "user_id",
                    id_col: str = "event_id", num_partitions: int = 64):
    """Session windowing per key: a new session starts when the gap to the
    previous event exceeds gap_s.  Returns (user_id, n_sessions,
    max_session_events).  Ordering contract: (ts, event_id) per key.

    Scale shape: ONE shuffle on a hash partition of the key (not one Python
    callback per user) — each partition handles all its users in a single
    vectorized pass (lexsort + run-boundary cumsum + bincount/reduceat)."""

    def tag(batch: pa.Table) -> pa.Table:
        u = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (u * np.int64(2654435761)) % np.int64(num_partitions)
        return batch.append_column("_part", pa.array(np.abs(part)))

    empty = pa.table(
        {key_col: pa.array([], pa.int64()),
         "n_sessions": pa.array([], pa.int64()),
         "max_session_events": pa.array([], pa.int64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return empty
        u = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sec = _epoch_us(g[ts_col]) // 1_000_000
        eid = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, sec, u))
        u, sec = u[order], sec[order]
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        sess_start = new_user.copy()
        sess_start[1:] |= (sec[1:] - sec[:-1]) > gap_s
        sid = np.cumsum(sess_start) - 1
        sizes = np.bincount(sid)
        su = u[sess_start]  # user per session; sessions are contiguous per user
        ustart = np.flatnonzero(np.r_[True, su[1:] != su[:-1]])
        n_sessions = np.diff(np.r_[ustart, su.size])
        max_ev = np.maximum.reduceat(sizes, ustart)
        return pa.table(
            {
                key_col: pa.array(su[ustart]),
                "n_sessions": pa.array(n_sessions.astype(np.int64)),
                "max_session_events": pa.array(max_ev.astype(np.int64)),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("_part").map_groups(per_part, batch_format="pyarrow")


def asof_join(
    events_ds,
    right: pa.Table,
    left_key: str = "user_id",
    right_key: str = "o_custkey",
    left_ts: str = "ts",
    right_ts: str = "o_orderdate",
    emit: tuple = ("o_orderkey",),
):
    """As-of join: latest right row with right_ts <= left ts per key.

    Physical plan: broadcast the (small) right table sorted per key; per batch
    use ``pd.merge_asof`` — vectorized backward search.  For a large right
    side this becomes a co-partitioned groupby(key).map_groups with the same
    per-group merge_asof body.
    """
    import ray

    # tie-break duplicate right_ts per key deterministically: merge_asof takes
    # the LAST matching row, so sorting by (right_ts, emit cols) makes the
    # winner the max emit value — mirrored in the SQL oracle's row_number()
    rdf = right.to_pandas().sort_values([right_ts, *emit], kind="stable")
    ref = ray.put(rdf)

    class AsofJoiner:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.sort_values(left_ts, kind="stable")
            out = pd.merge_asof(
                b,
                self.right[[right_key, right_ts, *emit]],
                left_on=left_ts,
                right_on=right_ts,
                left_by=left_key,
                right_by=right_key,
                direction="backward",
            )
            # merge_asof keeps BOTH by-columns; drop the right-side key (it
            # duplicates left_key) along with the right timestamp
            drop = [right_ts] + ([right_key] if right_key != left_key else [])
            return out.drop(columns=drop)

    return events_ds.map_batches(AsofJoiner, batch_format="pandas", concurrency=2)


def asof_join_partitioned(
    events_ds,
    right_ds,
    left_key: str = "user_id",
    right_key: str = "o_custkey",
    left_ts: str = "ts",
    right_ts: str = "o_orderdate",
    emit: tuple = ("o_orderkey",),
    id_col: str = "event_id",
):
    """Both-sides-large as-of join: union-tag co-partition on the key, then a
    per-group ``merge_asof`` — same backward-search + tie rules as the
    broadcast path, but the right side is shuffled instead of broadcast
    (the 100 TB plan when the right table exceeds the object store)."""

    import pyarrow.compute as _pc

    # both timestamp columns are normalized to timestamp[us] so the tagged
    # schemas agree even when left/right store different temporal types
    # (e.g. timestamp events vs date32 order dates — dates become midnight,
    # which preserves the backward-search semantics)
    TS = pa.timestamp("us")

    def tag_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {"_k": t[left_key], "_side": pa.array(np.zeros(t.num_rows, np.int8)),
             id_col: t[id_col], "_lts": _pc.cast(t[left_ts], TS),
             "_rts": pa.nulls(t.num_rows, TS),
             **{f"_e_{c}": pa.nulls(t.num_rows, pa.int64()) for c in emit}}
        )

    def tag_right(t: pa.Table) -> pa.Table:
        return pa.table(
            {"_k": t[right_key], "_side": pa.array(np.ones(t.num_rows, np.int8)),
             id_col: pa.nulls(t.num_rows, pa.int64()),
             "_lts": pa.nulls(t.num_rows, TS),
             "_rts": _pc.cast(t[right_ts], TS),
             **{f"_e_{c}": _pc.cast(t[c], pa.int64()) for c in emit}}
        )

    unioned = events_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["_side"] == 0]
        right = g[g["_side"] == 1]
        if left.empty:
            return pd.DataFrame({id_col: [], **{c: [] for c in emit}})
        if right.empty:
            out = left[[id_col]].copy()
            for c in emit:
                out[c] = np.nan
            return out
        rs = right.sort_values(["_rts"] + [f"_e_{c}" for c in emit], kind="stable")
        ls = left.sort_values("_lts", kind="stable")
        merged = pd.merge_asof(
            ls[[id_col, "_lts"]], rs[["_rts"] + [f"_e_{c}" for c in emit]],
            left_on="_lts", right_on="_rts", direction="backward",
        )
        out = merged[[id_col]].copy()
        for c in emit:
            out[c] = merged[f"_e_{c}"]
        return out

    return unioned.groupby("_k").map_groups(per_key, batch_format="pandas")


def lag_lead_gaps(ds, ts_col: str = "ts", key_col: str = "user_id",
                  id_col: str = "event_id", num_partitions: int = 64):
    """LAG/LEAD window over (key ORDER BY ts, id): per event, whole seconds
    to the previous and next event of the same key (-1 at the edges, exact
    integer arithmetic).  Output: (event_id, user_id, gap_prev_s, gap_next_s).

    Scale shape: the session-windows plan — ONE hash-partition shuffle on the
    key, then each partition computes every key's gaps in a single vectorized
    lexsort + diff pass (one Python call per partition, not per key)."""

    def tag(batch: pa.Table) -> pa.Table:
        u = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (u * np.int64(2654435761)) % np.int64(num_partitions)
        return batch.append_column("_part", pa.array(np.abs(part)))

    empty = pa.table(
        {id_col: pa.array([], pa.int64()), key_col: pa.array([], pa.int64()),
         "gap_prev_s": pa.array([], pa.int64()),
         "gap_next_s": pa.array([], pa.int64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return empty
        u = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sec = _epoch_us(g[ts_col]) // 1_000_000
        eid = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, sec, u))
        u, sec, eid = u[order], sec[order], eid[order]
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = u[1:] == u[:-1]
        gap_prev = np.full(n, -1, dtype=np.int64)
        gap_next = np.full(n, -1, dtype=np.int64)
        gap_prev[1:][same_prev[1:]] = (sec[1:] - sec[:-1])[same_prev[1:]]
        gap_next[:-1][same_prev[1:]] = (sec[1:] - sec[:-1])[same_prev[1:]]
        return pa.table(
            {id_col: pa.array(eid), key_col: pa.array(u),
             "gap_prev_s": pa.array(gap_prev), "gap_next_s": pa.array(gap_next)}
        )

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def running_totals(ds, value_col: str = "value", ts_col: str = "ts",
                   key_col: str = "user_id", id_col: str = "event_id",
                   num_partitions: int = 64):
    """Cumulative SUM window per key ordered by (ts, id) — exact cents
    fixed-point so distributed results hash-match any serial evaluation.
    Output: (event_id, user_id, running_x100).

    Scale shape: one hash-partition shuffle; each partition computes every
    key's prefix sums in one vectorized lexsort + cumsum-with-key-reset pass.
    """

    def tag(batch: pa.Table) -> pa.Table:
        u = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (u * np.int64(2654435761)) % np.int64(num_partitions)
        return batch.append_column("_part", pa.array(np.abs(part)))

    empty = pa.table(
        {id_col: pa.array([], pa.int64()), key_col: pa.array([], pa.int64()),
         "running_x100": pa.array([], pa.int64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return empty
        u = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sec = _epoch_us(g[ts_col])
        eid = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[value_col].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, sec, u))
        u, eid, cents = u[order], eid[order], cents[order]
        run = np.cumsum(cents)
        # reset at key boundaries: subtract the cumulative total before each key
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, n])
        base_vals = np.r_[np.int64(0), run[starts[1:] - 1]]
        base = np.repeat(base_vals, counts)  # sign-safe (no monotonicity assumed)
        return pa.table(
            {id_col: pa.array(eid), key_col: pa.array(u),
             "running_x100": pa.array(run - base)}
        )

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("_part").map_groups(per_part, batch_format="pyarrow")


def window_frames(ds, value_col: str = "value", ts_col: str = "ts",
                  key_col: str = "user_id", id_col: str = "event_id",
                  n_tiles: int = 4, preceding: int = 2,
                  num_partitions: int = 64):
    """Framed window functions per key ordered by (ts, id): NTILE(n),
    FIRST_VALUE / LAST_VALUE over the whole partition, and a ROWS BETWEEN
    ``preceding`` PRECEDING AND CURRENT ROW moving sum+count (the exact
    integer form of a moving average).  The OGR SQL dialect has no window
    functions; the reference exposes them via its SQLite dialect
    (ogr/ogrsf_frmts/sqlite/) — same surface, Ray-partitioned.

    NTILE follows the SQL definition: the first n_rows %% n groups get
    ceil(n_rows/n) rows, the rest floor(n_rows/n).

    Scale shape: ONE hash-partition shuffle on the key; each partition
    resolves every key in a single vectorized lexsort + repeat/cumsum pass.
    Output: (event_id, user_id, ntile, first_x100, last_x100, mov_sum_x100,
    mov_cnt) — all exact cents fixed-point.
    """

    def tag(batch: pa.Table) -> pa.Table:
        u = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (u * np.int64(2654435761)) % np.int64(num_partitions)
        return batch.append_column("_part", pa.array(np.abs(part)))

    empty = pa.table(
        {id_col: pa.array([], pa.int64()), key_col: pa.array([], pa.int64()),
         "ntile": pa.array([], pa.int64()),
         "first_x100": pa.array([], pa.int64()),
         "last_x100": pa.array([], pa.int64()),
         "mov_sum_x100": pa.array([], pa.int64()),
         "mov_cnt": pa.array([], pa.int64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return empty
        u = g[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sec = _epoch_us(g[ts_col])
        eid = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g[value_col].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, sec, u))
        u, eid, cents = u[order], eid[order], cents[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, n])
        rank = np.arange(n) - np.repeat(starts, counts)  # 0-based within key
        size = np.repeat(counts, counts)
        # NTILE: first (size % k) buckets hold q+1 rows, the rest q
        q, rem = size // n_tiles, size % n_tiles
        big = rem * (q + 1)  # rows covered by the larger buckets
        in_big = rank < big
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                in_big,
                rank // np.maximum(q + 1, 1),
                rem + np.where(q > 0, (rank - big) // np.maximum(q, 1), 0),
            ) + 1
        first = np.repeat(cents[starts], counts)
        last = np.repeat(cents[starts + counts - 1], counts)
        # moving sum over the last `preceding`+1 rows within the key
        run = np.cumsum(cents)
        base_vals = np.r_[np.int64(0), run[starts[1:] - 1]]
        prefix = run - np.repeat(base_vals, counts)  # inclusive in-key prefix
        back = np.minimum(rank, preceding)  # rows actually available
        lo_idx = np.arange(n) - back  # global index of window start
        # exclusive prefix before the window: prefix at (lo_idx - 1), which
        # stays inside the key whenever the window does not start at rank 0
        excl = np.where(rank - back > 0, prefix[lo_idx - 1], 0)
        mov = prefix - excl
        mov_cnt = back + 1
        return pa.table(
            {id_col: pa.array(eid), key_col: pa.array(u),
             "ntile": pa.array(tile.astype(np.int64)),
             "first_x100": pa.array(first), "last_x100": pa.array(last),
             "mov_sum_x100": pa.array(mov), "mov_cnt": pa.array(mov_cnt)}
        )

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby("_part").map_groups(per_part, batch_format="pyarrow")
