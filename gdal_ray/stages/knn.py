"""kNN join (points -> k nearest targets).

GDAL core has no kNN join (nearest-neighbor appears only inside gridding,
``alg/gdalgrid.cpp:905``); the north star mandates one.  Two physical plans:

1. **Broadcast brute-force** (default; targets fit memory): the target
   centroid matrix is ``ray.put`` once; each actor computes a chunked squared
   euclidean distance matrix per batch (numpy broadcast) and takes top-k with
   ``argpartition``.  Exact, vectorized, zero shuffle — right up to millions
   of targets.

2. **Best-first STRtree** (``tree=True``): per-point best-first traversal of a
   packed STRtree over the targets (heap on node mindists) — the north star's
   scale path when the distance matrix would be too wide.  Same results.

Ties are broken by target key ascending (deterministic, SQL-mirrorable via
``row_number() over (order by dist2, zone_key)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


class BroadcastKNN:
    def __init__(
        self,
        targets_ref,
        k: int = 3,
        id_col: str = "doc_id",
        tree: bool = False,
        chunk: int = 256,
    ):
        t = ray.get(targets_ref) if isinstance(targets_ref, ray.ObjectRef) else targets_ref
        self.tid = t["zone_id"].to_pylist()
        self.tkey = t["zone_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.cx = t["cx"].to_numpy(zero_copy_only=False)
        self.cy = t["cy"].to_numpy(zero_copy_only=False)
        # pre-sort targets by key so np.argpartition tie-handling can be fixed
        # deterministically by a lexsort on (dist2, key)
        self.k = k
        self.id_col = id_col
        self.chunk = chunk
        self.tree = None
        if tree:
            from ..state.strtree import STRtree

            self.tree = STRtree(np.column_stack([self.cx, self.cy, self.cx, self.cy]))
        # preallocated scratch (touched once here): in-place kernels below keep
        # steady-state batches free of fresh-page allocation cost
        m = self.cx.size
        self._d2 = np.empty((chunk, m))
        self._tmp = np.empty((chunk, m))
        self._d2.fill(0.0)
        self._tmp.fill(0.0)

    def _topk_brute(self, px: np.ndarray, py: np.ndarray):
        n = px.size
        k = min(self.k, self.cx.size)
        out_idx = np.empty((n, k), dtype=np.int64)
        out_d = np.empty((n, k))
        for s in range(0, n, self.chunk):
            e = min(n, s + self.chunk)
            c = e - s
            d2 = self._d2[:c]
            tmp = self._tmp[:c]
            np.subtract(px[s:e, None], self.cx[None, :], out=d2)
            np.multiply(d2, d2, out=d2)
            np.subtract(py[s:e, None], self.cy[None, :], out=tmp)
            np.multiply(tmp, tmp, out=tmp)
            np.add(d2, tmp, out=d2)
            m = self.cx.size
            kk = min(k + 8, m - 1)
            if m > 4 * k + 8:
                part = np.argpartition(d2, kk, axis=1)[:, : kk + 1]
                pd = np.take_along_axis(d2, part, axis=1)
                pk = self.tkey[part]
                order = np.lexsort((pk, pd), axis=1)[:, :k]
                out_idx[s:e] = np.take_along_axis(part, order, axis=1)
                out_d[s:e] = np.take_along_axis(pd, order, axis=1)
                # tie spill past the candidate window: resolve those rows fully
                spill = out_d[s:e, -1] >= pd.max(axis=1)
                if spill.any():
                    for r in np.nonzero(spill)[0]:
                        full = np.lexsort((self.tkey, d2[r]))[:k]
                        out_idx[s + r] = full
                        out_d[s + r] = d2[r][full]
            else:
                order = np.lexsort((np.broadcast_to(self.tkey, d2.shape), d2), axis=1)[:, :k]
                out_idx[s:e] = order
                out_d[s:e] = np.take_along_axis(d2, order, axis=1)
        return out_idx, out_d

    def _topk_tree(self, px: np.ndarray, py: np.ndarray):
        k = min(self.k, self.cx.size)
        n = px.size
        total = self.cx.size
        out_idx = np.empty((n, k), dtype=np.int64)
        out_d = np.empty((n, k))
        for i in range(n):
            # over-fetch to resolve distance ties by key deterministically;
            # if the k-th selected distance equals the fetch horizon there may
            # be unfetched equidistant targets with smaller keys — widen until
            # the boundary is strictly inside the fetched set (matches the
            # brute path's spill re-sort)
            m = k + 8
            while True:
                idx, d2 = self.tree.nearest(px[i], py[i], k=min(m, total))
                order = np.lexsort((self.tkey[idx], d2))[:k]
                if len(idx) >= total or d2[order[k - 1]] < d2.max():
                    break
                m *= 4
            out_idx[i] = idx[order]
            out_d[i] = d2[order]
        return out_idx, out_d

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch["lon"].to_numpy(zero_copy_only=False)
        py = batch["lat"].to_numpy(zero_copy_only=False)
        if self.tree is not None:
            idx, d2 = self._topk_tree(px, py)
        else:
            idx, d2 = self._topk_brute(px, py)
        n, k = idx.shape
        rep = pa.array(np.repeat(np.arange(n), k))
        return pa.table(
            {
                self.id_col: batch[self.id_col].take(rep),
                "zone_id": pa.array([self.tid[i] for i in idx.ravel()], type=pa.string()),
                "rank": pa.array(np.tile(np.arange(1, k + 1, dtype=np.int64), n)),
                "dist2": pa.array(d2.ravel()),
            }
        )


def knn_join(
    points_ds,
    targets: pa.Table,
    k: int = 3,
    id_col: str = "doc_id",
    tree: bool = False,
    concurrency: int | tuple = 4,
    batch_size: int = 32768,
):
    """targets: table with (zone_id, zone_key, cx, cy)."""
    ref = ray.put(targets)
    return points_ds.map_batches(
        BroadcastKNN,
        fn_constructor_kwargs=dict(targets_ref=ref, k=k, id_col=id_col, tree=tree),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
