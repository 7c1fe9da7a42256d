"""Relational extras: distributed per-group top-N / ROW_NUMBER rank.

Brute-force oracle over a many-block input with deliberate order-value ties
(tie-break must be deterministic on the tie column).
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.stages import relational


def _brute_top_n(key, val, tie, n):
    rows = sorted(zip(key, val, tie), key=lambda r: (r[0], -r[1], r[2]))
    out = []
    prev_k, rank = None, 0
    for k, v, t in rows:
        rank = rank + 1 if k == prev_k else 1
        prev_k = k
        if rank <= n:
            out.append((k, t, rank))
    return sorted(out)


def test_group_top_n_matches_brute_with_ties():
    rng = np.random.default_rng(7)
    n_rows = 5000
    key = rng.integers(0, 200, n_rows).astype(np.int64)
    val = rng.integers(0, 12, n_rows).astype(np.float64)  # heavy ties
    tie = np.arange(n_rows, dtype=np.int64)
    t = pa.table({"k": key, "v": val, "i": tie})
    ds = rd.from_arrow(t).repartition(13)
    got = relational.group_top_n(ds, "k", "v", 3, "i").take_all()
    got_rows = sorted((r["k"], r["i"], r["rn"]) for r in got)
    assert got_rows == _brute_top_n(key, val, tie, 3)


def test_group_top_n_small_groups_and_empty():
    t = pa.table(
        {"k": pa.array([1, 1, 2], pa.int64()),
         "v": pa.array([5.0, 9.0, 1.0]),
         "i": pa.array([10, 11, 12], pa.int64())}
    )
    got = relational.group_top_n(rd.from_arrow(t), "k", "v", 3, "i").take_all()
    rows = sorted((r["k"], r["i"], r["rn"]) for r in got)
    assert rows == [(1, 10, 2), (1, 11, 1), (2, 12, 1)]


def test_global_prefix_sum_exclusive_exact():
    rng = np.random.default_rng(11)
    n = 3000
    ids = rng.permutation(n).astype(np.int64)  # unique, shuffled across blocks
    vals = rng.integers(1, 50, n).astype(np.int64)
    t = pa.table({"k": ids, "v": vals})
    ds = rd.from_arrow(t).repartition(11)
    out = relational.global_prefix_sum(ds, "k", "v", bucket_size=97).take_all()
    got = {r["k"]: r["cum"] for r in out}
    by_key = vals[np.argsort(ids)]
    expect_sorted = np.cumsum(by_key) - by_key
    for i, k in enumerate(np.sort(ids)):
        assert got[int(k)] == int(expect_sorted[i])
