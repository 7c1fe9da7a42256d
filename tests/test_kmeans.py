"""Distributed Lloyd k-means (stages/sim.kmeans_assign)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.stages import sim


def _planted(k=3, per=40, d=8, sep=10.0, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (k, d)) * sep
    pts = np.vstack([centers[i] + rng.normal(0, 0.5, (per, d)) for i in range(k)])
    truth = np.repeat(np.arange(k), per)
    # put one point of each planted cluster at the smallest ids so the
    # deterministic smallest-id init starts near each plant
    order = np.concatenate([np.arange(k) * per, np.delete(np.arange(k * per), np.arange(k) * per)])
    return pts[order], truth[order]


def test_kmeans_recovers_planted_clusters():
    pts, truth = _planted()
    tbl = pa.table({"vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                    "embedding": pa.array(list(pts), pa.list_(pa.float64()))})
    out = sim.kmeans_assign(rd.from_arrow(tbl), k=3, iters=3).take_all()
    got = {r["vec_id"]: r["cluster"] for r in out}
    assign = np.array([got[i] for i in range(len(pts))])
    # perfect recovery up to label permutation: each planted group lands in
    # exactly one output cluster and groups don't merge
    for g in range(3):
        vals = np.unique(assign[truth == g])
        assert len(vals) == 1, (g, vals)
    assert len(np.unique([assign[truth == g][0] for g in range(3)])) == 3


def test_kmeans_keep_embedding_and_empty_cluster():
    """k larger than the data's natural spread: empty clusters keep their
    init centroid and the run still terminates deterministically."""
    pts, _ = _planted(k=2, per=10, d=4)
    tbl = pa.table({"vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                    "embedding": pa.array(list(pts), pa.list_(pa.float64()))})
    out = sim.kmeans_assign(rd.from_arrow(tbl), k=5, iters=2,
                            keep_embedding=True).take_all()
    assert len(out) == len(pts)
    assert all("embedding" in r and len(r["embedding"]) == 4 for r in out)
    assert all(0 <= r["cluster"] < 5 for r in out)


def test_kmeans_init_takes_k_smallest_ids():
    """Init must be the k SMALLEST ids, not ids < k: offset/sparse id spaces
    work and give identical clusters to the 0-based labeling."""
    pts, _ = _planted()
    base = pa.table({"vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                     "embedding": pa.array(list(pts), pa.list_(pa.float64()))})
    off = pa.table({"vec_id": pa.array(np.arange(len(pts)) * 3 + 1000, pa.int64()),
                    "embedding": pa.array(list(pts), pa.list_(pa.float64()))})
    a = sim.kmeans_assign(rd.from_arrow(base), k=3, iters=2).take_all()
    b = sim.kmeans_assign(rd.from_arrow(off), k=3, iters=2).take_all()
    am = {r["vec_id"]: r["cluster"] for r in a}
    bm = {(r["vec_id"] - 1000) // 3: r["cluster"] for r in b}
    assert am == bm


def test_pq_encode_recovers_planted_codewords(ray_session):
    """Vectors constructed per-subspace from k well-separated codewords (plus
    tiny jitter) must encode to the planted code tuples."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import sim

    rng = np.random.default_rng(3)
    m, k, dsub = 4, 8, 16
    books = rng.normal(0, 1, (m, k, dsub)) * 50.0  # well separated
    n = 200
    codes = rng.integers(0, k, (n, m))
    x = np.concatenate(
        [books[j, codes[:, j]] + rng.normal(0, 0.01, (n, dsub))
         for j in range(m)], axis=1)
    # seed determinism needs the k smallest ids to cover all codewords in
    # every subspace: pin the first k rows to codes (0..k-1, same everywhere)
    for c in range(k):
        codes[c] = c
        x[c] = np.concatenate([books[j, c] for j in range(m)])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in x]),
    }))
    out = sim.pq_encode(ds, m=m, k=k, iters=2).to_pandas().set_index("vec_id").sort_index()
    got = out[[f"code_{j}" for j in range(m)]].to_numpy()
    # planted codeword c seeds cluster c exactly (ids 0..k-1), so codes match
    assert (got == codes).mean() > 0.99
