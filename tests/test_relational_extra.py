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


def test_set_op_intersect_except(ray_session):
    """set_op matches Python set semantics incl. duplicates on both sides."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import relational

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 3, 5, 8, 8], pa.int64())}))
    b = rd.from_arrow(pa.table({"k": pa.array([2, 3, 3, 4, 9], pa.int64())}))
    inter = sorted(r["k"] for r in relational.set_op(a, b, "k", "intersect").take_all())
    exc = sorted(r["k"] for r in relational.set_op(a, b, "k", "except").take_all())
    assert inter == [2, 3]
    assert exc == [1, 5, 8]


def test_group_rank_matches_duckdb(ray_session):
    """group_rank == DuckDB RANK/DENSE_RANK on random data with many ties."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import relational

    rng = np.random.RandomState(3)
    n = 2000
    tbl = pa.table({"k": rng.randint(0, 19, n).astype(np.int64),
                    "v": rng.randint(0, 7, n).astype(np.int64),
                    "t": np.arange(n, dtype=np.int64)})
    out = relational.group_rank(rd.from_arrow(tbl), "k", "v", "t").take_all()
    got = pd.DataFrame(out).sort_values("t").reset_index(drop=True)
    df = tbl.to_pandas()
    exp = duckdb.sql("""SELECT t,
        RANK() OVER (PARTITION BY k ORDER BY v DESC) rnk,
        DENSE_RANK() OVER (PARTITION BY k ORDER BY v DESC) drnk
        FROM df ORDER BY t""").df()
    assert (got["rnk"].values == exp["rnk"].values).all()
    assert (got["drnk"].values == exp["drnk"].values).all()


def test_union_layers_schema_harmonization(ray_session):
    """union_layers: union schema in first-seen order, typed nulls, layer
    tags; type conflicts raise."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from gdal_ray.stages import relational

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                "name": pa.array(["a", "b"])}))
    b = rd.from_arrow(pa.table({"k": pa.array([3], pa.int64()),
                                "score": pa.array([0.5], pa.float64())}))
    out = relational.union_layers({"la": a, "lb": b})
    assert out.schema().names == ["layer", "k", "name", "score"]
    rows = sorted(out.take_all(), key=lambda r: r["k"])
    assert [r["layer"] for r in rows] == ["la", "la", "lb"]
    assert rows[0]["score"] is None and rows[2]["name"] is None
    c = rd.from_arrow(pa.table({"k": pa.array(["x"])}))  # k type conflict
    with pytest.raises(ValueError, match="column 'k'"):
        relational.union_layers({"la": a, "lc": c})


def test_group_quantiles_matches_numpy_lower(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import relational

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5, 5000)
    vals = rng.integers(0, 40, 5000)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys), "v": pa.array(vals)}))
    out = relational.group_quantiles(ds, "k", "v").to_pandas().set_index("k").sort_index()
    for k in range(5):
        v = np.sort(vals[keys == k])
        n = v.size
        assert out.loc[k, "n"] == n
        for p, name in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            assert out.loc[k, name] == v[int(np.floor(p * (n - 1)))], (k, name)


def test_window_frames_brute(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import events

    rng = np.random.default_rng(11)
    n = 800
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 37, n),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
        "value": np.round(rng.uniform(-50, 50, n), 2),
    })
    ds = rd.from_pandas(df)
    got = events.window_frames(ds).to_pandas().set_index("event_id").sort_index()
    cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = df.assign(cents=cents)
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ids = g["event_id"].to_numpy()
        c = g["cents"].to_numpy()
        m = len(g)
        q, rem = divmod(m, 4)
        for r, eid in enumerate(ids):
            row = got.loc[eid]
            big = rem * (q + 1)
            tile = (r // (q + 1) if r < big else rem + (r - big) // q) + 1
            assert row["ntile"] == tile, (uid, eid)
            assert row["first_x100"] == c[0] and row["last_x100"] == c[-1]
            lo = max(0, r - 2)
            assert row["mov_sum_x100"] == c[lo:r + 1].sum()
            assert row["mov_cnt"] == r + 1 - lo


def test_line_locate_polyline_brute(ray_session):
    """LINESTRING path: probe projects onto the correct segment of a zigzag
    (brute per-segment check), clamped at the ends."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.functions import wkb as wkbf
    from gdal_ray.stages import geomops

    pts = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [8.0, 3.0]])
    w = wkbf.encode_linestring(pts)
    probes = [(1.0, 1.0), (5.0, 1.0), (9.0, 9.9), (-3.0, -4.0), (4.0, 1.5)]
    t = pa.table({
        "px": pa.array([p[0] for p in probes]),
        "py": pa.array([p[1] for p in probes]),
        "wkb": pa.array([w] * len(probes), pa.binary()),
    })
    out = geomops.line_locate_batch(t)
    seg = np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1]))
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    for i, (px, py) in enumerate(probes):
        best = None
        for j in range(3):
            a, b = pts[j], pts[j + 1]
            d = b - a
            tt = np.clip(np.dot([px - a[0], py - a[1]], d) / np.dot(d, d), 0, 1)
            qq = a + tt * d
            d2 = (px - qq[0]) ** 2 + (py - qq[1]) ** 2
            if best is None or d2 < best[0]:
                best = (d2, j, cum[j] + tt * seg[j])
        assert out["edge"][i].as_py() == best[1], (i, probes[i])
        frac = best[2] / cum[-1]
        assert abs(out["frac_e7"][i].as_py() - int(np.floor(frac * 1e7 + 0.5))) <= 0
        assert out["dist_e7"][i].as_py() == int(np.floor(np.sqrt(best[0]) * 1e7 + 0.5))


def test_range_join_overlapping_intervals(ray_session):
    """CSR-slab range join vs brute nested loop, with overlapping, nested,
    empty, and out-of-domain intervals."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import relational

    intervals = pa.table({
        "iid": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "lo": pa.array([0.0, 5.0, 5.0, 20.0, 7.0]),
        "hi": pa.array([10.0, 15.0, 6.0, 20.0, 8.0]),  # iid=3 empty (lo==hi)
    })
    vals = [0.0, 4.9, 5.0, 5.5, 7.5, 9.9, 10.0, 14.9, 15.0, 50.0, -1.0]
    probe = pa.table({"pid": pa.array(range(len(vals)), pa.int64()),
                      "v": pa.array(vals)})
    got = sorted(
        (r["pid"], r["iid"])
        for r in relational.range_join_broadcast(
            rd.from_arrow(probe), intervals, "v", "lo", "hi",
            emit=["iid"]).take_all()
    )
    brute = sorted(
        (p, i)
        for p, v in enumerate(vals)
        for i, (lo, hi) in enumerate(zip(intervals["lo"].to_pylist(),
                                         intervals["hi"].to_pylist()))
        if lo <= v < hi
    )
    assert got == brute
    assert (4, 4) in got and (4, 0) in got and (4, 1) in got  # 3-deep overlap


def test_exact_quantiles_continuous_matches_numpy(ray_session):
    """Round-4 guard: continuous columns refine bounded histograms (driver
    holds O(bins) per round) yet return the EXACT rank-statistic values."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.relational import exact_quantiles

    rng = np.random.default_rng(5)
    v = rng.normal(1000.0, 250.0, 60_001)
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    got = exact_quantiles(ds, "x", ps=(0.25, 0.5, 0.9), max_distinct=1024)
    sv = np.sort(v)
    assert got["n"] == len(v)
    for p in (0.25, 0.5, 0.9):
        assert got[f"q{int(p * 100)}"] == sv[int(np.floor(p * (len(v) - 1)))]


def test_exact_quantiles_discrete_and_duplicates(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.relational import exact_quantiles

    # heavy duplication: distinct count small -> value-histogram path
    v = np.repeat(np.array([1.0, 2.0, 7.0]), [5000, 3000, 2000])
    ds = rd.from_arrow(pa.table({"x": pa.array(v)}))
    got = exact_quantiles(ds, "x", ps=(0.5, 0.9))
    sv = np.sort(v)
    assert got["q50"] == sv[int(np.floor(0.5 * (len(v) - 1)))]
    assert got["q90"] == sv[int(np.floor(0.9 * (len(v) - 1)))]
    # continuous values with one giant duplicate spike (degenerate bin)
    rng = np.random.default_rng(9)
    v2 = np.concatenate([rng.uniform(0, 1, 20_000), np.full(30_000, 0.5)])
    ds2 = rd.from_arrow(pa.table({"x": pa.array(v2)}))
    got2 = exact_quantiles(ds2, "x", ps=(0.5,), max_distinct=512)
    assert got2["q50"] == np.sort(v2)[int(np.floor(0.5 * (len(v2) - 1)))]
