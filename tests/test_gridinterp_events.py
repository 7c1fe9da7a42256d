"""Grid interpolation + windowed events tests vs brute oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages import gridinterp


def _pts(n=200, seed=4):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "lon": pa.array(rng.uniform(0, 100, n)),
            "lat": pa.array(rng.uniform(0, 50, n)),
            "value": pa.array(rng.uniform(1, 9, n)),
        }
    )


def _assemble(rows, grid):
    out = np.full((grid.ny, grid.nx), np.nan)
    for r in rows:
        arr = np.frombuffer(r["data"], np.float64).reshape(r["height"], r["width"])
        out[r["ty"] * grid.tile : r["ty"] * grid.tile + r["height"],
            r["tx"] * grid.tile : r["tx"] * grid.tile + r["width"]] = arr
    return out


def test_grid_interp_algorithms_match_brute():
    pts = _pts()
    grid = gridinterp.InterpGrid(0, 0, 100, 50, 40, 20, tile=8)
    px = pts["lon"].to_numpy()
    py = pts["lat"].to_numpy()
    pv = pts["value"].to_numpy()
    cx = grid.x0 + (np.arange(grid.nx) + 0.5) * grid.dx
    cy = grid.y0 + (np.arange(grid.ny) + 0.5) * grid.dy
    gx, gy = np.meshgrid(cx, cy)
    d2 = (gx.ravel()[:, None] - px) ** 2 + (gy.ravel()[:, None] - py) ** 2
    radius = 10.0
    in_r = d2 <= radius * radius
    for alg in ("count", "nearest", "average", "invdist"):
        rows = gridinterp.grid_interpolate(
            rd.from_arrow(pts), grid, algorithm=alg, radius=radius
        ).take_all()
        got = _assemble(rows, grid)
        if alg == "count":
            expect = in_r.sum(axis=1).astype(float).reshape(grid.ny, grid.nx)
            assert (got == expect).all()
        elif alg == "nearest":
            j = np.argmin(np.where(in_r, d2, np.inf), axis=1)
            expect = np.where(in_r.any(axis=1), pv[j], np.nan).reshape(grid.ny, grid.nx)
            m = ~np.isnan(expect)
            assert (got[m] == expect[m]).all() and np.isnan(got[~m]).all()
        elif alg == "average":
            n = in_r.sum(axis=1)
            expect = np.where(n > 0, np.where(in_r, pv, 0).sum(axis=1) / np.maximum(n, 1), np.nan
                              ).reshape(grid.ny, grid.nx)
            m = ~np.isnan(expect)
            assert np.allclose(got[m], expect[m])
        else:
            w = np.where(in_r, 1.0 / np.maximum(d2, 1e-300), 0.0)
            ws = w.sum(axis=1)
            expect = np.where(ws > 0, (w * pv).sum(axis=1) / np.where(ws == 0, 1, ws), np.nan
                              ).reshape(grid.ny, grid.nx)
            m = ~np.isnan(expect)
            assert np.allclose(got[m], expect[m])


def test_sliding_and_session_windows():
    import pandas as pd

    from gdal_ray.stages import events as ev

    ts = pd.to_datetime(
        ["2024-01-01 00:10", "2024-01-01 00:40", "2024-01-01 03:00",
         "2024-01-01 03:30", "2024-01-02 10:00"]
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(["a"] * 5),
            "ts": pa.array(ts),
        }
    )
    ds = rd.from_arrow(t)
    # sliding 2h step 1h: event at 00:10 in windows floor(t/1h) and -1
    rows = ev.sliding_window(ds, window_s=7200, step_s=3600).to_pandas()
    total = rows["n_events"].sum()
    assert total == 10  # each event in exactly 2 windows
    # sessions with 2h gap: {00:10,00:40} + {03:00,03:30} gap=2h20m>2h -> new;
    # then next day -> third session
    srows = ev.session_windows(ds, gap_s=7200).take_all()
    assert len(srows) == 1
    assert srows[0]["n_sessions"] == 3
    assert srows[0]["max_session_events"] == 2


def test_delaunay_linear_reproduces_plane():
    """Linear (Delaunay) interpolation of samples from a plane returns the
    plane exactly at interior cells — any valid triangulation satisfies this."""
    import numpy as np

    from gdal_ray.stages import gridinterp as gi

    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 10, (80, 2))
    # include the corners so the hull covers the probe grid
    pts = np.vstack([pts, [[0, 0], [10, 0], [0, 10], [10, 10]]])
    vals = 3.0 * pts[:, 0] - 2.0 * pts[:, 1] + 7.0
    gy, gx = np.mgrid[1:9, 1:9]
    out = gi.linear_interpolate_cells(pts, vals, gx.ravel().astype(float),
                                      gy.ravel().astype(float))
    exp = 3.0 * gx.ravel() - 2.0 * gy.ravel() + 7.0
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, exp, atol=1e-6)


def test_delaunay_outside_hull_nan():
    import numpy as np

    from gdal_ray.stages import gridinterp as gi

    pts = np.array([[0.0, 0.0], [4.0, 0.0], [2.0, 3.0]])
    vals = np.array([1.0, 2.0, 3.0])
    out = gi.linear_interpolate_cells(pts, vals, np.array([2.0, 50.0]),
                                      np.array([1.0, 50.0]))
    assert np.isfinite(out[0]) and np.isnan(out[1])


def test_asof_join_partitioned_matches_broadcast():
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from gdal_ray.sources.io import read_table
    from gdal_ray.stages import events as ev

    sf = "/root/testdata/sf0.01"
    e = read_table(sf, "events", columns=["event_id", "user_id", "ts"])
    orders = pq.read_table(sf + "/orders.parquet",
                           columns=["o_custkey", "o_orderdate", "o_orderkey"])
    b = ev.asof_join(read_table(sf, "events",
                                columns=["event_id", "event_type", "user_id", "ts"]),
                     orders).to_pandas()[["event_id", "o_orderkey"]]
    p = ev.asof_join_partitioned(e, rd.from_arrow(orders)).to_pandas()
    b = b.sort_values("event_id").reset_index(drop=True)
    p = p.sort_values("event_id").reset_index(drop=True)
    assert len(b) == len(p)
    bv = b["o_orderkey"].to_numpy(dtype=float)
    pv = p["o_orderkey"].to_numpy(dtype=float)
    both_nan = np.isnan(bv) & np.isnan(pv)
    assert np.all(both_nan | (bv == pv))


def test_running_totals_negative_values(ray_session):
    """Cumulative sums reset per key and stay exact with negative values
    (the base-offset subtraction must not assume monotone prefix sums)."""
    import pandas as pd
    import ray.data as rd

    from gdal_ray.stages import events as ev_stage

    t0 = pd.Timestamp("2024-01-01")
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([5, 5, 5, 6], pa.int64()),
        "ts": pa.array([t0, t0 + pd.Timedelta(seconds=1),
                        t0 + pd.Timedelta(seconds=2), t0]),
        "value": pa.array([-10.0, 4.5, -1.25, 2.0]),
    })
    out = {r["event_id"]: r["running_x100"]
           for r in ev_stage.running_totals(rd.from_arrow(tbl)).take_all()}
    assert out == {1: -1000, 2: -550, 3: -675, 4: 200}


def test_late_event_windows_watermark(ray_session):
    """Hand-built stream: ids are processing order; watermark = running max
    ts (strictly earlier) - lateness; late events excluded from the sum but
    counted."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import events as ev

    base = dt.datetime(2024, 1, 1)
    # proc order:   ts offsets (s):
    rows = [
        (0, 0),        # watermark -inf -> on time
        (1, 7200),     # jumps ahead; on time
        (2, 3000),     # wm = 7200-1800 = 5400 > 3000 -> LATE
        (3, 5400),     # 5400 >= 5400 -> on time (strict <)
        (4, 5399),     # LATE by 1s
        (5, 7300),     # on time
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([1.0] * len(rows)),
    })
    out = {r["window_id"]: r for r in ev.late_event_windows(
        rd.from_arrow(t), window_s=3600, lateness_s=1800,
        bucket_size=2).take_all()}
    w0 = int(base.timestamp() // 3600)
    w1, w2 = w0 + 1, w0 + 2
    # hour 0..3600: ts 0 (on time) and ts 3000 (late: wm = 7200-1800)
    assert out[w0]["n_on_time"] == 1 and out[w0]["n_late"] == 1
    assert out[w0]["value_cents_sum"] == 100  # late event excluded
    # hour 3600..7200: ts 5400 exactly AT the watermark (strict <) is on
    # time; 5399 is late by one second
    assert out[w1]["n_on_time"] == 1 and out[w1]["n_late"] == 1
    # hour 7200..: 7200 and 7300 both on time
    assert out[w2]["n_on_time"] == 2 and out[w2]["n_late"] == 0
    assert sum(r["n_late"] for r in out.values()) == 2


def test_asof_join_preserves_emit_dtype(ray_session):
    """ADVICE r3: broadcast asof_join must emit the right column's ORIGINAL
    dtype (string / non-integral float), not an int64 round-trip."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import events as ev

    left = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 8], pa.int64()),
        "ts": pa.array([100, 200, 50], pa.timestamp("us")),
    })
    right = pa.table({
        "o_custkey": pa.array([7, 7, 8], pa.int64()),
        "o_orderdate": pa.array([90, 150, 60], pa.timestamp("us")),
        "label": pa.array(["early", "late", "future"], pa.string()),
        "price": pa.array([1.5, 2.25, 9.75], pa.float64()),
    })
    out = ev.asof_join(rd.from_arrow(left), right,
                       emit=("label", "price")).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    assert list(out["label"]) == ["early", "late", None]
    assert out["price"].tolist()[:2] == [1.5, 2.25]
    assert out["price"].isna().tolist() == [False, False, True]


def test_asof_join_tiebreak_max_emit_rank(ray_session):
    """Tied right timestamps pick the max emit value under the rank-coded
    tie-break, matching the former raw-int ordering."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import events as ev

    left = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([7], pa.int64()),
        "ts": pa.array([100], pa.timestamp("us")),
    })
    right = pa.table({
        "o_custkey": pa.array([7, 7, 7], pa.int64()),
        "o_orderdate": pa.array([90, 90, 90], pa.timestamp("us")),
        "o_orderkey": pa.array([5, 11, 3], pa.int64()),
    })
    rows = ev.asof_join(rd.from_arrow(left), right,
                        emit=("o_orderkey",)).take_all()
    assert rows[0]["o_orderkey"] == 11


def test_grid_invdistnn(ray_session):
    """invdistnn vs a brute-force reference: only the max_points nearest
    in-radius points contribute; exact hits short-circuit."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages import gridinterp

    rng = np.random.default_rng(13)
    n = 60
    px = rng.uniform(0.5, 15.5, n)
    py = rng.uniform(0.5, 15.5, n)
    pv = rng.integers(0, 100, n).astype(np.float64)
    # one point exactly on a cell center (cell (3,2) center = (3.5, 2.5))
    px[0], py[0], pv[0] = 3.5, 2.5, 77.0
    grid = gridinterp.InterpGrid(0.0, 0.0, 16.0, 16.0, 16, 16, tile=8)
    pts = rd.from_arrow(pa.table({"lon": pa.array(px), "lat": pa.array(py),
                                  "value": pa.array(pv)}))
    K, R = 5, 6.0
    tiles_out = gridinterp.grid_interpolate(
        pts, grid, algorithm="invdistnn", radius=R, max_points=K,
        seed_all_tiles=True).to_pandas()
    full = np.full((16, 16), np.nan)
    for _, r in tiles_out.iterrows():
        a = np.frombuffer(r["data"], dtype=np.float64).reshape(
            r["height"], r["width"])
        full[r["ty"] * 8:r["ty"] * 8 + r["height"],
             r["tx"] * 8:r["tx"] * 8 + r["width"]] = a
    for cy in range(16):
        for cx in range(16):
            gx, gy = cx + 0.5, cy + 0.5
            d2 = (px - gx) ** 2 + (py - gy) ** 2
            sel = np.argsort(d2)
            sel = sel[d2[sel] <= R * R][:K]
            if len(sel) == 0:
                assert np.isnan(full[cy, cx])
                continue
            if d2[sel[0]] <= 1e-24:
                exp = pv[sel[0]]
            else:
                w = 1.0 / d2[sel]
                exp = (w * pv[sel]).sum() / w.sum()
            assert full[cy, cx] == pytest.approx(exp, rel=1e-12), (cx, cy)
