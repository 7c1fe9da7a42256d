"""Grid interpolation + windowed events tests vs brute oracles."""

import numpy as np
import pyarrow as pa
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
