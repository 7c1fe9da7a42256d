"""Progress surface (§2.13): GDALProgressFunc-shaped callbacks, the terminal
dot line, the counting actor, and partition-write progress + cancel."""

import io

import numpy as np
import pyarrow as pa
import pytest


def test_term_progress_format():
    from gdal_ray.state.progress import TermProgress

    out = io.StringIO()
    p = TermProgress(stream=out)
    for f in (0.0, 0.12, 0.31, 0.55, 0.9, 1.0):
        assert p(f) is True
    assert out.getvalue() == (
        "0...10...20...30...40...50...60...70...80...90...100 - done.\n")
    # idempotent at 1.0; never rewinds
    p(1.0)
    p(0.2)
    assert out.getvalue().count("done") == 1


def test_scaled_progress():
    from gdal_ray.state.progress import scaled_progress

    seen = []
    inner = lambda c, m="": (seen.append(round(c, 3)), True)[1]
    cb = scaled_progress(0.5, 0.75, inner)
    cb(0.0)
    cb(0.4)
    cb(1.0)
    assert seen == [0.5, 0.6, 0.75]
    with pytest.raises(ValueError):
        scaled_progress(0.8, 0.2, inner)


def test_progress_actor_tracking(ray_session):
    import ray
    import ray.data as rd

    from gdal_ray.state.progress import make_progress_actor, track_progress

    actor = make_progress_actor()
    ray.get(actor.set_total.remote("scan", 1000))
    ds = rd.from_arrow(pa.table({"x": np.arange(1000)}))
    tracked = track_progress(ds, "scan", actor)
    assert tracked.count() == 1000  # passthrough does not alter the stream
    # fire-and-forget adds have landed once the stream is consumed
    import time

    for _ in range(50):
        snap = ray.get(actor.snapshot.remote())
        if snap["counts"].get("scan", 0) == 1000:
            break
        time.sleep(0.1)
    assert snap["counts"]["scan"] == 1000
    assert snap["totals"]["scan"] == 1000


def test_write_partitioned_progress_and_cancel(ray_session, tmp_path):
    import ray.data as rd

    from gdal_ray.sources.io import write_partitioned

    ds = rd.from_arrow(pa.table({"k": np.arange(40) % 4,
                                 "v": np.arange(40)}))

    def part_filter(d, pid):
        want = int(pid)
        return d.map_batches(
            lambda t: t.filter(pa.compute.equal(t["k"], want)),
            batch_format="pyarrow")

    fracs = []
    root = str(tmp_path / "out")
    written = write_partitioned(
        ds, root, ["0", "1", "2", "3"], part_filter,
        progress_callback=lambda c, m="": (fracs.append(round(c, 3)), True)[1])
    assert written == ["0", "1", "2", "3"]
    assert fracs == [0.25, 0.5, 0.75, 1.0]

    # cancel after the first partition of a fresh root: partitions already
    # recorded stay valid, the rest are untouched
    root2 = str(tmp_path / "out2")
    calls = []
    written2 = write_partitioned(
        ds, root2, ["0", "1", "2", "3"], part_filter,
        progress_callback=lambda c, m="": (calls.append(c), False)[1])
    assert written2 == ["0"]
    # resumed run reports skipped partitions in its fractions and finishes
    fr3 = []
    written3 = write_partitioned(
        ds, root2, ["0", "1", "2", "3"], part_filter,
        progress_callback=lambda c, m="": (fr3.append(round(c, 3)), True)[1])
    assert written3 == ["1", "2", "3"]
    assert fr3 == [0.25, 0.5, 0.75, 1.0]
