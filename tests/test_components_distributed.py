"""Round-4 ADVICE fix: _components_distributed pointer doubling.

One-hop min-label propagation needs ~diameter rounds; the round cap (64)
previously returned silently-wrong split components on long snaking graphs.
Pointer doubling converges in O(log4 diameter) rounds, and a loop exit
without a fixpoint now raises instead of returning wrong labels.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages.polygonize import _components_distributed


def _path_pairs(n: int):
    return rd.from_arrow(pa.table({
        "a": pa.array(np.arange(n - 1), pa.int64()),
        "b": pa.array(np.arange(1, n), pa.int64()),
    }))


def test_long_path_converges_in_log_rounds(ray_session):
    # diameter 5000 >> 12 one-hop rounds; doubling reaches 3*4^r per round
    n = 5000
    labs = _components_distributed(_path_pairs(n), max_iters=12).take_all()
    assert len(labs) == n
    assert all(r["label"] == 0 for r in labs)


def test_non_convergence_raises(ray_session):
    with pytest.raises(RuntimeError, match="did not|still decreasing|rounds"):
        _components_distributed(_path_pairs(5000), max_iters=2)


def test_multiple_components(ray_session):
    # two components + a self-contained star; labels = min node per component
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([10, 11, 50, 70, 70, 70], pa.int64()),
        "b": pa.array([11, 12, 51, 71, 72, 73], pa.int64()),
    }))
    got = {r["node"]: r["label"]
           for r in _components_distributed(pairs, max_iters=8).take_all()}
    assert got == {10: 10, 11: 10, 12: 10, 50: 50, 51: 50,
                   70: 70, 71: 70, 72: 70, 73: 70}
