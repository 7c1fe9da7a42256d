"""Packed STRtree vs brute-force oracles."""

import numpy as np

from gdal_ray.state.strtree import STRtree


def _random_boxes(n, seed):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(0, 1000, (n, 2))
    return np.hstack([lo, lo + rng.uniform(0.01, 20, (n, 2))]), rng


def test_query_box_matches_brute():
    for n in (0, 1, 7, 16, 17, 300, 5000):
        boxes, rng = _random_boxes(n, n + 1)
        t = STRtree(boxes)
        for _ in range(10):
            q = rng.uniform(0, 1000, 2)
            qmax = q + rng.uniform(1, 100, 2)
            got = set(t.query_box(q[0], q[1], qmax[0], qmax[1]).tolist())
            if n:
                hit = (
                    (boxes[:, 0] <= qmax[0])
                    & (boxes[:, 2] >= q[0])
                    & (boxes[:, 1] <= qmax[1])
                    & (boxes[:, 3] >= q[1])
                )
                assert got == set(np.nonzero(hit)[0].tolist())
            else:
                assert got == set()


def test_query_points_matches_brute():
    boxes, rng = _random_boxes(2000, 42)
    t = STRtree(boxes)
    px = rng.uniform(0, 1000, 3000)
    py = rng.uniform(0, 1000, 3000)
    r, c = t.query_points(px, py)
    m = (
        (px[:, None] >= boxes[None, :, 0])
        & (px[:, None] <= boxes[None, :, 2])
        & (py[:, None] >= boxes[None, :, 1])
        & (py[:, None] <= boxes[None, :, 3])
    )
    rb, cb = np.nonzero(m)
    assert set(zip(r.tolist(), c.tolist())) == set(zip(rb.tolist(), cb.tolist()))


def test_nearest_matches_brute():
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 100, (4000, 2))
    t = STRtree(np.hstack([pts, pts]))
    for _ in range(50):
        q = rng.uniform(0, 100, 2)
        idx, d2 = t.nearest(q[0], q[1], k=7)
        bd = ((pts[:, 0] - q[0]) ** 2 + (pts[:, 1] - q[1]) ** 2)
        brute = np.lexsort((np.arange(len(pts)), bd))[:7]
        assert np.allclose(np.sort(d2), np.sort(bd[brute]))


def test_small_trees():
    t = STRtree(np.array([[0, 0, 1, 1]], float))
    assert t.query_box(0.5, 0.5, 2, 2).tolist() == [0]
    idx, d2 = t.nearest(5, 0.5, k=1)
    assert idx.tolist() == [0] and d2[0] == 16.0
