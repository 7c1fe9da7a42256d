"""GNM network analysis tests (gnm/gnmgraph.cpp semantics): SSSP kernel vs
a reference Dijkstra, path extraction, Yen K-shortest, bulk distance
annotation stage, distributed connected components."""

import heapq

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import network


def _ref_dijkstra(edges, source, directed=False):
    """Plain heapq Dijkstra over an adjacency dict — the oracle."""
    adj = {}
    for s, d, c in edges:
        adj.setdefault(s, []).append((d, c))
        if not directed:
            adj.setdefault(d, []).append((s, c))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, np.inf):
            continue
        for v, c in adj.get(u, []):
            nd = dd + c
            if nd < dist.get(v, np.inf):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _random_graph(rng, n=200, m=800, wmax=10):
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    s, d = s[keep], d[keep]
    c = rng.integers(1, wmax, len(s)).astype(np.float64)
    return pa.table({"src": pa.array(s, pa.int64()),
                     "dst": pa.array(d, pa.int64()),
                     "cost": pa.array(c)})


@pytest.mark.parametrize("directed", [False, True])
def test_sssp_matches_dijkstra(directed):
    rng = np.random.default_rng(5)
    t = _random_graph(rng)
    trip = list(zip(t["src"].to_pylist(), t["dst"].to_pylist(),
                    t["cost"].to_pylist()))
    ref = _ref_dijkstra(trip, 0, directed)
    nodes, indptr, indices, costs = network.build_csr(t, directed=directed)
    slot = int(np.searchsorted(nodes, 0))
    dist, pred = network.sssp(indptr, indices, costs, slot)
    for i, nd in enumerate(nodes):
        exp = ref.get(int(nd), np.inf)
        assert dist[i] == pytest.approx(exp), f"node {nd}"
    # every finite pred chain walks back to the source with matching cost
    for i in range(len(nodes)):
        if np.isfinite(dist[i]) and i != slot:
            p = network.extract_path(pred, slot, i)
            assert p[0] == slot and p[-1] == i


def test_dijkstra_path_grid_wall():
    # 16x16 unit grid with a wall between x=7 and x=8 except at y=12
    edges = _grid_wall_edges(16, 7, 12)
    path, cost = network.dijkstra_path(edges, 0, 12 * 16 + 15)  # (15,12)
    assert cost == 15 + 12  # gap on a monotone path: plain manhattan
    path2, cost2 = network.dijkstra_path(edges, 0, 2 * 16 + 15)  # (15,2)
    assert cost2 == 15 + 2 + 2 * (12 - 2)  # forced detour via the gap
    assert path2[0] == 0 and path2[-1] == 2 * 16 + 15
    # path edges are all unit grid steps
    for a, b in zip(path2, path2[1:]):
        ax, ay, bx, by = a % 16, a // 16, b % 16, b // 16
        assert abs(ax - bx) + abs(ay - by) == 1


def _grid_wall_edges(n, wall_x, gap_y):
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    right_src = (ys[:, :-1] * n + xs[:, :-1]).ravel()
    right_dst = right_src + 1
    blocked = (right_src % n == wall_x) & (right_src // n != gap_y)
    down_src = (ys[:-1, :] * n + xs[:-1, :]).ravel()
    down_dst = down_src + n
    s = np.concatenate([right_src[~blocked], down_src])
    d = np.concatenate([right_dst[~blocked], down_dst])
    return pa.table({"src": pa.array(s, pa.int64()),
                     "dst": pa.array(d, pa.int64())})


def test_unreachable_is_inf():
    t = pa.table({"src": pa.array([0, 5], pa.int64()),
                  "dst": pa.array([1, 6], pa.int64())})
    path, cost = network.dijkstra_path(t, 0, 1)
    assert path == [0, 1] and cost == 1.0
    path, cost = network.dijkstra_path(t, 0, 5)
    assert path == [] and not np.isfinite(cost)


def test_negative_cost_rejected():
    t = pa.table({"src": pa.array([0], pa.int64()),
                  "dst": pa.array([1], pa.int64()),
                  "cost": pa.array([-1.0])})
    with pytest.raises(ValueError):
        network.build_csr(t)


def test_k_shortest_simple():
    # diamond with a longer bypass: paths 0-1-3 (2), 0-2-3 (3), 0-4-3 (7)
    t = pa.table({"src": pa.array([0, 1, 0, 2, 0, 4], pa.int64()),
                  "dst": pa.array([1, 3, 2, 3, 4, 3], pa.int64()),
                  "cost": pa.array([1.0, 1.0, 1.0, 2.0, 3.0, 4.0])})
    out = network.k_shortest_paths(t, 0, 3, 3)
    assert [c for _p, c in out] == [2.0, 3.0, 7.0]
    assert out[0][0] == [0, 1, 3]
    assert out[1][0] == [0, 2, 3]
    assert out[2][0] == [0, 4, 3]
    # k larger than the number of simple paths truncates
    out = network.k_shortest_paths(t, 0, 3, 10)
    assert len(out) == 3


def test_k_shortest_loopless():
    # graph with a cycle: accepted paths must stay simple
    t = pa.table({"src": pa.array([0, 1, 2, 1, 3], pa.int64()),
                  "dst": pa.array([1, 2, 1, 3, 4], pa.int64()),
                  "cost": pa.array([1.0, 1.0, 1.0, 2.0, 1.0])})
    out = network.k_shortest_paths(t, 0, 4, 4, directed=True)
    for p, _c in out:
        assert len(p) == len(set(p))


def test_bulk_distance_stage(ray_session):
    import ray.data as rd

    edges = _grid_wall_edges(16, 7, 12)
    targets = pa.table({"node": pa.array(np.arange(256), pa.int64())})
    out = network.shortest_path_distances(
        rd.from_arrow(targets), edges, source=0).to_pandas()
    out = out.set_index("node")["net_dist"]
    for node in range(256):
        x, y = node % 16, node // 16
        exp = x + y + (2 * (12 - y) if (x >= 8 and y < 12) else 0)
        assert out[node] == exp, (x, y)


def test_connected_components_net(ray_session):
    import ray.data as rd

    # 8 chains of 64 nodes (diameter stress for the pointer doubling)
    n, chain = 512, 64
    i = np.arange(n - 1)
    keep = (i % chain) != chain - 1
    edges = pa.table({"src": pa.array(i[keep], pa.int64()),
                      "dst": pa.array(i[keep] + 1, pa.int64())})
    labels = network.connected_components_net(
        rd.from_arrow(edges)).to_pandas()
    assert len(labels) == n
    got = labels.set_index("node")["label"]
    for node in range(n):
        assert got[node] == (node // chain) * chain
