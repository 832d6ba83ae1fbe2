"""Graph ops vs single-node Dijkstra / union-find oracles."""

import heapq

import pandas as pd

from gdal_spark.graph import connected_components, sssp


def _edges(n=60):
    rows = []
    for i in range(n):
        for step, w in ((1, 1.0 + i % 5), (7, 3.0), (13, 5.0)):
            if i + step < n:
                rows.append((i, i + step, w))
    return rows


def _dijkstra(rows, n, src=0):
    adj = {}
    for s, d, w in rows:
        adj.setdefault(s, []).append((d, w))
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_golden(spark):
    rows = _edges()
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    got = {r["node"]: r["dist"] for r in sssp(edges, 0).collect()}
    exp = _dijkstra(rows, 60)
    assert got == exp


def test_connected_components(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 1.0), (8, 9, 1.0), (9, 5, 1.0)]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 8: 5, 9: 5}


def test_k_shortest_paths_yen(spark):
    """Yen's over the distributed SSSP: k loopless paths, strictly
    nondecreasing costs, all simple, all distinct, first = SSSP
    optimum; brute-force DFS oracle on a small graph."""
    import itertools

    from gdal_spark.graph import k_shortest_paths, shortest_path

    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0),   # cheap chain
        (0, 2, 2.5), (1, 3, 2.7), (0, 3, 4.5),   # alternates
        (2, 1, 0.4), (3, 0, 9.9),
    ]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = k_shortest_paths(df, 0, 3, k=3)
    assert len(got) == 3
    costs = [c for _, c in got]
    assert costs == sorted(costs)
    paths = [tuple(p) for p, _ in got]
    assert len(set(paths)) == 3
    for p in paths:
        assert len(set(p)) == len(p)  # loopless
        assert p[0] == 0 and p[-1] == 3

    # brute force: all simple paths 0 -> 3
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))

    def all_paths(u, seen, cost):
        if u == 3:
            yield cost, tuple(seen)
            return
        for v, w in adj.get(u, []):
            if v not in seen:
                yield from all_paths(v, seen + [v], cost + w)

    best = sorted(all_paths(0, [0], 0.0))[:3]
    assert [round(c, 9) for c, _ in best] == [round(c, 9) for c in costs]
    assert [p for _, p in best] == list(paths)

    sp, sc = shortest_path(df, 0, 3)
    assert tuple(sp) == paths[0] and abs(sc - costs[0]) < 1e-12


def test_sssp_blocked_routes_around(spark):
    """GNM blocked vertices (gnm/gnmgraph.cpp block list): blocking the
    short middle hop forces the detour; the blocked node itself becomes
    unreachable."""
    from gdal_spark.graph import sssp, sssp_blocked

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 4, 1.0), (1, 3, 5.0), (3, 4, 5.0)],
        ["src", "dst", "w"],
    )
    base = {r.node: r.dist for r in sssp(edges, 1).collect()}
    assert base[4] == 2.0
    blk = {r.node: r.dist for r in sssp_blocked(edges, 1, [2]).collect()}
    assert blk[4] == 10.0
    assert 2 not in blk
