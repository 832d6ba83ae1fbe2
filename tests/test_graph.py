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
