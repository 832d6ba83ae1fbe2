"""Graph ops over edge tables — the GNM network layer's algorithms
(gdal/gnm/gnmgraph.cpp: DijkstraShortestPath :176,233,
ConnectedComponents :417) restated for Spark's execution model.

Single-source shortest paths runs as Pregel-style Bellman-Ford
relaxation: each round joins the frontier distances onto the edge
table, takes the per-destination min, and merges — all DataFrame ops,
converging in <= graph-diameter rounds. localCheckpoint() truncates
the lineage each round (iterative-algorithm hygiene at scale).

Connected components: iterative min-label propagation over undirected
edges, same loop skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INF = float("inf")


def sssp(edges: DataFrame, source, weight_col: str = "w",
         max_iter: int = 100) -> DataFrame:
    """(node, dist) for every node reachable from `source`.
    edges: (src, dst, w) directed."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    dist = nodes.withColumn(
        "dist",
        F.when(F.col("node") == source, 0.0).otherwise(F.lit(_INF)),
    ).localCheckpoint()

    for _ in range(max_iter):
        cand = (
            dist.filter(F.col("dist") < _INF)
            .join(edges, dist.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col(weight_col)).alias("nd"),
            )
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            dist.join(cand, "node", "left")
            .select(
                "node",
                F.least(F.col("dist"), F.coalesce(F.col("nd"), F.lit(_INF))).alias("dist"),
                (F.coalesce(F.col("nd"), F.lit(_INF)) < F.col("dist")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = merged.filter(F.col("_chg")).count()
        dist = merged.drop("_chg")
        if changed == 0:
            break
    return dist.filter(F.col("dist") < _INF)


def sssp_with_pred(edges: DataFrame, source, weight_col: str = "w",
                   max_iter: int = 100) -> DataFrame:
    """(node, dist, pred) for every node reachable from `source` —
    the path-reconstructing variant of sssp (GNMGraph::Dijkstra keeps
    the same predecessor map, gnmgraph.cpp:176). Ties in dist resolve
    to the smallest predecessor id (min over struct(nd, src)), so the
    predecessor tree — and every path walked from it — is
    deterministic given the edge table."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    dist = nodes.select(
        "node",
        F.when(F.col("node") == source, 0.0).otherwise(F.lit(_INF)).alias("dist"),
        F.lit(None).cast(nodes.schema["node"].dataType).alias("pred"),
    ).localCheckpoint()

    for _ in range(max_iter):
        cand = (
            dist.filter(F.col("dist") < _INF)
            .join(edges, dist.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                F.struct(
                    (F.col("dist") + F.col(weight_col)).alias("nd"),
                    F.col("src").alias("via"),
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.min("c").alias("c"))
        )
        merged = (
            dist.join(cand, "node", "left")
            .select(
                "node",
                F.when(
                    F.col("c.nd") < F.col("dist"), F.col("c.nd")
                ).otherwise(F.col("dist")).alias("dist"),
                F.when(
                    F.col("c.nd") < F.col("dist"), F.col("c.via")
                ).otherwise(F.col("pred")).alias("pred"),
                (F.coalesce(F.col("c.nd"), F.lit(_INF)) < F.col("dist")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = merged.filter(F.col("_chg")).count()
        dist = merged.drop("_chg")
        if changed == 0:
            break
    return dist.filter(F.col("dist") < _INF)


def sssp_multi_pred(tagged: DataFrame, sources: dict,
                    weight_col: str = "w", max_iter: int = 100) -> DataFrame:
    """Batched multi-source SSSP with predecessors: `tagged` is
    (sid, src, dst, w) — an independent subgraph per sid — and
    `sources` maps sid -> source node. All searches advance in the
    SAME Pregel rounds (state keyed by (sid, node)), so B parallel
    spur searches cost one relaxation sweep instead of B — the
    round count is max over sids, and every round is one shuffle on
    (sid, node) regardless of B. Tie-handling matches sssp_with_pred
    (min over struct(nd, via))."""
    src_rows = [(s, n) for s, n in sources.items()]
    nodes = (
        tagged.select("sid", F.col("src").alias("node"))
        .union(tagged.select("sid", F.col("dst").alias("node")))
        .distinct()
    )
    spark = tagged.sparkSession
    srcs = F.broadcast(spark.createDataFrame(
        src_rows, ["sid", "_src_node"]))
    dist = nodes.join(srcs, "sid", "left").select(
        "sid", "node",
        F.when(F.col("node") == F.col("_src_node"), 0.0)
        .otherwise(F.lit(_INF)).alias("dist"),
        F.lit(None).cast(nodes.schema["node"].dataType).alias("pred"),
    ).localCheckpoint()

    edges_a = tagged.select(
        F.col("sid").alias("_esid"), F.col("src").alias("_esrc"),
        F.col("dst").alias("_edst"), F.col(weight_col).alias("_ew"))
    for _ in range(max_iter):
        cand = (
            dist.filter(F.col("dist") < _INF)
            .join(edges_a, (F.col("sid") == F.col("_esid")) &
                  (F.col("node") == F.col("_esrc")))
            .select(
                "sid",
                F.col("_edst").alias("node"),
                F.struct(
                    (F.col("dist") + F.col("_ew")).alias("nd"),
                    F.col("_esrc").alias("via"),
                ).alias("c"),
            )
            .groupBy("sid", "node")
            .agg(F.min("c").alias("c"))
        )
        merged = (
            dist.join(cand, ["sid", "node"], "left")
            .select(
                "sid", "node",
                F.when(
                    F.col("c.nd") < F.col("dist"), F.col("c.nd")
                ).otherwise(F.col("dist")).alias("dist"),
                F.when(
                    F.col("c.nd") < F.col("dist"), F.col("c.via")
                ).otherwise(F.col("pred")).alias("pred"),
                (F.coalesce(F.col("c.nd"), F.lit(_INF)) < F.col("dist")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = merged.filter(F.col("_chg")).count()
        dist = merged.drop("_chg")
        if changed == 0:
            break
    return dist.filter(F.col("dist") < _INF)


def shortest_path(edges: DataFrame, source, target,
                  weight_col: str = "w") -> tuple[list, float]:
    """One concrete min-cost path source->target as (node list, cost),
    or ([], inf) when unreachable. CONTRACT: collects the reachable
    predecessor map to the driver — this is the GNM-network-scale
    operator (road/utility graphs, like the reference's SQLite-backed
    networks), not a corpus-scale one; the distance table itself comes
    from the distributed relaxation."""
    rows = {
        r["node"]: (r["dist"], r["pred"])
        for r in sssp_with_pred(edges, source, weight_col).collect()
    }
    if target not in rows:
        return [], _INF
    path = [target]
    while path[-1] != source:
        p = rows[path[-1]][1]
        if p is None:
            return [], _INF
        path.append(p)
    return list(reversed(path)), rows[target][0]


def k_shortest_paths(edges: DataFrame, source, target, k: int = 3,
                     weight_col: str = "w") -> list[tuple[list, float]]:
    """Yen's K-shortest loopless paths (GNMGraph::KShortestPaths,
    gnm/gnmgraph.cpp:238 — the reference runs repeated Dijkstra over a
    temporarily modified graph; same structure here with each spur
    search a distributed sssp over the edge table filtered by
    broadcast-small exclusion lists). Candidates are selected by
    (cost, path) so the result is deterministic under cost ties.
    Returns up to k (path, cost) pairs, cheapest first."""
    first = shortest_path(edges, source, target, weight_col)
    if not first[0]:
        return []

    edge_w: dict = {}

    def fetch_weights(path):
        """Cache weights of the path's edges (one tiny filtered collect
        per new accepted path; parallel edges take the min, matching
        the relaxation)."""
        missing = [
            (path[i], path[i + 1]) for i in range(len(path) - 1)
            if (path[i], path[i + 1]) not in edge_w
        ]
        if not missing:
            return
        cond = None
        for s, d in missing:
            c = (F.col("src") == s) & (F.col("dst") == d)
            cond = c if cond is None else (cond | c)
        for r in (edges.filter(cond).groupBy("src", "dst")
                  .agg(F.min(weight_col).alias("_w")).collect()):
            edge_w[(r["src"], r["dst"])] = float(r["_w"])

    fetch_weights(first[0])
    A = [first]
    B: list[tuple[float, list]] = []
    while len(A) < k:
        prev_path = A[-1][0]
        # all spur searches of this Yen iteration batch into ONE
        # multi-source relaxation (sid = spur index): B spurs cost one
        # Pregel sweep instead of B sequential ones — the round count
        # is the max over spurs and each round is a single shuffle.
        spurs = []
        tagged = None
        for si in range(len(prev_path) - 1):
            spur = prev_path[si]
            root = prev_path[: si + 1]
            removed_edges = {
                (p[0][si], p[0][si + 1])
                for p in A
                if len(p[0]) > si + 1 and p[0][: si + 1] == root
            }
            removed_nodes = set(root[:-1])
            g = edges
            if removed_nodes:
                g = g.filter(~F.col("src").isin(list(removed_nodes))
                             & ~F.col("dst").isin(list(removed_nodes)))
            cond = None
            for s, d in removed_edges:
                c = (F.col("src") == s) & (F.col("dst") == d)
                cond = c if cond is None else (cond | c)
            if cond is not None:
                g = g.filter(~cond)
            g = g.select(F.lit(si).alias("sid"), "src", "dst", weight_col)
            tagged = g if tagged is None else tagged.unionByName(g)
            spurs.append((si, spur, root))
        res = sssp_multi_pred(
            tagged, {si: spur for si, spur, _ in spurs}, weight_col)
        by_sid: dict = {}
        for r in res.collect():
            by_sid.setdefault(r["sid"], {})[r["node"]] = (
                r["dist"], r["pred"])
        for si, spur, root in spurs:
            rows = by_sid.get(si, {})
            if target not in rows:
                continue
            spur_path = [target]
            while spur_path[-1] != spur:
                p = rows[spur_path[-1]][1]
                if p is None:
                    spur_path = None
                    break
                spur_path.append(p)
            if spur_path is None:
                continue
            spur_path = list(reversed(spur_path))
            spur_cost = rows[target][0]
            total = root[:-1] + spur_path
            root_cost = sum(
                edge_w[(root[i], root[i + 1])] for i in range(len(root) - 1)
            )
            cand = (spur_cost + root_cost, total)
            if cand not in B and not any(p == total for p, _ in A):
                B.append(cand)
        if not B:
            break
        B.sort(key=lambda c: (c[0], c[1]))
        cost, path = B.pop(0)
        fetch_weights(path)
        A.append((path, cost))
    return A


def connected_components(edges: DataFrame, max_iter: int = 100,
                         driver_cutoff: int = 1_000_000) -> DataFrame:
    """(node, component) with component = min node id of the component
    (GNMGraph::ConnectedComponents, gnmgraph.cpp:417). Treats edges as
    undirected.

    Adaptive execution, AQE-style: one bounded `take(driver_cutoff+1)`
    probes the edge count. At or under the cutoff (<= ~32 MB of id
    pairs — footprint/sieve/contour equivalence graphs are
    perimeter-bound and land here even for very large rasters) the
    rows are ALREADY on the driver, so a local union-find finishes in
    one job instead of O(log diameter) iterative rounds — the
    iterative loop's per-round scheduling latency dominates exactly
    when the data is this small.  Above the cutoff nothing was
    materialized beyond the probe and the distributed loop runs:

    each round does (a) a neighbor-min propagation and (b) a pointer
    jump (component := component-of-component — valid because labels
    are always node ids). The jump halves label chains, so long thin
    components (a region snaking across thousands of raster tiles)
    converge in O(log diameter) rounds instead of O(diameter)."""
    if driver_cutoff > 0:
        head = edges.select("src", "dst").take(driver_cutoff + 1)
        if len(head) <= driver_cutoff:
            return _cc_local(edges.sparkSession, head)
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    lab = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        cand = (
            lab.join(und, lab.node == und.src)
            .select(F.col("dst").alias("node"), F.col("component").alias("nc"))
            .groupBy("node")
            .agg(F.min("nc").alias("nc"))
        )
        merged = (
            lab.join(cand, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("nc", F.col("component"))).alias("component"),
                (F.coalesce(F.col("nc"), F.col("component")) < F.col("component")).alias("_chg"),
            )
        )
        # pointer jump: component <- label(component)
        par = merged.select(
            F.col("node").alias("_pn"), F.col("component").alias("_pc")
        )
        merged = (
            merged.join(par, merged.component == par._pn, "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce("_pc", F.col("component"))).alias("component"),
                (
                    F.col("_chg")
                    | (F.coalesce("_pc", F.col("component")) < F.col("component"))
                ).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = merged.filter(F.col("_chg")).count()
        lab = merged.drop("_chg")
        if changed == 0:
            break
    return lab


def _cc_local(spark, rows) -> DataFrame:
    """Driver union-find over a bounded edge list (path-halving find,
    min-id component labels — identical output contract to the
    distributed loop)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while x != r:                      # path compression
            nxt = parent.get(x, x)
            parent[x] = r
            if nxt == x:
                break
            x = nxt
        return r

    for e in rows:
        a, b = find(e[0]), find(e[1])
        if a != b:
            parent[max(a, b)] = min(a, b)  # min id stays the root
    nodes = set()
    for e in rows:
        nodes.add(e[0])
        nodes.add(e[1])
    out = [(n, find(n)) for n in sorted(nodes)]
    is_int = all(isinstance(n, int) for n in nodes)
    t = T.LongType() if is_int else T.StringType()
    return spark.createDataFrame(
        out, T.StructType([
            T.StructField("node", t),
            T.StructField("component", t),
        ]))


def block_nodes(edges: DataFrame, blocked) -> DataFrame:
    """GNM blocked-vertex semantics (gnm/gnmgraph.cpp m_stBlockedVertices:
    DijkstraShortestPathTree skips blocked vertices entirely): drop
    every edge incident to a blocked node. `blocked` is a small
    driver-side collection — it ships as an IN-list literal (codegen),
    matching the reference where the block set is in-memory state."""
    b = [x for x in blocked]
    if not b:
        return edges
    return edges.filter(~F.col("src").isin(b) & ~F.col("dst").isin(b))


def sssp_blocked(edges: DataFrame, source, blocked,
                 weight_col: str = "w", max_iter: int = 100) -> DataFrame:
    """Dijkstra with blocked vertices (GNMGraph::DijkstraShortestPath
    honoring the block list, gnm/gnmgraph.cpp:176 + ChangeBlockState):
    routes must detour around blocked nodes; a blocked node is
    unreachable by definition."""
    return sssp(block_nodes(edges, blocked), source, weight_col, max_iter)
