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


def connected_components(edges: DataFrame, max_iter: int = 100) -> DataFrame:
    """(node, component) with component = min node id of the component
    (GNMGraph::ConnectedComponents, gnmgraph.cpp:417). Treats edges as
    undirected.

    Each round does (a) a neighbor-min propagation and (b) a pointer
    jump (component := component-of-component — valid because labels
    are always node ids). The jump halves label chains, so long thin
    components (a region snaking across thousands of raster tiles)
    converge in O(log diameter) rounds instead of O(diameter)."""
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
