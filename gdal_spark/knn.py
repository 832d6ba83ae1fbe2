"""kNN join via cell-ring expansion.

The reference's nearest-neighbor machinery lives inside gridding: a
quadtree-accelerated search (alg/gdalgrid.cpp:1689
GDALGridContextCreateQuadTree over cpl_quad_tree.cpp:149) feeding
GGA_NearestNeighbor / IDW (gdal/alg/gdal_alg.h:438-451). Restated for
Spark:

  1. queries (small side) expand to all index cells within a Chebyshev
     ring radius r of their own cell — broadcast map (cell -> queries)
  2. the big points side joins that map on its cell id (broadcast hash
     join, no shuffle of the points) -> haversine in column math
  3. top-k per query via window row_number over the (tiny) candidate
     set — the only shuffle, carrying candidates only
  4. exactness guard: a query's answer is exact iff its k-th neighbor
     distance <= the minimum great-circle distance to the boundary of
     the covered cell block. Queries failing the guard (or with < k
     candidates) escalate to the next ring radius (driver loop,
     geometrically growing r) — the cell-ring expansion of SURVEY §2.3.

At 10^12 points the expensive side never shuffles; candidate volume is
(#queries x points-per-cell x ring area), controlled by the level.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import geomlite as G
from .cells import geo_cell, np_geo_cell, pack_geo_cell


def _haversine_col(lon1, lat1, lon2, lat2):
    """Great-circle meters as pure column math (mean Earth radius —
    must match geomlite.haversine exactly)."""
    r1lon, r1lat = F.radians(lon1), F.radians(lat1)
    r2lon, r2lat = F.radians(lon2), F.radians(lat2)
    a = (
        F.pow(F.sin((r2lat - r1lat) / 2), 2)
        + F.cos(r1lat) * F.cos(r2lat) * F.pow(F.sin((r2lon - r1lon) / 2), 2)
    )
    return 2.0 * G.MEAN_EARTH_RADIUS * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def _query_cells(queries: pd.DataFrame, level: int, radius: int) -> pd.DataFrame:
    """Explode each query to its cells within Chebyshev ring `radius`,
    plus the guard distance (meters to the covered block's boundary)."""
    n = 1 << level
    cell_w = 360.0 / n
    cell_h = 180.0 / n
    rows = []
    for q in queries.itertuples(index=False):
        cx = min(max(int(math.floor((q.lon + 180.0) / 360.0 * n)), 0), n - 1)
        cy = min(max(int(math.floor((q.lat + 90.0) / 180.0 * n)), 0), n - 1)
        # guard: min distance from the query point to the boundary of
        # the covered lon/lat block (conservative planar->sphere bound:
        # use great-circle distances to the four boundary lines)
        lon_lo = max(-180.0, -180.0 + (cx - radius) * cell_w)
        lon_hi = min(180.0, -180.0 + (cx + radius + 1) * cell_w)
        lat_lo = max(-90.0, -90.0 + (cy - radius) * cell_h)
        lat_hi = min(90.0, -90.0 + (cy + radius + 1) * cell_h)
        cand = []
        if lon_lo > -180.0:
            cand.append(G.haversine(q.lon, q.lat, lon_lo, q.lat))
        if lon_hi < 180.0:
            cand.append(G.haversine(q.lon, q.lat, lon_hi, q.lat))
        if lat_lo > -90.0:
            cand.append(G.haversine(q.lon, q.lat, q.lon, lat_lo))
        if lat_hi < 90.0:
            cand.append(G.haversine(q.lon, q.lat, q.lon, lat_hi))
        guard = float(min(cand)) if cand else float("inf")
        for dx in range(-radius, radius + 1):
            for dy in range(-radius, radius + 1):
                ccx, ccy = cx + dx, cy + dy
                if 0 <= ccy < n:
                    ccx = ccx % n  # wrap the antimeridian
                    rows.append(
                        {
                            "q_id": int(q.q_id),
                            "q_lon": float(q.lon),
                            "q_lat": float(q.lat),
                            "k": int(q.k),
                            "cell_id": pack_geo_cell(ccx, ccy, level),
                            "guard_m": guard,
                        }
                    )
    return pd.DataFrame(rows)


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    queries: pd.DataFrame,
    level: int = 6,
    initial_radius: int = 1,
    max_rounds: int = 6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact kNN of each query against `points` (needs lon/lat columns).

    Returns (q_id, doc_id, dist_m, rank) with rank 1..k, ties broken by
    id_col ascending (FIXTURES.md golden #4). Driver loop escalates
    unresolved queries to geometrically larger rings; each round is a
    broadcast join — the points table never shuffles.

    CONTRACT: `queries` is the SMALL side by design (a pandas frame,
    like the broadcast zone cover) — per-round state is O(q * k) rows
    on the driver and each escalation round is one full Spark job, so
    this is a q <= ~10^5 interactive-lookup operator, not a
    point-vs-point self-join. For kNN with a LARGE query side, run the
    queries as a DataFrame through the same cell-ring expansion with a
    shuffle join on cell_id instead (the pip_join candidate pattern);
    the escalation then becomes per-row radius columns re-joined each
    round rather than a driver-filtered pandas frame."""
    pts = points.select(
        F.col(id_col), F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat"),
        geo_cell(F.col("lon"), F.col("lat"), level).alias("cell_id"),
    )
    pending = queries.copy()
    results: list = []
    radius = initial_radius
    for _ in range(max_rounds):
        if len(pending) == 0:
            break
        qc = spark.createDataFrame(_query_cells(pending, level, radius))
        cand = pts.join(F.broadcast(qc), "cell_id", "inner")
        cand = cand.withColumn(
            "dist_m",
            _haversine_col(F.col("q_lon"), F.col("q_lat"), F.col("p_lon"), F.col("p_lat")),
        )
        w = Window.partitionBy("q_id").orderBy(F.asc("dist_m"), F.asc(id_col))
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("q_id", id_col, "dist_m", "rank", "k", "guard_m")
        )
        got = topk.toPandas()
        counts = got.groupby("q_id").agg(nk=("rank", "max"), kth=("dist_m", "max"))
        merged = pending.merge(counts, left_on="q_id", right_index=True, how="left")
        guards = (
            got.groupby("q_id")["guard_m"].first()
            if len(got)
            else pd.Series(dtype=float)
        )
        merged = merged.merge(
            guards.rename("guard_m"), left_on="q_id", right_index=True, how="left"
        )
        ok = (
            merged["nk"].fillna(0).astype(int) >= merged["k"]
        ) & (merged["kth"] <= merged["guard_m"])
        done_ids = set(merged.loc[ok.fillna(False), "q_id"].tolist())
        if done_ids:
            results.append(got[got["q_id"].isin(done_ids)][["q_id", id_col, "dist_m", "rank"]])
        pending = merged.loc[~ok.fillna(False), ["q_id", "lon", "lat", "k"]]
        radius *= 2
    if len(pending):
        raise RuntimeError(
            f"kNN did not converge for {len(pending)} queries within "
            f"{max_rounds} rounds — raise max_rounds or lower level"
        )
    out = pd.concat(results, ignore_index=True)
    return spark.createDataFrame(out)
