"""gdal_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference (liminlu0314/gdal, GDAL/OGR 3.4.0) on Spark's execution
engine: DataFrame/Catalyst plans, broadcast spatial indexes, vectorized
Arrow (pandas) UDFs over numpy — no per-row Python anywhere.

Modules:
  session    — tuned SparkSession builder (AQE, Arrow, shuffle sizing)
  cells      — Web-Mercator / geodetic tile + quadkey math as pure Column
               expressions (gdal2tiles.py:355-460 semantics)
  geomlite   — numpy geometry kernel (WKT, PIP, intersects, haversine,
               GDAL checksum) shared by UDFs and the local test oracle
  synth      — deterministic distributed generators (documents/zones/
               tiles/knn queries), pure functions of (seed, index)
  index      — broadcast cell-cover spatial index for candidate pruning
  joins      — point-in-polygon join (OGR left/first-match semantics),
               kNN via cell-ring expansion
  tiling     — tile assignment; raster tile-table ops (translate,
               overviews, warp) + GDAL checksum oracle
  ogrsql     — OGR SQL semantic shims (case-insensitive '=', LIKE/ILIKE,
               DISTINCT, first-match LEFT JOIN, SUBSTR, hstore)
  functions  — training-data pipeline ops: dedup (exact/minhash/simhash),
               ANN similarity search, text analysis, multimodal plumbing
  checkpoint — stage checkpointing + per-partition lineage/metrics
"""

__version__ = "0.1.0"
