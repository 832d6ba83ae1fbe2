"""ogrlineref — distributed linear referencing.

Reference: gdal/apps/ogrlineref.cpp —
  - CreatePartsFromLineString (:597): project repers (mileposts with an
    M field) onto the path, split the path into parts between
    consecutive reper positions (plus a leading part from the path
    start and a trailing part to the path end), each part carrying
    (beg, end, scale_factor = part_length / M_span); with -s, parts are
    re-quantized at picket (step) boundaries.
  - GetPosition (:1171): nearest part to (x, y), position =
    beg + distance_along_part / scale_factor.
  - GetCoordinates (:1236): part with beg < m < end, point =
    Value((m - beg) * scale_factor).
  - CreateSubline (:432): concatenated clip of the parts overlapping
    [mb, me].
  Scalar semantics (Project / Value / getSubLine) follow
  ogr/ogrlinestring.cpp:1949,2022,2076 — the same contracts as the
  tested scalar kernels in geometry.py (line_project / line_value /
  line_sub), which serve as the local oracle.

Spark lowering — the reference is a single-path driver loop; at scale
the input is a LAYER of paths (a road/rail network), so every
operation here is keyed by path (or part) and runs as pure Catalyst
column math over a SEGMENTS relation:

  path_segments:  WKT -> one row per segment with cumulative distance
                  (split/posexplode + one keyed window per path — the
                  only shuffle, and it is per-path, never global).
  project_points: points x segments equi-join on the path key, clamped
                  dot-product projection, lexicographic struct-MIN for
                  the earliest-segment tie-break (no UDF).
  create_parts:   reper projections -> consecutive-interval windows ->
                  segment-range join -> WKT assembly with
                  sort_array + concat_ws. Optional step quantization
                  generates pickets JVM-side with F.sequence.
  get_position /  the same joins in reverse; all shuffles are keyed by
  get_coordinates path/part, so 10^9 paths spread over the cluster.

The planar (projected-CRS) branch of the reference is implemented;
the geographic branch's per-part UTM re-measure
(ogrlineref.cpp:660-700) is intentionally out of scope and documented
(reproject first, as the reference itself recommends for accuracy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

DELTA = 1e-8  # ogrlineref.cpp:58

# Coordinate rendering: Spark's CAST(double AS STRING) is Java
# Double.toString — exact shortest round-trip, matching the
# reference's OGRFormatDouble fidelity (ogrutils.cpp) without the
# silent truncation of a fixed %.10g.


def _parse_line(wkt):
    """LINESTRING WKT -> array<struct<x,y>> with JVM expressions only."""
    body = F.regexp_replace(wkt, r"^\s*LINESTRING\s*\(\s*|\s*\)\s*$", "")
    return F.transform(
        F.split(body, r"\s*,\s*"),
        lambda p: F.struct(
            F.split(p, r"\s+")[0].cast("double").alias("x"),
            F.split(p, r"\s+")[1].cast("double").alias("y"),
        ),
    )


def path_segments(paths: DataFrame, id_col: str = "path_id",
                  wkt_col: str = "wkt") -> DataFrame:
    """Segment relation: (id, seg_i, x0, y0, x1, y1, seg_len, cum0,
    path_len, n_seg). cum0 = distance from the path start to the
    segment start. Zero-length segments are kept (seg_len 0) — the
    projection and Value kernels skip them arithmetically, matching
    ogrlinestring.cpp's dfSegLength > 0 guards."""
    pts = _parse_line(F.col(wkt_col))
    df = paths.select(
        F.col(id_col).alias("_pid"),
        F.posexplode(
            F.arrays_zip(
                F.slice(pts, 1, F.size(pts) - 1).alias("p0"),
                F.slice(pts, 2, F.size(pts) - 1).alias("p1"),
            )
        ).alias("seg_i", "_seg"),
    ).select(
        F.col("_pid").alias(id_col), "seg_i",
        F.col("_seg.p0.x").alias("x0"), F.col("_seg.p0.y").alias("y0"),
        F.col("_seg.p1.x").alias("x1"), F.col("_seg.p1.y").alias("y1"),
    ).withColumn(
        "seg_len",
        F.hypot(F.col("x1") - F.col("x0"), F.col("y1") - F.col("y0")),
    )
    w = Window.partitionBy(id_col).orderBy("seg_i")
    wall = Window.partitionBy(id_col)
    return (
        df.withColumn(
            "cum0",
            F.coalesce(
                F.sum("seg_len").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0)),
        )
        .withColumn("path_len", F.sum("seg_len").over(wall))
        .withColumn("n_seg", F.count("*").over(wall))
    )


def project_points(segments: DataFrame, points: DataFrame,
                   id_col: str = "path_id",
                   keys: list[str] | None = None) -> DataFrame:
    """OGRSimpleCurve::Project distributed: for every point row
    (keys..., id_col, x, y) the distance from the path origin to the
    closest point on the path (`along`) and the point-to-path distance
    (`dist`). Earliest-segment tie-break via lexicographic struct MIN
    (strict-less scan of ogrlinestring.cpp:2022)."""
    keys = keys if keys is not None else ["x", "y"]
    j = points.join(segments, on=id_col)
    seg2 = F.col("seg_len") * F.col("seg_len")
    t = F.when(
        seg2 > 0,
        ((F.col("x") - F.col("x0")) * (F.col("x1") - F.col("x0"))
         + (F.col("y") - F.col("y0")) * (F.col("y1") - F.col("y0"))) / seg2,
    ).otherwise(F.lit(0.0))
    t = F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
    cx = F.col("x0") + t * (F.col("x1") - F.col("x0"))
    cy = F.col("y0") + t * (F.col("y1") - F.col("y0"))
    d2 = ((F.col("x") - cx) * (F.col("x") - cx)
          + (F.col("y") - cy) * (F.col("y") - cy))
    j = j.filter(seg2 > 0).withColumn(
        "_cand",
        F.struct(
            d2.alias("d2"), F.col("seg_i"),
            (F.col("cum0") + t * F.col("seg_len")).alias("along"),
            F.col("path_len"),
        ),
    )
    best = j.groupBy(id_col, *keys).agg(F.min("_cand").alias("b"))
    return best.select(
        id_col, *keys,
        F.col("b.along").alias("along"),
        F.sqrt(F.col("b.d2")).alias("dist"),
        F.col("b.path_len").alias("path_len"),
    )


def _slice_parts(segments: DataFrame, intervals: DataFrame,
                 id_col: str, part_keys: list[str]) -> DataFrame:
    """Assemble one LINESTRING WKT per interval row (id, part_keys...,
    d1, d2) by range-joining the segment relation: each overlapped
    segment contributes its (clipped) entry point, the last one also
    its exit point — OGRSimpleCurve::getSubLine (:2076) exactly, with
    the concat done by sort_array, not a single-reducer window."""
    j = intervals.join(segments, on=id_col).filter(
        (F.col("cum0") + F.col("seg_len") > F.col("d1") - F.lit(DELTA))
        & (F.col("cum0") < F.col("d2") + F.lit(DELTA))
        & (F.col("seg_len") > 0)
    )
    t_in = F.least(
        F.greatest((F.col("d1") - F.col("cum0")) / F.col("seg_len"),
                   F.lit(0.0)), F.lit(1.0))
    t_out = F.least(
        F.greatest((F.col("d2") - F.col("cum0")) / F.col("seg_len"),
                   F.lit(0.0)), F.lit(1.0))
    ex = F.col("x0") + t_in * (F.col("x1") - F.col("x0"))
    ey = F.col("y0") + t_in * (F.col("y1") - F.col("y0"))
    xx = F.col("x0") + t_out * (F.col("x1") - F.col("x0"))
    xy = F.col("y0") + t_out * (F.col("y1") - F.col("y0"))
    pts = j.select(
        id_col, *part_keys, "d1", "d2",
        F.array(
            F.struct((F.col("seg_i") * 2).alias("o"),
                     ex.alias("x"), ey.alias("y")),
            F.struct((F.col("seg_i") * 2 + 1).alias("o"),
                     xx.alias("x"), xy.alias("y")),
        ).alias("pp"),
    )
    grp = pts.groupBy(id_col, *part_keys).agg(
        F.sort_array(F.flatten(F.collect_list("pp"))).alias("pp"),
        F.first("d1").alias("d1"), F.first("d2").alias("d2"),
    )
    # drop interior duplicates: keep a point only if it differs from
    # its predecessor (segment exit == next segment entry)
    dedup = F.filter(
        F.col("pp"),
        lambda p, i: (i == F.lit(0))
        | (p["x"] != F.element_at(F.col("pp"),
                                  F.greatest(i, F.lit(1)))["x"])
        | (p["y"] != F.element_at(F.col("pp"),
                                  F.greatest(i, F.lit(1)))["y"]),
    )
    wkt = F.concat(
        F.lit("LINESTRING ("),
        F.concat_ws(", ", F.transform(
            dedup, lambda p: F.concat_ws(
                " ", p["x"].cast("string"), p["y"].cast("string")))),
        F.lit(")"),
    )
    return grp.select(
        id_col, *part_keys, "d1", "d2", wkt.alias("wkt"),
        F.size(dedup).alias("n_points"),
    )


def create_parts(paths: DataFrame, repers: DataFrame,
                 step: float | None = None, tolerance: float = 10.0,
                 id_col: str = "path_id") -> DataFrame:
    """ogrlineref -create (CreatePartsFromLineString,
    ogrlineref.cpp:597), all paths at once.

    repers: (id_col, m, x, y). Repers farther than `tolerance` from
    their path are dropped (TOLERANCE_METER guard, :60); paths whose
    first two repers project in decreasing order are measured from the
    far end (the reference's reversePoints step, :688 — implemented as
    along' = path_len - along plus a flipped slice, no data rewrite).
    Output: (id_col, part_i, mbeg, mend, scale, wkt, n_points) with
    scale = geometric_part_length / M_span and the leading/trailing
    end-parts at scale 1.0 (planar branch of :719-783)."""
    segs = path_segments(paths, id_col)
    proj = project_points(
        segs, repers.select(id_col, "m", "x", "y"),
        id_col, keys=["m"],
    ).filter(F.col("dist") < F.lit(float(tolerance)))

    # direction: first two repers by M decide (ogrlineref.cpp:683)
    wm = Window.partitionBy(id_col).orderBy("m")
    first2 = (
        proj.withColumn("_rn", F.row_number().over(wm))
        .filter(F.col("_rn") <= 2)
        .groupBy(id_col)
        .agg((F.min_by("along", "_rn") > F.max_by("along", "_rn"))
             .alias("rev"))
    )
    proj = proj.join(first2, on=id_col).withColumn(
        "along",
        F.when(F.col("rev"), F.col("path_len") - F.col("along"))
        .otherwise(F.col("along")),
    )

    # consecutive reper intervals in M order
    lead_m = F.lead("m").over(wm)
    lead_d = F.lead("along").over(wm)
    rn = F.row_number().over(wm)
    n = F.count("*").over(Window.partitionBy(id_col))
    iv = proj.select(
        id_col, "m", "along", "path_len", "rev",
        lead_m.alias("m2"), lead_d.alias("d2x"),
        rn.alias("_rn"), n.alias("_n"),
    )
    mid = iv.filter(F.col("m2").isNotNull()
                    & (F.col("d2x") - F.col("along") > DELTA)).select(
        id_col, "rev", "path_len",
        F.col("m").alias("mbeg"), F.col("m2").alias("mend"),
        F.col("along").alias("d1"), F.col("d2x").alias("d2"),
    )
    head = iv.filter((F.col("_rn") == 1)
                     & (F.col("along") > DELTA)).select(
        id_col, "rev", "path_len",
        (F.col("m") - F.col("along")).alias("mbeg"),
        F.col("m").alias("mend"),
        F.lit(0.0).alias("d1"), F.col("along").alias("d2"),
    )
    tail = iv.filter((F.col("_rn") == F.col("_n"))
                     & (F.col("path_len") - F.col("along") > DELTA)).select(
        id_col, "rev", "path_len",
        F.col("m").alias("mbeg"),
        (F.col("m") + F.col("path_len") - F.col("along")).alias("mend"),
        F.col("along").alias("d1"), F.col("path_len").alias("d2"),
    )
    bounds = mid.unionByName(head).unionByName(tail)

    if step is not None:
        # pickets: quantize M inside every interval (the :923 loop),
        # keeping interval ends — each picket maps to a distance by the
        # interval's own linear M<->distance law
        s = float(step)
        grid = F.sequence(
            F.ceil(F.col("mbeg") / s).cast("long"),
            F.floor(
                (F.col("mend") - F.lit(DELTA)) / s).cast("long"),
        )
        # each interval contributes its start + interior pickets; the
        # LAST interval (per path) also contributes its end — the
        # terminal cut — all in one pass (a union branch here would
        # re-read the shared window lineage)
        is_last = (F.col("mend")
                   == F.max("mend").over(Window.partitionBy(id_col)))
        cuts = bounds.withColumn("_last", is_last).select(
            id_col, "rev", "path_len", "mbeg", "mend", "d1", "d2",
            F.explode(
                F.concat(
                    F.array(F.col("mbeg")),
                    F.filter(
                        F.transform(grid, lambda k: k * s),
                        lambda m: (m > F.col("mbeg") + DELTA)
                        & (m < F.col("mend") - DELTA)),
                    F.when(F.col("_last"), F.array(F.col("mend")))
                    .otherwise(F.array().cast("array<double>")))
            ).alias("mc"),
        ).withColumn(
            "dc",
            F.col("d1") + (F.col("mc") - F.col("mbeg"))
            * (F.col("d2") - F.col("d1"))
            / (F.col("mend") - F.col("mbeg")),
        ).select(id_col, "rev", "path_len", "mc", "dc")
        wc = Window.partitionBy(id_col).orderBy("mc")
        bounds = cuts.select(
            id_col, "rev", "path_len",
            F.col("mc").alias("mbeg"), F.col("dc").alias("d1"),
            F.lead("mc").over(wc).alias("mend"),
            F.lead("dc").over(wc).alias("d2"),
        ).filter(F.col("mend").isNotNull()
                 & (F.col("d2") - F.col("d1") > DELTA))

    wp = Window.partitionBy(id_col).orderBy("mbeg")
    bounds = bounds.withColumn("part_i", F.row_number().over(wp) - 1)

    # reversed paths slice in original-geometry coordinates, flipped
    sl_bounds = bounds.select(
        id_col, "part_i", "mbeg", "mend", "rev",
        F.when(F.col("rev"), F.col("path_len") - F.col("d2"))
        .otherwise(F.col("d1")).alias("d1"),
        F.when(F.col("rev"), F.col("path_len") - F.col("d1"))
        .otherwise(F.col("d2")).alias("d2"),
    )
    sliced = _slice_parts(segs.drop("path_len"), sl_bounds, id_col,
                          ["part_i", "mbeg", "mend", "rev"])
    rev_pts = F.reverse(F.split(
        F.regexp_replace("wkt", r"^LINESTRING \(|\)$", ""), ", "))
    wkt = F.when(
        F.col("rev"),
        F.concat(F.lit("LINESTRING ("),
                 F.concat_ws(", ", rev_pts), F.lit(")")),
    ).otherwise(F.col("wkt"))
    return sliced.select(
        id_col, "part_i", "mbeg", "mend",
        ((F.col("d2") - F.col("d1"))
         / (F.col("mend") - F.col("mbeg"))).alias("scale"),
        wkt.alias("wkt"), "n_points",
    )


def get_position(parts: DataFrame, points: DataFrame,
                 id_col: str = "path_id",
                 keys: list[str] = ("pt_id",)) -> DataFrame:
    """ogrlineref -get_pos (GetPosition, ogrlineref.cpp:1171), a whole
    point table at once: nearest part per (path, point), reference
    position = mbeg + along / scale. One keyed join + one struct-MIN
    aggregation; with 10^6 parts and 10^9 points both sides shuffle on
    the path key only."""
    keys = list(keys)
    pk = F.concat_ws("#", F.col(id_col), F.col("part_i"))
    withpk = parts.withColumn("_pk", pk)
    segs = path_segments(
        withpk.select("_pk", "wkt"), "_pk", "wkt",
    ).join(
        withpk.select(id_col, "_pk", "part_i", "mbeg", "scale"),
        on="_pk",
    )
    j = points.join(segs, on=id_col)
    seg2 = F.col("seg_len") * F.col("seg_len")
    t = F.when(
        seg2 > 0,
        ((F.col("x") - F.col("x0")) * (F.col("x1") - F.col("x0"))
         + (F.col("y") - F.col("y0")) * (F.col("y1") - F.col("y0"))) / seg2,
    ).otherwise(F.lit(0.0))
    t = F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
    cx = F.col("x0") + t * (F.col("x1") - F.col("x0"))
    cy = F.col("y0") + t * (F.col("y1") - F.col("y0"))
    d2 = ((F.col("x") - cx) * (F.col("x") - cx)
          + (F.col("y") - cy) * (F.col("y") - cy))
    cand = F.struct(
        d2.alias("d2"), F.col("part_i"), F.col("seg_i"),
        (F.col("mbeg")
         + (F.col("cum0") + t * F.col("seg_len")) / F.col("scale"))
        .alias("refpos"),
    )
    return (
        j.filter(seg2 > 0)
        .groupBy(id_col, *keys)
        .agg(F.min(cand).alias("b"))
        .select(id_col, *keys,
                F.col("b.refpos").alias("position"),
                F.sqrt(F.col("b.d2")).alias("dist"))
    )


def get_coordinates(parts: DataFrame, positions: DataFrame,
                    id_col: str = "path_id",
                    keys: list[str] = ("pos_id",)) -> DataFrame:
    """ogrlineref -get_coord (GetCoordinates, ogrlineref.cpp:1236):
    for every (id, m) row the point at that reference position —
    range join into [mbeg, mend), then OGRSimpleCurve::Value by one
    more range join into the part's cumulative-distance segments
    (earliest matching segment, Value's scan order)."""
    keys = list(keys)
    hit = positions.join(
        parts.select(id_col, "part_i", "mbeg", "mend", "scale", "wkt"),
        on=id_col,
    ).filter((F.col("mbeg") < F.col("m")) & (F.col("m") < F.col("mend")))
    hit = hit.withColumn(
        "dtar", (F.col("m") - F.col("mbeg")) * F.col("scale"))
    pk = F.concat_ws("#", F.col(id_col), F.col("part_i"))
    segs = path_segments(
        parts.withColumn("_pk", pk).select("_pk", "wkt"), "_pk", "wkt")
    j = hit.withColumn("_pk", pk).select(
        id_col, *keys, "m", "_pk", "dtar").join(segs, on="_pk")
    inside = ((F.col("seg_len") > 0)
              & (F.col("cum0") <= F.col("dtar") + DELTA)
              & (F.col("dtar") <= F.col("cum0") + F.col("seg_len") + DELTA))
    r = F.least(F.greatest(
        (F.col("dtar") - F.col("cum0")) / F.col("seg_len"),
        F.lit(0.0)), F.lit(1.0))
    cand = F.struct(
        F.col("seg_i"),
        (F.col("x0") + r * (F.col("x1") - F.col("x0"))).alias("x"),
        (F.col("y0") + r * (F.col("y1") - F.col("y0"))).alias("y"),
    )
    return (
        j.filter(inside)
        .groupBy(id_col, *keys, "m")
        .agg(F.min(cand).alias("b"))
        .select(id_col, *keys, "m",
                F.col("b.x").alias("x"), F.col("b.y").alias("y"))
    )


def get_subline(parts: DataFrame, mb: float, me: float,
                id_col: str = "path_id") -> DataFrame:
    """ogrlineref -get_subline (CreateSubline, ogrlineref.cpp:432):
    clip every path's parts to the [mb, me] reference range and
    concatenate in M order — one row per path with the stitched
    LINESTRING. The per-part slice is the same segment-range join as
    create_parts; stitching is a sort_array concat keyed by path.
    Joint vertices between consecutive parts are duplicated, exactly
    like the reference's plain addSubLineString concatenation
    (ogrlineref.cpp:540)."""
    mb, me = float(mb), float(me)
    ov = parts.filter(
        (F.col("mend") > mb) & (F.col("mbeg") < me)).select(
        id_col, "part_i", "mbeg", "mend", "scale", "wkt",
        (F.least(F.greatest(F.lit(mb), F.col("mbeg")), F.col("mend"))
         .alias("cb")),
        (F.greatest(F.least(F.lit(me), F.col("mend")), F.col("mbeg"))
         .alias("ce")),
    ).withColumn("d1", (F.col("cb") - F.col("mbeg")) * F.col("scale")) \
     .withColumn("d2", (F.col("ce") - F.col("mbeg")) * F.col("scale")) \
     .filter(F.col("d2") - F.col("d1") > DELTA)
    ov = ov.withColumn(
        "_pk", F.concat_ws("#", F.col(id_col), F.col("part_i")))
    segs = path_segments(ov.select("_pk", "wkt").distinct(),
                         "_pk", "wkt").drop("path_len")
    pieces = _slice_parts(
        segs, ov.select(id_col, "_pk", "mbeg", "d1", "d2"),
        "_pk", [id_col, "mbeg"])
    body = F.regexp_replace("wkt", r"^LINESTRING \(|\)$", "")
    stitched = pieces.groupBy(id_col).agg(
        F.concat_ws(", ", F.transform(
            F.sort_array(F.collect_list(
                F.struct(F.col("mbeg"), body.alias("b")))),
            lambda s: s["b"])).alias("body"),
        F.sum(F.col("n_points")).alias("n_points"),
        F.min("mbeg").alias("m_from"),
    )
    return stitched.select(
        id_col,
        F.concat(F.lit("LINESTRING ("), F.col("body"), F.lit(")"))
        .alias("wkt"),
        "n_points",
    )
