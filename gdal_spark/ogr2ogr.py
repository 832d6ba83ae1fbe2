"""ogr2ogr as a layer-to-layer composition — the vector translate app
(gdal/apps/ogr2ogr_lib.cpp, 5,996 LoC) restated as a pipeline of the
engine's existing declarative operators, applied in the reference's
own order (ogr2ogr_lib.cpp SetupCT / TranslateArrow loop):

    -spat          spatial filter (rect fast path stays codegen)
    -where         attribute filter (OGR SQL WHERE semantics)
    -select        field list (column pruning reaches the scan)
    -t_srs         whole-geometry reprojection (st_transform)
    -segmentize    max-length densification
    -simplify      distance simplification
    -explodecollections  one row per part (st_dump + explode)
    -wrapdateline  split at the antimeridian
    -nlt           geometry type coercion (force_* family)

Everything stays a single declarative plan: filters/pruning are
Catalyst-visible, geometry steps are Arrow-batched row-local kernels,
nothing shuffles."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import geometry as SG

_NLT = {
    "POLYGON": SG.st_force_polygon,
    "MULTIPOLYGON": SG.st_force_multipolygon,
    "MULTIPOINT": SG.st_force_multipoint,
    "MULTILINESTRING": SG.st_force_multilinestring,
    "LINESTRING": SG.st_force_linestring,
    # curve inputs linearize on parse; CONVERT_TO_LINEAR is therefore
    # a canonical re-emit (ogr2ogr -nlt CONVERT_TO_LINEAR)
    "CONVERT_TO_LINEAR": SG.st_curve_to_line,
}


def ogr2ogr_layer(
    df: DataFrame,
    geom_col: str = "geom_wkt",
    spat: tuple | None = None,
    where: str | None = None,
    sql: str | None = None,
    clipsrc: str | tuple | None = None,
    select: list[str] | None = None,
    t_srs_epsg: int | str | None = None,
    t_srs_prec: int = 3,
    s_srs_epsg: int | str | None = None,
    segmentize: float | None = None,
    simplify: float | None = None,
    explode_collections: bool = False,
    wrapdateline: bool = False,
    nlt: str | None = None,
) -> DataFrame:
    """Translate a feature layer like `ogr2ogr` does, one declarative
    plan. `spat` = (xmin, ymin, xmax, ymax) rect in SOURCE coords
    (applied before reprojection, like the reference). `select` lists
    attribute columns to keep (the geometry column always survives)."""
    from .ogr_sql_exec import execute_ogr_sql

    out = df
    if spat is not None:
        x0, y0, x1, y1 = spat
        # rect fast path over the geometry's bbox via its WKT vertices
        # would need a parse; documents-style layers carry lon/lat —
        # use them when present, else the exact intersects predicate
        if "lon" in out.columns and "lat" in out.columns:
            out = out.filter(
                (F.col("lon") >= x0) & (F.col("lon") <= x1)
                & (F.col("lat") >= y0) & (F.col("lat") <= y1)
            )
        else:
            rect = (f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, "
                    f"{x0} {y1}, {x0} {y0}))")
            out = out.filter(SG.st_intersects(F.col(geom_col), F.lit(rect)))
    if sql is not None:  # -sql: a full OGR SQL statement replaces the layer
        out = execute_ogr_sql(out.sparkSession, sql, {"layer": out})
    if where is not None:
        out = execute_ogr_sql(
            out.sparkSession,
            f"SELECT * FROM layer WHERE {where}",
            {"layer": out},
        )
    if clipsrc is not None:
        # -clipsrc: geometrically clip every feature to the clip
        # polygon (rect tuple or WKT); empty intersections drop —
        # ogr2ogr_lib.cpp's poClipSrc path via the boolean clipper
        if isinstance(clipsrc, tuple):
            cx0, cy0, cx1, cy1 = clipsrc
            clip_wkt = (f"POLYGON(({cx0} {cy0}, {cx1} {cy0}, {cx1} {cy1}, "
                        f"{cx0} {cy1}, {cx0} {cy0}))")
        else:
            clip_wkt = clipsrc
        out = out.withColumn(
            geom_col,
            SG.st_intersection(F.col(geom_col), F.lit(clip_wkt)),
        ).filter(~F.col(geom_col).like("%EMPTY"))
    if select is not None:
        keep = [c for c in select if c in out.columns]
        if geom_col not in keep:
            keep.append(geom_col)
        out = out.select(*keep)
    g = F.col(geom_col)
    if segmentize is not None:
        out = out.withColumn(geom_col, SG.st_segmentize(g, segmentize))
    if simplify is not None:
        out = out.withColumn(geom_col, SG.st_simplify(g, simplify))
    if t_srs_epsg is not None:
        # -s_srs/-t_srs: a non-geographic source CRS composes through
        # the geodetic hub (ogr2ogr_lib.cpp's poCT from
        # OGRCreateCoordinateTransformation(s_srs, t_srs)); strings
        # dispatch like OSRSetFromUserInput — WKT1, EPSG:NNNN, or a
        # PROJ.4 parameter string (importFromWkt / importFromProj4)
        from .wktsrs import register_srs_string

        if isinstance(t_srs_epsg, str):
            t_srs_epsg = register_srs_string(t_srs_epsg)
        if isinstance(s_srs_epsg, str):
            s_srs_epsg = register_srs_string(s_srs_epsg)
        if s_srs_epsg is not None and s_srs_epsg != 4326:
            out = out.withColumn(
                geom_col, SG.st_transform_crs(g, s_srs_epsg, t_srs_epsg,
                                              prec=t_srs_prec)
            )
        else:
            out = out.withColumn(
                geom_col, SG.st_transform(g, t_srs_epsg, prec=t_srs_prec)
            )
    if wrapdateline:
        out = out.withColumn("_parts", SG.st_wrapdateline(g)) \
            .withColumn(geom_col, F.explode("_parts")).drop("_parts")
    if explode_collections:
        out = out.withColumn("_parts", SG.st_dump(g)) \
            .withColumn(geom_col, F.explode("_parts")).drop("_parts")
    if nlt is not None:
        try:
            fn = _NLT[nlt.upper()]
        except KeyError:
            raise ValueError(f"unsupported -nlt {nlt!r}") from None
        out = out.withColumn(geom_col, fn(F.col(geom_col)))
    return out


def dissolve(df: DataFrame, key_cols: list[str],
             geom_col: str = "geom_wkt",
             out_col: str = "geom_wkt") -> DataFrame:
    """ogrdissolve (apps/ogrdissolve.cpp): union all geometries that
    share the key columns into one geometry per group.

    One keyed shuffle (groupBy the dissolve field) collects each
    group's polygons; the cascaded union (the same boundary-
    classification kernel as OGR UnionCascaded, ogrgeometry.cpp:4473)
    runs per group in an Arrow batch — group state is that key's
    geometries only, so 10^6 dissolve classes spread across the
    cluster. A skewed class (one giant key) is the format's inherent
    hotspot, same as the reference's single-threaded cascade."""
    @F.pandas_udf("string")
    def _union_all(geoms: pd.Series) -> pd.Series:
        from gdal_spark import geometry as GM

        out = []
        for arr in geoms:
            rings = []
            for w in arr:
                try:
                    g = GM.parse_wkt(w)
                except Exception:
                    continue
                if g.kind == "polygon":
                    rings.append(g.parts[0])
                elif g.kind == "multipolygon":
                    rings.extend(g.parts)
            if not rings:
                out.append(None)
                continue
            merged = GM.union_cascaded(GM.Geom("multipolygon", rings))
            out.append(GM.to_wkt(merged))
        return pd.Series(out)

    grouped = df.groupBy(*key_cols).agg(
        F.collect_list(geom_col).alias("_geoms"),
        F.count("*").alias("n_parts"),
    )
    return grouped.select(
        *key_cols, _union_all("_geoms").alias(out_col), "n_parts")
