"""GeoJSON sources — the interchange-format corner of OGR's driver
zoo that still matters for a Parquet/Iceberg-canonical engine.

The reference's GeoJSONSeq driver (ogr/ogrsf_frmts/geojson/
ogrgeojsonseqdriver.cpp; RFC 8142 text sequences / newline-delimited
GeoJSON) streams one Feature object per line — which is exactly the
splittable shape Spark wants: spark.read.text gives line-parallel
scans of any size, and each line parses independently inside an
Arrow-batched kernel. The plain one-big-FeatureCollection form of
GeoJSON is NOT splittable; the reference streams it with a JSON
parser, and large-scale pipelines convert to the Seq form — this
module takes the same position (read_geojson handles collection files
by parsing them driver-side only for small fixtures).

Output feature table: (fid, geom_wkt, properties map<string,string>)
— properties stringified like OGR's field coercion to the declared
type; geometry converted to the engine's canonical WKT (the shared
geometry kernel's codecs)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geometry as GM

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("fid", T.LongType()),
        T.StructField("geom_wkt", T.StringType()),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    ]
)


def geojson_geometry_to_geom(g: dict) -> GM.Geom | None:
    """GeoJSON geometry object -> the engine's Geom (RFC 7946 types;
    the reference's OGRGeoJSONReadGeometry,
    ogr/ogrsf_frmts/geojson/ogrgeojsonreader.cpp)."""
    if g is None:
        return None
    t = g["type"]
    c = g.get("coordinates")

    def arr(pts):
        xs = np.array([p[0] for p in pts], np.float64)
        ys = np.array([p[1] for p in pts], np.float64)
        return xs, ys

    if t == "Point":
        return GM.Geom("point", [(np.array([c[0]], np.float64),
                                  np.array([c[1]], np.float64))])
    if t == "MultiPoint":
        return GM.Geom("multipoint", [arr(c)])
    if t == "LineString":
        return GM.Geom("linestring", [arr(c)])
    if t == "MultiLineString":
        return GM.Geom("multilinestring", [arr(ln) for ln in c])
    if t == "Polygon":
        return GM.Geom("polygon", [[arr(r[:-1] if r[0] == r[-1] else r)
                                    for r in c]])
    if t == "MultiPolygon":
        return GM.Geom(
            "multipolygon",
            [[arr(r[:-1] if r[0] == r[-1] else r) for r in poly]
             for poly in c],
        )
    raise ValueError(f"GeoJSON: unsupported geometry type {t!r}")


def _fid_of(feat: dict) -> int | None:
    """RFC 7946 allows string ids; the reference's GeoJSON driver only
    promotes integral ids to FID and keeps others as attributes
    (ogr/ogrsf_frmts/geojson/ogrgeojsonreader.cpp id handling). Returns
    None when the id is absent or non-integral."""
    v = feat.get("id")
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if isinstance(v, str):
        s = v.strip()
        if s.lstrip("+-").isdigit():
            return int(s)
    return None


def _feature_to_row(i: int, feat: dict) -> dict:
    g = geojson_geometry_to_geom(feat.get("geometry"))
    props = feat.get("properties") or {}
    fid = _fid_of(feat)
    out_props = {
        str(k): (json.dumps(v) if isinstance(v, (dict, list))
                 else ("" if v is None else str(v)))
        for k, v in props.items()
    }
    if fid is None:
        fid = i
        if "id" in feat and feat["id"] is not None:
            # non-integral id: preserved as an attribute, like the reference
            out_props.setdefault("id", str(feat["id"]))
    return {
        "fid": fid,
        "geom_wkt": GM.to_wkt(g) if g is not None else None,
        "properties": out_props,
    }


def read_geojson_seq(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited GeoJSON (GeoJSONSeq driver) -> feature table.
    Line-parallel: the text scan splits like any text source; parsing
    is per-line inside mapInPandas. fid = the feature's own `id` when
    present, else its GLOBAL line number (a monotonic id per line
    resolved with a tiny per-partition-offset pass, matching the
    reference's sequential FID assignment deterministically)."""
    from .zipindex import with_global_index

    # global line number via partition-offset zip-with-index: one tiny
    # per-partition count pass + broadcast prefix sums — no global sort,
    # no single-partition Exchange, so the scan stays line-parallel at
    # any size (the r3 version's Window.orderBy funneled the whole file
    # through one reducer).
    lines = with_global_index(spark.read.text(path), "_ln")

    def parse(batches):
        for pdf in batches:
            rows = []
            for ln, raw in zip(pdf["_ln"], pdf["value"]):
                raw = raw.strip().lstrip("\x1e")  # RFC 8142 RS prefix
                if not raw:
                    continue
                feat = json.loads(raw)
                rows.append(_feature_to_row(int(ln), feat))
            yield pd.DataFrame(
                rows, columns=["fid", "geom_wkt", "properties"]
            )

    return lines.mapInPandas(parse, schema=_OUT_SCHEMA)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """One-object FeatureCollection file (small fixtures only — the
    format is not splittable; use the Seq form at scale, as the
    reference's own streaming path effectively does)."""
    with open(path) as fh:
        doc = json.load(fh)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" \
        else [doc]
    rows = [_feature_to_row(i, f) for i, f in enumerate(feats)]
    return spark.createDataFrame(rows, schema=_OUT_SCHEMA)


def geom_to_geojson_geometry(g: GM.Geom) -> dict:
    """Inverse of geojson_geometry_to_geom (the writer half of the
    reference's GeoJSON driver, ogrgeojsonwriter.cpp)."""
    def pts(xs, ys):
        return [[float(x), float(y)] for x, y in zip(xs, ys)]

    def ring(xs, ys):
        r = pts(xs, ys)
        return r + [r[0]]

    if g.kind == "point":
        xs, ys = g.parts[0]
        return {"type": "Point", "coordinates": [float(xs[0]), float(ys[0])]}
    if g.kind == "multipoint":
        return {"type": "MultiPoint", "coordinates": pts(*g.parts[0])}
    if g.kind == "linestring":
        return {"type": "LineString", "coordinates": pts(*g.parts[0])}
    if g.kind == "multilinestring":
        return {"type": "MultiLineString",
                "coordinates": [pts(*ln) for ln in g.parts]}
    if g.kind == "polygon":
        return {"type": "Polygon",
                "coordinates": [ring(*r) for r in g.parts[0]]}
    if g.kind == "multipolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[ring(*r) for r in rings]
                                for rings in g.parts]}
    raise ValueError(f"GeoJSON: unsupported kind {g.kind!r}")


def geojson_feature_lines(df: DataFrame, wkt_col: str, id_col: str,
                          prop_cols: list[str]) -> DataFrame:
    """Feature table -> one GeoJSONSeq line per row (column `value`,
    ready for write.text) — the ogr2ogr -f GeoJSONSeq direction.
    Serialization is per-row in an Arrow batch kernel; key order is
    fixed (type, id, geometry, properties) so output is
    deterministic."""
    cols = [F.col(id_col), F.col(wkt_col)] + [F.col(c) for c in prop_cols]

    def ser(batches):
        for pdf in batches:
            out = []
            for i in range(len(pdf)):
                r = pdf.iloc[i]
                feat = {
                    "type": "Feature",
                    "id": int(r[id_col]),
                    "geometry": geom_to_geojson_geometry(
                        GM.parse_wkt(r[wkt_col])
                    ),
                    "properties": {c: (None if pd.isna(r[c]) else r[c])
                                   for c in prop_cols},
                }
                out.append(json.dumps(feat, separators=(",", ":"),
                                      default=str))
            yield pd.DataFrame({"value": out})

    return df.select(*cols).mapInPandas(
        ser, schema=T.StructType([T.StructField("value", T.StringType())])
    )
