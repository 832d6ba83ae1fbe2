"""ogrmerge: append several vector layers into one.

Reference semantics (swig/python/gdal-utils/osgeo_utils/ogrmerge.py):
  - -single appends every source layer's features into one output
    layer;
  - -field_strategy decides the merged schema (ogrmerge.py
    ~process_layer / gdal vector concat): "Union" (every field that
    appears anywhere; missing values NULL), "Intersection" (only
    fields common to all sources), "FirstLayer" (the first source's
    schema; later layers conform, extra fields dropped);
  - -src_layer_field_name / -src_layer_field_content add a column
    recording the provenance of each feature; the content template
    supports the {DS_NAME} and {LAYER_NAME} placeholders (ogrmerge.py
    _build_layer_name substitutions).

Spark-first: the merge IS unionByName — a metadata-only plan node
(zero shuffle, zero data movement at any scale); the field strategies
are pure schema projections computed on the driver from the
DataFrame schemas."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _conform(df: DataFrame, cols, types: dict) -> DataFrame:
    sel = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c in have:
            sel.append(F.col(c).cast(types[c]).alias(c))
        else:
            sel.append(F.lit(None).cast(types[c]).alias(c))
    return df.select(*sel)


def ogr_merge(
    layers,
    field_strategy: str = "Union",
    src_layer_field_name: str | None = None,
    src_layer_field_content: str = "{DS_NAME}/{LAYER_NAME}",
) -> DataFrame:
    """Merge [(ds_name, layer_name, DataFrame), ...] into one layer
    (ogrmerge -single). Field order follows first appearance, like the
    reference's append order."""
    if field_strategy not in ("Union", "Intersection", "FirstLayer"):
        raise ValueError(field_strategy)
    triples = list(layers)
    if not triples:
        raise ValueError("no input layers")

    # merged schema: first-appearance order; first-seen type wins
    cols: list = []
    types: dict = {}
    seen_all = None
    for _, _, df in triples:
        names = [f.name for f in df.schema.fields]
        for f in df.schema.fields:
            if f.name not in types:
                types[f.name] = f.dataType
                cols.append(f.name)
        seen_all = set(names) if seen_all is None else (seen_all & set(names))
    if field_strategy == "FirstLayer":
        cols = [f.name for f in triples[0][2].schema.fields]
    elif field_strategy == "Intersection":
        cols = [c for c in cols if c in seen_all]

    out = None
    for ds, ln, df in triples:
        part = _conform(df, cols, types)
        if src_layer_field_name:
            content = (src_layer_field_content
                       .replace("{DS_NAME}", ds).replace("{LAYER_NAME}", ln))
            part = part.withColumn(src_layer_field_name, F.lit(content))
        out = part if out is None else out.unionByName(part)
    return out
