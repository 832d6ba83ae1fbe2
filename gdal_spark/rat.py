"""Raster Attribute Tables (RAT) — the per-band value/attribute side
table classified and thematic rasters carry.

Reference: gcore/gdal_rat.cpp (GDALDefaultRasterAttributeTable: typed
fields with usages, XML serialization into PAM .aux.xml via
Serialize()/XMLInit(); InitializeFromColorTable), the field
type/usage enums from gcore/gdal.h (GFT_Integer/Real/String,
GFU_Generic..GFU_MaxCount), and autotest/gcore/rat.py (the roundtrip
cases this module's tests restate).

Spark-first shape: a RAT is a SMALL table keyed by pixel value (256
rows for byte classes, at most tens of thousands for 16-bit thematic
rasters), so it lives as a plain DataFrame next to the tile table and
always broadcasts.  What IS big is building one from pixels: the
default RAT (VALUE + COUNT, gdal_rat.cpp GetDefaultRAT-style
histogram) runs as per-tile np.bincount partials in mapInPandas
followed by one keyed sum — two-phase aggregation, map-side combine,
never a pixel shuffle.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# gcore/gdal.h enums
GFT_INTEGER, GFT_REAL, GFT_STRING = 0, 1, 2
GFU = {
    "Generic": 0, "PixelCount": 1, "Name": 2, "Min": 3, "Max": 4,
    "MinMax": 5, "Red": 6, "Green": 7, "Blue": 8, "Alpha": 9,
    "RedMin": 10, "GreenMin": 11, "BlueMin": 12, "AlphaMin": 13,
    "RedMax": 14, "GreenMax": 15, "BlueMax": 16, "AlphaMax": 17,
}


class RAT:
    """Field-typed attribute table for one (raster_id, band)."""

    def __init__(self, fields: list[tuple[str, int, int]],
                 rows: list[tuple], table_type: str = "thematic"):
        self.fields = fields            # (name, GFT_*, GFU_*)
        self.rows = rows
        self.table_type = table_type

    def to_pandas(self) -> pd.DataFrame:
        return pd.DataFrame(self.rows,
                            columns=[f[0] for f in self.fields])

    # ------------------------------------------------ PAM .aux.xml
    def to_xml(self) -> str:
        """gdal_rat.cpp Serialize(): <GDALRasterAttributeTable> with
        FieldDefn and Row/F children, the PAM band payload."""
        root = ET.Element("GDALRasterAttributeTable",
                          tableType=self.table_type)
        for i, (name, ftype, fusage) in enumerate(self.fields):
            fd = ET.SubElement(root, "FieldDefn", index=str(i))
            ET.SubElement(fd, "Name").text = name
            ET.SubElement(fd, "Type").text = str(ftype)
            ET.SubElement(fd, "Usage").text = str(fusage)
        for ri, row in enumerate(self.rows):
            re = ET.SubElement(root, "Row", index=str(ri))
            for v, (_n, ftype, _u) in zip(row, self.fields):
                f = ET.SubElement(re, "F")
                if ftype == GFT_INTEGER:
                    f.text = str(int(v))
                elif ftype == GFT_REAL:
                    from .fmt import fmt_coord
                    f.text = fmt_coord(float(v))
                else:
                    f.text = str(v)
        return ET.tostring(root, encoding="unicode")

    @classmethod
    def from_xml(cls, xml: str) -> "RAT":
        root = ET.fromstring(xml)
        if root.tag != "GDALRasterAttributeTable":
            raise ValueError("not a GDALRasterAttributeTable element")
        fields = []
        for fd in sorted(root.findall("FieldDefn"),
                         key=lambda e: int(e.get("index", "0"))):
            fields.append((fd.findtext("Name"),
                           int(fd.findtext("Type", "0")),
                           int(fd.findtext("Usage", "0"))))
        rows = []
        for re in sorted(root.findall("Row"),
                         key=lambda e: int(e.get("index", "0"))):
            vals = []
            for f, (_n, ftype, _u) in zip(re.findall("F"), fields):
                t = f.text or ""
                vals.append(int(t) if ftype == GFT_INTEGER
                            else float(t) if ftype == GFT_REAL else t)
            rows.append(tuple(vals))
        return cls(fields, rows,
                   root.get("tableType", "thematic"))

    @classmethod
    def from_color_table(cls, palette) -> "RAT":
        """GDALRasterAttributeTable::InitializeFromColorTable parity:
        Value + Red/Green/Blue/Alpha rows from an (n, 3|4) palette."""
        pal = np.asarray(palette, dtype=np.int64)
        has_a = pal.shape[1] >= 4
        fields = [("Value", GFT_INTEGER, GFU["MinMax"]),
                  ("Red", GFT_INTEGER, GFU["Red"]),
                  ("Green", GFT_INTEGER, GFU["Green"]),
                  ("Blue", GFT_INTEGER, GFU["Blue"]),
                  ("Alpha", GFT_INTEGER, GFU["Alpha"])]
        rows = [(int(k), int(r[0]), int(r[1]), int(r[2]),
                 int(r[3]) if has_a else 255)
                for k, r in enumerate(pal)]
        return cls(fields, rows)


def write_aux_xml(path: str, rats: dict[int, RAT]) -> None:
    """PAM sidecar (gcore/gdalpamdataset.cpp layout): <PAMDataset>
    with one <PAMRasterBand band="n"> per RAT."""
    root = ET.Element("PAMDataset")
    for band in sorted(rats):
        pb = ET.SubElement(root, "PAMRasterBand", band=str(band))
        pb.append(ET.fromstring(rats[band].to_xml()))
    with open(path, "w", encoding="utf-8") as f:
        f.write(ET.tostring(root, encoding="unicode"))


def read_aux_xml(path: str) -> dict[int, RAT]:
    root = ET.parse(path).getroot()
    out = {}
    for pb in root.findall("PAMRasterBand"):
        el = pb.find("GDALRasterAttributeTable")
        if el is not None:
            out[int(pb.get("band", "1"))] = RAT.from_xml(
                ET.tostring(el, encoding="unicode"))
    return out


# ----------------------------------------------------------- distributed
_HIST_SCHEMA = T.StructType([
    T.StructField("raster_id", T.StringType()),
    T.StructField("band", T.IntegerType()),
    T.StructField("value", T.LongType()),
    T.StructField("cnt", T.LongType()),
])


def default_rat_df(tiles: DataFrame) -> DataFrame:
    """Default RAT content for integer rasters: (raster_id, band,
    value, count) — per-tile np.bincount partials map-side, one keyed
    sum. The result is O(#distinct values) rows per band."""
    def partials(batches):
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                arr = np.frombuffer(r.data, dtype=np.dtype(r.dtype))
                arr = arr.astype(np.int64, copy=False)
                off = arr.min()
                c = np.bincount(arr - off)
                nz = np.nonzero(c)[0]
                frames.append(pd.DataFrame({
                    "raster_id": r.raster_id, "band": r.band,
                    "value": nz + off, "cnt": c[nz]}))
            yield (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(
                       columns=[f.name for f in _HIST_SCHEMA.fields]))

    return (tiles.mapInPandas(partials, schema=_HIST_SCHEMA)
            .groupBy("raster_id", "band", "value")
            .agg(F.sum("cnt").alias("count")))


def rat_from_df(pdf: pd.DataFrame) -> RAT:
    """Default RAT (VALUE GFU_MinMax + COUNT GFU_PixelCount) from one
    band's collected histogram rows."""
    pdf = pdf.sort_values("value")
    return RAT(
        [("VALUE", GFT_INTEGER, GFU["MinMax"]),
         ("COUNT", GFT_INTEGER, GFU["PixelCount"])],
        [(int(v), int(c)) for v, c in zip(pdf["value"], pdf["count"])])


def rat_report(spark: SparkSession, rats: dict[int, RAT],
               raster_id: str) -> DataFrame:
    """gdalinfo-style RAT listing: one row per (band, row index) with
    the field values as a map — what gdalinfo_lib.cpp prints under
    '<GDALRasterAttributeTable>' when a band carries a RAT."""
    rows = []
    for band, rat in sorted(rats.items()):
        for ri, row in enumerate(rat.rows):
            rows.append((raster_id, band, ri,
                         {n: str(v) for (n, _t, _u), v
                          in zip(rat.fields, row)}))
    schema = T.StructType([
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ])
    return spark.createDataFrame(rows, schema)
