"""TFAT sharded MBTiles — the fork's multi-file MBTiles variant:
frmts/mbtiles/tfatmbtilesdataset.cpp (GDALRegister_TFATMBTiles).

Format facts (all from the reference):
  - the dataset handle is an XML descriptor with root `TileMetadata`
    (:1108-1135): LayerName (defaults to the XML basename), required
    TileFileCount / MinZoom / MaxZoom, TileMaxCount, and a TileLevels
    list whose children carry LevelName, MinRow, MaxRow, MinColumn,
    MaxColumn, TileCount (:1200-1217);
  - tiles live in TileFileCount sibling SQLite files named
    `<LayerName>_<i>.mbtiles` (:1159), each with the standard `tiles`
    relation; every shard must open and contain `tiles` or the open
    hard-fails (:1169-1176);
  - a tile's shard is positional (ComputeTileColTileRowZoomLevel
    :615-648): ordinal = sum(TileCount of levels below this zoom)
    + (col - MinColumn) * (MaxRow - MinRow + 1) + (row - MinRow + 1)
    — column-major and 1-based within its level, rows in MBTiles TMS
    orientation — and shard = ceil(ordinal / TileMaxCount) - 1.

Spark lowering: the XML and the per-level extents are KBs of driver
state; shard assignment is pure column math (the ordinal formula as
Catalyst expressions over a broadcast level map), so the writer is the
standard mbtiles.write_mbtiles sink once per shard with PNG encoding
distributed; the reader unions the per-shard descriptor-parallel scans
of mbtiles.read_mbtiles — no shuffle beyond each shard's own plan.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import mbtiles


def tile_ordinal(levels: list[dict], z: int, col: int, row_tms: int) -> int:
    """The reference's global tile ordinal (:615-648), 1-based."""
    total = 0
    lvl = None
    for li in sorted(levels, key=lambda d: d["level"]):
        if z > li["level"]:
            total += li["count"]
        elif z == li["level"]:
            lvl = li
            break
    if lvl is None:
        raise ValueError(f"zoom {z} not in TileLevels")
    if not (lvl["min_col"] <= col <= lvl["max_col"]
            and lvl["min_row"] <= row_tms <= lvl["max_row"]):
        raise ValueError(f"tile ({col},{row_tms}) outside level {z} bounds")
    total += (col - lvl["min_col"]) * (lvl["max_row"] - lvl["min_row"] + 1)
    total += row_tms - lvl["min_row"] + 1
    return total


def shard_of(ordinal: int, tile_max_count: int) -> int:
    """ceil(ordinal / TileMaxCount) - 1 via the reference's
    quotient/remainder formulation."""
    count, rem = divmod(ordinal, tile_max_count)
    return count - 1 if rem == 0 else count


def write_tfat(tiles: DataFrame, xml_path: str, *,
               layer_name: str | None = None,
               tile_max_count: int = 2048) -> dict:
    """TFAT sink: per-level extents from ONE tiny aggregate, shard ids
    as pure column math, one distributed-PNG mbtiles sink per shard,
    then the KB XML descriptor. Returns {'shards': n, 'tiles': n}."""
    name = layer_name or os.path.splitext(os.path.basename(xml_path))[0]
    dirname = os.path.dirname(xml_path) or "."
    os.makedirs(dirname, exist_ok=True)

    t = tiles.withColumn(
        "_trow", F.expr("shiftleft(1, zoom) - 1 - tile_y"))
    ext = t.groupBy("zoom").agg(
        F.min("_trow").alias("min_row"), F.max("_trow").alias("max_row"),
        F.min("tile_x").alias("min_col"), F.max("tile_x").alias("max_col"),
        F.count_distinct("tile_x", "_trow").alias("cnt"),
    ).orderBy("zoom").collect()
    levels = [{"level": int(r.zoom), "min_row": int(r.min_row),
               "max_row": int(r.max_row), "min_col": int(r.min_col),
               "max_col": int(r.max_col), "count": int(r.cnt)}
              for r in ext]

    prior, acc = {}, 0
    for li in levels:
        prior[li["level"]] = acc
        acc += li["count"]

    # ordinal as Catalyst expressions over the broadcast level maps
    def lmap(field):
        return F.create_map(*[F.lit(v) for li in levels
                              for v in (li["level"], li[field])])

    ordinal = (
        F.create_map(*[F.lit(v) for k in prior for v in (k, prior[k])]
                     )[F.col("zoom")]
        + (F.col("tile_x") - lmap("min_col")[F.col("zoom")])
        * (lmap("max_row")[F.col("zoom")]
           - lmap("min_row")[F.col("zoom")] + 1)
        + (F.col("_trow") - lmap("min_row")[F.col("zoom")] + 1)
    )
    shard = F.floor((ordinal - 1) / F.lit(tile_max_count)).cast("int")
    t = t.withColumn("_shard", shard).drop("_trow")

    n_shards = shard_of(acc, tile_max_count) + 1
    total = 0
    for i in range(n_shards):
        p = os.path.join(dirname, f"{name}_{i}.mbtiles")
        total += mbtiles.write_mbtiles(
            t.filter(F.col("_shard") == i).drop("_shard"), p, name=name)

    root = ET.Element("TileMetadata")
    ET.SubElement(root, "LayerName").text = name
    ET.SubElement(root, "TileFileCount").text = str(n_shards)
    ET.SubElement(root, "MinZoom").text = str(levels[0]["level"])
    ET.SubElement(root, "MaxZoom").text = str(levels[-1]["level"])
    ET.SubElement(root, "TileMaxCount").text = str(tile_max_count)
    tl = ET.SubElement(root, "TileLevels")
    for li in levels:
        lv = ET.SubElement(tl, "TileLevel")
        ET.SubElement(lv, "LevelName").text = str(li["level"])
        ET.SubElement(lv, "MinRow").text = str(li["min_row"])
        ET.SubElement(lv, "MaxRow").text = str(li["max_row"])
        ET.SubElement(lv, "MinColumn").text = str(li["min_col"])
        ET.SubElement(lv, "MaxColumn").text = str(li["max_col"])
        ET.SubElement(lv, "TileCount").text = str(li["count"])
    with open(xml_path, "w") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write(ET.tostring(root, encoding="unicode"))
    return {"shards": n_shards, "tiles": total}


def parse_tfat_xml(xml_path: str) -> dict:
    """TileMetadata parse (:1108-1135) incl. the reference's required-
    field hard errors."""
    root = ET.parse(xml_path).getroot()
    if root.tag != "TileMetadata":
        raise ValueError("Missing TileMetadata element.")
    for req in ("TileFileCount", "MinZoom", "MaxZoom"):
        if root.find(req) is None:
            raise ValueError(
                "Missing one of TileFileCount, MinZoom or MaxZoom "
                "on TileMetadata.")
    n = int(root.findtext("TileFileCount"))
    if n <= 0:
        raise ValueError("TileFileCount less than or equal to 0.")
    name = root.findtext("LayerName") or \
        os.path.splitext(os.path.basename(xml_path))[0]
    levels = []
    tl = root.find("TileLevels")
    if tl is not None:
        for lv in tl:
            levels.append({
                "level": int(lv.findtext("LevelName", "-1")),
                "min_row": int(lv.findtext("MinRow", "-1")),
                "max_row": int(lv.findtext("MaxRow", "-1")),
                "min_col": int(lv.findtext("MinColumn", "-1")),
                "max_col": int(lv.findtext("MaxColumn", "-1")),
                "count": int(lv.findtext("TileCount", "-1")),
            })
    return {"name": name, "count": n,
            "min_zoom": int(root.findtext("MinZoom")),
            "max_zoom": int(root.findtext("MaxZoom")),
            "tile_max_count": int(root.findtext("TileMaxCount", "-1")),
            "levels": levels}


def read_tfat(spark: SparkSession, xml_path: str, *,
              zoom: int | None = None) -> DataFrame:
    """TFAT scan: parse the KB descriptor, hard-fail on any missing
    shard (like the reference's open loop :1160-1176), union the
    per-shard descriptor-parallel scans."""
    meta = parse_tfat_xml(xml_path)
    dirname = os.path.dirname(xml_path) or "."
    out = None
    for i in range(meta["count"]):
        p = os.path.join(dirname, f"{meta['name']}_{i}.mbtiles")
        if not os.path.exists(p):
            raise FileNotFoundError(f"Cannot open file '{p}'")
        df = mbtiles.read_mbtiles(spark, p, zoom=zoom,
                                  raster_id=meta["name"])
        out = df if out is None else out.unionByName(df)
    return out
