"""Raster attribute tables: XML (PAM) roundtrip, color-table init,
distributed default-RAT histogram vs sequential bincount.

Reference: gcore/gdal_rat.cpp, autotest/gcore/rat.py.
"""

import numpy as np

from gdal_spark import rat, synth


def test_xml_roundtrip(tmp_path):
    r = rat.RAT(
        [("VALUE", rat.GFT_INTEGER, rat.GFU["MinMax"]),
         ("COUNT", rat.GFT_INTEGER, rat.GFU["PixelCount"]),
         ("CLASS", rat.GFT_STRING, rat.GFU["Name"]),
         ("AREA", rat.GFT_REAL, rat.GFU["Generic"])],
        [(1, 100, "water", 0.5), (2, 200, "forest", 42.25)])
    p = str(tmp_path / "t.aux.xml")
    rat.write_aux_xml(p, {1: r, 2: rat.RAT.from_color_table(
        [[255, 0, 0], [0, 255, 0]])})
    back = rat.read_aux_xml(p)
    assert sorted(back) == [1, 2]
    b = back[1]
    assert b.fields == r.fields
    assert b.rows == r.rows
    assert b.table_type == "thematic"
    ct = back[2]
    assert ct.rows[0] == (0, 255, 0, 0, 255)
    assert ct.fields[1][2] == rat.GFU["Red"]


def test_real_field_shortest_roundtrip(tmp_path):
    v = 42.49223523773253
    r = rat.RAT([("X", rat.GFT_REAL, 0)], [(v,)])
    back = rat.RAT.from_xml(r.to_xml())
    assert back.rows[0][0] == v


def test_default_rat_distributed_matches_bincount(spark):
    from gdal_spark import enhance
    import localref

    tiles = synth.tiles_src_df(spark, 2, 2)
    classified = enhance.classify(tiles, localref.CLASSIFY_DEFS)
    hist = rat.default_rat_df(classified).toPandas() \
        .sort_values("value").reset_index(drop=True)
    g = localref.global_mosaic(2, 2).astype(np.float64)
    dst = np.zeros(g.shape, dtype=np.uint8)
    for value, start, end in localref.CLASSIFY_DEFS:
        dst = np.where((g >= start) & (g <= end), np.uint8(value), dst)
    c = np.bincount(dst.ravel())
    exp = {int(v): int(c[v]) for v in np.nonzero(c)[0]}
    got = dict(zip(hist["value"].astype(int), hist["count"].astype(int)))
    assert got == exp
    assert int(hist["count"].sum()) == 4 * 256 * 256


def test_rat_report(spark):
    r = rat.RAT([("VALUE", rat.GFT_INTEGER, rat.GFU["MinMax"])],
                [(7,), (9,)])
    rep = rat.rat_report(spark, {1: r}, "x").toPandas()
    assert len(rep) == 2
    assert rep["attrs"].iloc[1]["VALUE"] == "9"
