"""IDW gridding golden test vs single-node numpy brute force, and the
exact word-n-gram Jaccard dedup vs hand-built duplicates."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.functions import text as TX
from gdal_spark.gridding import idw_grid


def test_idw_grid_matches_bruteforce(spark):
    rng = [(i, -170.0 + (i * 37 % 340), -80.0 + (i * 53 % 160), float(i % 11)) for i in range(80)]
    pts = spark.createDataFrame(pd.DataFrame(rng, columns=["id", "lon", "lat", "v"]))
    out = (
        idw_grid(pts, "v", ntx=2, nty=2, tile_px=8, radius=40.0)
        .toPandas()
        .set_index(["gx", "gy"])
        .sort_index()
    )
    # brute force
    rx, ry = 360.0 / 16, 170.0 / 16
    lon = np.array([r[1] for r in rng])
    lat = np.array([r[2] for r in rng])
    v = np.array([r[3] for r in rng])
    for gx in range(16):
        for gy in range(16):
            plon = -180.0 + (gx + 0.5) * rx
            plat = 85.0 - (gy + 0.5) * ry
            d2 = (plon - lon) ** 2 + (plat - lat) ** 2
            m = d2 <= 1600.0
            if not m.any():
                assert (gx, gy) not in out.index or np.isnan(out.loc[(gx, gy), "value"])
                continue
            exp = np.sum(v[m] / d2[m]) / np.sum(1.0 / d2[m])
            got = out.loc[(gx, gy), "value"]
            assert abs(got - exp) < 1e-9, (gx, gy, got, exp)


def test_idw_exact_hit(spark):
    pts = spark.createDataFrame(
        pd.DataFrame({"lon": [-180.0 + 0.5 * (360.0 / 16)], "lat": [85.0 - 0.5 * (170.0 / 16)], "v": [42.0]})
    )
    out = idw_grid(pts, "v", ntx=2, nty=2, tile_px=8, radius=40.0).toPandas()
    px = out[(out.gx == 0) & (out.gy == 0)]["value"].iloc[0]
    assert px == 42.0  # d == 0 -> the point's own value


def test_word_ngram_jaccard_dedup(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps over the dog",
                    "the quick brown fox jumps over the cat",  # near-dup of 1
                    "completely different words here now",
                    "the quick brown fox jumps over the dog",  # exact dup of 1
                ],
            }
        )
    )
    got = (
        TX.word_ngram_jaccard_dedup(docs, "text", "doc_id", n=2, threshold=0.5)
        .toPandas()
        .sort_values(["id_a", "id_b"])
    )
    pairs = list(zip(got.id_a, got.id_b))
    assert (1, 4) in pairs  # exact dup, J = 1.0
    assert (1, 2) in pairs and (2, 4) in pairs  # 6/8 shared bigrams
    assert not any(3 in p for p in pairs)
    j14 = got[(got.id_a == 1) & (got.id_b == 4)]["jaccard"].iloc[0]
    assert j14 == 1.0


def test_invdistnn_limits_neighbors(spark):
    from gdal_spark.gridding import grid_interpolate

    # one cluster of 3 near points (v=10) + 1 far point (v=1000) still
    # in radius: invdist blends all 4, invdistnn(max_points=3) must
    # ignore the far one
    pts = spark.createDataFrame(
        [
            (-178.0, 84.0, 10.0),
            (-178.1, 84.1, 10.0),
            (-177.9, 83.9, 10.0),
            (-160.0, 70.0, 1000.0),
        ],
        "lon double, lat double, v double",
    )
    nn = grid_interpolate(pts, "v", ntx=4, nty=4, tile_px=8,
                          algorithm="invdistnn", radius=30.0, max_points=3)
    row = nn.filter("gx = 0 and gy = 0").first()
    assert abs(row["value"] - 10.0) < 1e-9
    allp = grid_interpolate(pts, "v", ntx=4, nty=4, tile_px=8,
                            algorithm="invdist", radius=30.0)
    row2 = allp.filter("gx = 0 and gy = 0").first()
    assert row2["value"] > 10.0  # far point bleeds in without the cap


def test_grid_ellipse_window(spark):
    """Rotated-ellipse membership: a point on the ellipse's long axis
    at distance r1 is in; the same distance on the short axis is out."""
    import math

    import pandas as pd
    from pyspark.sql import functions as F

    from gdal_spark.gridding import grid_interpolate

    # grid pixel centers at plon = -180 + (gx+0.5)*2.8125 etc. — put
    # points relative to pixel (16, 16)'s center
    plon = -180.0 + 16.5 * (360.0 / 128)
    plat = 85.0 - 16.5 * (170.0 / 128)
    a = math.radians(30.0)
    on_long = (plon + 25.0 * math.cos(a), plat + 25.0 * math.sin(a))
    on_short = (plon - 25.0 * math.sin(a), plat + 25.0 * math.cos(a))
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "lon": [on_long[0], on_short[0]],
                "lat": [on_long[1], on_short[1]],
                "v": [10.0, 99.0],
            }
        )
    )
    out = grid_interpolate(
        pts, "v", ntx=4, nty=4, tile_px=32, algorithm="average",
        radius=30.0, radius2=15.0, angle=30.0,
    )
    row = out.filter((F.col("gx") == 16) & (F.col("gy") == 16)).collect()[0]
    # long-axis point (dist 25 < r1=30) is inside; short-axis point
    # (dist 25 > r2=15) is outside -> average == 10 exactly
    assert row["value"] == 10.0
