"""CEM collinearity transformer (the fork's alg/gdal_cem.cpp)."""

import math

import numpy as np
import pytest

from gdal_spark.cem import (CEMTransformer, cem_info_to_md,
                            extract_cem_info)

CEM = dict(
    focal_length=10000.0, xs=2000.0, ys=1000.0, zs=3000.0,
    omega=0.002, phi=-0.0015, kappa=0.001,
    x0=0.1, y0=-0.2, xps=9e-6, yps=9e-6,
    k1=1e-9, k2=-2e-13, p1=3e-8, p2=-1e-8, alpha=1e-5, beta=-2e-5,
    angle_type=1, angle_order=2,
)


def _ref_transform_point(cem: dict, map_x: float, map_y: float,
                         height: float):
    """Literal per-point transcription of CEMTransformPoint
    (gdal_cem.cpp:160-194) — the parity oracle, including the
    reference's raw-map-coordinate denominator."""
    omega = cem["omega"]
    phi = cem["phi"]
    kappa = cem["kappa"]
    a11 = math.cos(phi) * math.cos(kappa) \
        - math.sin(phi) * math.sin(omega) * math.sin(kappa)
    a12 = -(math.cos(phi) * math.sin(kappa)) \
        - (math.sin(phi) * math.sin(omega) * math.cos(kappa))
    a21 = math.cos(omega) * math.sin(kappa)
    a22 = math.cos(omega) * math.cos(kappa)
    a31 = math.sin(phi) * math.cos(kappa) \
        + math.cos(phi) * math.sin(omega) * math.sin(kappa)
    a32 = -(math.sin(phi) * math.sin(kappa)) \
        + math.cos(phi) * math.sin(omega) * math.cos(kappa)
    a33 = math.cos(phi) * math.cos(omega)
    fl = cem["focal_length"]
    d_temp = a31 * map_x + a32 * map_y - a33 * fl
    pixel = (-fl) * ((a11 * (map_x - cem["xs"]) + a21 * (map_y - cem["ys"])
                      + a31 * (height - cem["zs"])) / d_temp)
    line = (-fl) * ((a12 * (map_x - cem["xs"]) + a22 * (map_y - cem["ys"])
                     + a32 * (height - cem["zs"])) / d_temp)
    return pixel, line


def test_forward_matches_reference_transcription():
    t = CEMTransformer(**CEM)
    rng = np.random.default_rng(7)
    xs = rng.uniform(500, 3500, 200)
    ys = rng.uniform(-500, 2500, 200)
    hs = rng.uniform(-100, 400, 200)
    px, ln = t.forward_np(xs, ys, hs)
    for i in range(200):
        rp, rl = _ref_transform_point(CEM, xs[i], ys[i], hs[i])
        assert px[i] == rp and ln[i] == rl


def test_inverse_roundtrip():
    t = CEMTransformer(**CEM)
    rng = np.random.default_rng(1)
    xs = rng.uniform(500, 3500, 500)
    ys = rng.uniform(-500, 2500, 500)
    px, ln = t.forward_np(xs, ys, 0.0)
    xi, yi = t.inverse_np(px, ln, 0.0, threshold=1e-10)
    assert np.abs(xi - xs).max() < 1e-6
    assert np.abs(yi - ys).max() < 1e-6


def test_height_offset_times_scale_quirk():
    # gdal_cem.cpp:745 adds offset*scale to Z (NOT (z+offset)*scale)
    t = CEMTransformer(**CEM, height_offset=50.0, height_scale=2.0)
    base = CEMTransformer(**CEM)
    px1, ln1 = t.forward_np(1500.0, 800.0, 10.0)
    px2, ln2 = base.forward_np(1500.0, 800.0, 10.0 + 50.0 * 2.0)
    assert px1 == px2 and ln1 == ln2


def test_metadata_roundtrip_exact():
    t = CEMTransformer(**CEM)
    t2 = extract_cem_info(cem_info_to_md(t))
    x = np.array([900.0, 2100.0, 3300.0])
    y = np.array([-100.0, 1000.0, 2400.0])
    p1, l1 = t.forward_np(x, y, 25.0)
    p2, l2 = t2.forward_np(x, y, 25.0)
    assert np.array_equal(p1, p2) and np.array_equal(l1, l2)
    assert (t2.k1, t2.p2, t2.alpha, t2.angle_type, t2.angle_order) == (
        t.k1, t.p2, t.alpha, t.angle_type, t.angle_order)


def test_extract_requires_all_keys():
    md = cem_info_to_md(CEMTransformer(**CEM))
    md.pop("CEM_PXIEL_XSIZE")  # the reference's misspelled key
    with pytest.raises(ValueError, match="CEM_PXIEL_XSIZE"):
        extract_cem_info(md)


def test_columns_and_inverse_udf_match_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    t = CEMTransformer(**CEM)
    pdf = pd.DataFrame({"mx": [900.0, 2100.0, 3300.0],
                        "my": [-100.0, 1000.0, 2400.0]})
    df = spark.createDataFrame(pdf)
    px, ln = t.forward_cols(F.col("mx"), F.col("my"))
    fwd = df.select(px.alias("pixel"), ln.alias("line"))
    got = fwd.toPandas()
    ep, el = t.forward_np(pdf["mx"].to_numpy(), pdf["my"].to_numpy())
    assert np.array_equal(got["pixel"].to_numpy(), ep)
    assert np.array_equal(got["line"].to_numpy(), el)

    inv = fwd.withColumn("g", t.inverse_udf(threshold=1e-10)("pixel", "line"))
    back = inv.select("g.mapx", "g.mapy").toPandas()
    assert np.abs(back["mapx"].to_numpy() - pdf["mx"].to_numpy()).max() < 1e-6
    assert np.abs(back["mapy"].to_numpy() - pdf["my"].to_numpy()).max() < 1e-6
