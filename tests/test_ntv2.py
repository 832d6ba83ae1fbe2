"""NTv2 .gsb grid-shift: format roundtrip, both byte orders, the
distributed hgridshift apply vs the sequential numpy mirror, and the
plan shape (broadcast-only, no input shuffle).

Reference behavior: frmts/raw/ntv2dataset.cpp (header layout, node
order), PROJ hgridshift via ogr/ogrct.cpp; autotest/gdrivers/ntv2.py.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import ntv2


@pytest.fixture(scope="module")
def subs():
    return ntv2.toy_subgrids()


def test_roundtrip_little_endian(tmp_path, subs):
    p = str(tmp_path / "toy.gsb")
    ntv2.write_gsb(p, subs)
    back = ntv2.read_gsb(p)
    assert [s["name"] for s in back] == ["TOYPAR", "TOYCHILD"]
    assert back[0]["parent"] is None and back[1]["parent"] == "TOYPAR"
    for a, b in zip(subs, back):
        g = b["grid"]
        assert g["lat0"] == a["lat0"] and g["lon0"] == a["lon0"]
        assert g["dlat"] == pytest.approx(a["dlat"], abs=1e-12)
        assert g["ni"] == a["shifts"].shape[0]
        assert g["nj"] == a["shifts"].shape[1]
        # float32 values survive exactly
        np.testing.assert_array_equal(
            b["shifts"].astype(np.float32), a["shifts"])


def test_roundtrip_big_endian(subs):
    data = ntv2.toy_gsb_bytes(big_endian=True)
    back = ntv2.read_gsb(data)
    ref = ntv2.read_gsb(ntv2.toy_gsb_bytes())
    for a, b in zip(ref, back):
        np.testing.assert_array_equal(a["shifts"], b["shifts"])
        assert a["grid"] == b["grid"]


def test_fixture_bytes_stable(subs):
    # deterministic fixture: the contract oracle regenerates these
    # bytes independently, so two builds must agree bit-for-bit
    a, b = ntv2.toy_gsb_bytes(), ntv2.toy_gsb_bytes()
    assert a == b
    assert len(a) == 11 * 16 + 2 * 11 * 16 + (21 * 26 + 17 * 21) * 16 + 16


def test_not_gsb():
    with pytest.raises(ValueError):
        ntv2.read_gsb(b"NOTAGRID" + b"\x00" * 100)


def test_apply_matches_numpy(spark, subs_df_cache=None):
    subs = ntv2.read_gsb(ntv2.toy_gsb_bytes())
    rng = np.random.default_rng(7)
    lons = rng.uniform(-112.0, -83.0, 400)   # spills outside the parent
    lats = rng.uniform(28.0, 52.0, 400)
    import pandas as pd
    pdf = pd.DataFrame({"pid": np.arange(400), "lon": lons, "lat": lats})
    df = spark.createDataFrame(pdf)
    out = ntv2.apply_gsb(df, spark, subs).select(
        "pid", "_gid", "lon_shifted", "lat_shifted").toPandas() \
        .sort_values("pid").reset_index(drop=True)
    elon, elat, egid = ntv2.gsb_shift_np(lons, lats, subs)
    np.testing.assert_array_equal(out["_gid"].to_numpy(), egid)
    np.testing.assert_array_equal(out["lon_shifted"].to_numpy(), elon)
    np.testing.assert_array_equal(out["lat_shifted"].to_numpy(), elat)
    # child actually selected for inner points, parent for outer
    assert (egid == 1).any() and (egid == 0).any() and (egid == -1).any()


def test_plan_broadcast_only(spark):
    subs = ntv2.read_gsb(ntv2.toy_gsb_bytes())
    df = spark.range(1000).select(
        (F.col("id") % 29 - 109.0).alias("lon"),
        (F.col("id") % 19 + 31.0).alias("lat"))
    out = ntv2.apply_gsb(df, spark, subs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")
