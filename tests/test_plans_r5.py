"""Round-5 plan audits: the new scans stay map-only / broadcast-only.

Asserted (same discipline as tests/test_plans_r4.py):
  - HDF5 chunk scan: no shuffle exchange of any kind
  - SQLite rowid-window scan: the only exchange is the plan
    repartition (descriptor rows, not data rows)
  - webtiles plan: pure column math, zero exchanges
  - NTv2 apply is asserted broadcast-only in tests/test_ntv2.py
"""

import numpy as np
import pandas as pd

from gdal_spark import hdf5, sqlitevec, webtiles


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hdf5_scan_map_only(spark, tmp_path):
    p = str(tmp_path / "p.h5")
    a = (np.arange(600, dtype=np.float32) % 7).reshape(20, 30)
    hdf5.write_hdf5(p, [{"name": "v", "data": a, "chunks": (8, 8)}])
    md = hdf5.read_hdf5_array(spark, p, "v")
    plan = _plan(md.df)
    assert "ShuffleExchange" not in plan.replace("BroadcastExchange", "")
    assert "Sort" not in plan and "Window" not in plan


def test_sqlite_scan_exchanges_descriptors_only(spark, tmp_path):
    p = str(tmp_path / "p.sqlite")
    pdf = pd.DataFrame({"a": range(100),
                        "wkt": [f"POINT ({k} 1)" for k in range(100)]})
    sqlitevec.write_sqlite(spark.createDataFrame(pdf), p, table="t")
    out = sqlitevec.read_sqlite(spark, p, "t", rows_per_batch=16)
    plan = _plan(out)
    # one round-robin repartition of the (lo, hi) window rows is the
    # plan's only exchange; the feature rows themselves never shuffle
    assert plan.count("Exchange") <= 1
    assert "SortExec" not in plan and "Window" not in plan


def test_webtiles_plan_pure_codegen(spark):
    plan_df = webtiles.wms_tile_plan(
        spark, "https://w.example/ows", "l", 4, (0, 4), (0, 4))
    plan = _plan(plan_df)
    assert "Exchange" not in plan
    # executedPlan().toString() marks whole-stage-codegen spans "*(n)"
    assert "*(1)" in plan
