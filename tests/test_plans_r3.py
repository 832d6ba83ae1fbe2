"""Physical-plan shape assertions for the round-3 operators — the
100-TB design contract: map-only where no shuffle is needed, partial
aggregation before the one shuffle that is."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_boolean_overlay_is_map_only(spark, sf_dir):
    """Geometry booleans and the concave piece overlay broadcast the
    zone model — no Exchange of any kind in the plan."""
    import __spark_entry__ as E

    for name in ("geometry_boolean", "overlay_concave_wkt"):
        df = E.queries()[name](spark, sf_dir)
        p = _plan(df)
        assert "ShuffleExchange" not in p.replace("BroadcastExchange", ""), name
        assert "Exchange hashpartitioning" not in p, name


def test_rasterize_z_partial_aggregates(spark, sf_dir):
    """The Z-burn merge must combine map-side: partial_sum before the
    single pixel-key exchange."""
    import __spark_entry__ as E

    p = _plan(E.queries()["rasterize_z"](spark, sf_dir))
    assert "partial_sum" in p
    assert p.count("Exchange hashpartitioning") == 1


def test_grid_linear_single_shuffle(spark, sf_dir):
    """TIN interpolation: one groupBy(tile) shuffle over the tiny tile
    list; the broadcast triangulation adds no exchange."""
    import __spark_entry__ as E

    p = _plan(E.queries()["grid_linear"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") <= 1


def test_conic_crs_is_codegen(spark, sf_dir):
    """CRS forwards are pure column math: no python runner in the plan
    and at least one whole-stage codegen span."""
    import __spark_entry__ as E

    p = _plan(E.queries()["lcc_transform"](spark, sf_dir))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # '*(n)' prefixes mark whole-stage-codegen stages in the plan string
    assert "*(1)" in p
