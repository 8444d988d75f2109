"""operators/sampling.py temperature_weights + _isqrt_expr: exact
integer sqrt in-plan (including the int64 edge) and the T=2/T=4
resampling shares. math.isqrt is the local oracle."""

import math

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.sampling import (
    _isqrt_expr,
    temperature_weights,
)


def test_isqrt_expr_matches_math_isqrt_everywhere(spark):
    edge = 3037000499  # isqrt(2**63 - 1)
    vals = (
        [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**6 - 1, 10**6, 10**6 + 1]
        + [k * k + d for k in (10**5, 10**9, edge - 1) for d in (-1, 0, 1)]
        + [2**62, 2**63 - 1, edge * edge, edge * edge - 1]
    )
    vals = sorted({v for v in vals if v >= 0})
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["x"]: r["s"] for r in
           df.select("x", _isqrt_expr(F.col("x")).alias("s")).collect()}
    for v in vals:
        assert got[v] == math.isqrt(v), v


def _weights(spark, rows, **kw):
    df = spark.createDataFrame([(v,) for v in rows], "lang string")
    out = temperature_weights(df, "lang", **kw)
    return {r["value"]: r.asDict() for r in out.collect()}


def test_flattening_exact(spark):
    # en: 900 rows, sw: 100 rows -> raw 90/10, weights 30/10 -> 75/25
    got = _weights(spark, ["en"] * 900 + ["sw"] * 100 + [None] * 7)
    assert got["en"]["n_rows"] == 900 and got["sw"]["n_rows"] == 100
    assert got["en"]["raw_ppm"] == 900_000 and got["sw"]["raw_ppm"] == 100_000
    assert got["en"]["weight"] == 30 and got["sw"]["weight"] == 10
    assert got["en"]["weight_ppm"] == 750_000 and got["sw"]["weight_ppm"] == 250_000
    assert None not in got  # NULL cohort excluded from counts AND totals


def test_sqrt_steps_compose_as_fourth_root(spark):
    got = _weights(spark, ["a"] * 700 + ["b"] * 80, sqrt_steps=2)
    assert got["a"]["weight"] == math.isqrt(math.isqrt(700))  # 5
    assert got["b"]["weight"] == math.isqrt(math.isqrt(80))   # 2


def test_ppm_floor_and_bounds(spark):
    got = _weights(spark, ["a"] * 3 + ["b"] * 3 + ["c"] * 3)
    # 3 cohorts of equal weight: floor(1e6/3) each, never rounding up
    assert all(v["weight_ppm"] == 333_333 for v in got.values())
    assert all(0 <= v["raw_ppm"] <= 1_000_000 for v in got.values())


def test_plan_one_agg_plus_window_totals(spark):
    df = spark.createDataFrame([("a",)] * 8, "lang string")
    plan = (temperature_weights(df, "lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_count" in plan          # map-side combine
    # totals via whole-frame window sums over the O(values) aggregate:
    # the counts subtree is planned once — no join-back, so composed
    # pipelines (apportion -> quota) stop replaying the corpus agg
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("Scan ExistingRDD") == 1, plan


def test_arg_guards(spark):
    df = spark.createDataFrame([("a",)], "lang string")
    with pytest.raises(ValueError):
        temperature_weights(df, "lang", sqrt_steps=0)
    with pytest.raises(ValueError):
        temperature_weights(df, "lang", denom=0)
