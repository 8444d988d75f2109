"""concentration_profile: integer-exact Simpson concentration audit."""

import pytest

from pandasschema_spark.operators.colstats import concentration_profile


def test_exact_simpson_and_top_share(spark):
    # col a: 4x 'x', 2x 'y' -> num = 4*3 + 2*1 = 14, den = 6*5 = 30
    # col b: all distinct -> num = 0
    rows = [("x", i) for i in range(4)] + [("y", 10), ("y", 11)]
    df = spark.createDataFrame(rows, "a string, b long")
    out = {r["column"]: r for r in
           concentration_profile(df, ["a", "b"]).collect()}
    a = out["a"]
    assert (a["n_nonnull"], a["n_distinct"], a["c_max"]) == (6, 2, 4)
    assert a["simpson_ppm"] == 14 * 1_000_000 // 30
    assert a["top_share_ppm"] == 4 * 1_000_000 // 6
    b = out["b"]
    assert (b["simpson_ppm"], b["n_distinct"]) == (0, 6)


def test_constant_column_reads_full_concentration(spark):
    df = spark.createDataFrame([("k",)] * 5, "a string")
    row, = concentration_profile(df, ["a"]).collect()
    assert row["simpson_ppm"] == 1_000_000
    assert row["top_share_ppm"] == 1_000_000


def test_nulls_excluded_and_small_n(spark):
    df = spark.createDataFrame(
        [("x",), (None,), (None,)], "a string")
    row, = concentration_profile(df, ["a"]).collect()
    # one non-null row: n < 2 -> simpson undefined (NULL), top share 100%
    assert (row["n_nonnull"], row["simpson_ppm"], row["top_share_ppm"]) == \
        (1, None, 1_000_000)


def test_guard_and_plan(spark):
    df = spark.createDataFrame([("x", 1)], "a string, b long")
    with pytest.raises(ValueError):
        concentration_profile(df, [])
    plan = concentration_profile(df, ["a", "b"])._jdf.queryExecution() \
        .executedPlan().toString()
    # melt explodes BEFORE a map-side-combined agg: the exchange carries
    # counter rows, never occurrences; no window, no HOF fallback
    assert "Window" not in plan, plan
    assert "CodegenFallback" not in plan, plan
    assert "partial_count" in plan, plan
