"""violation_hotspots: melt-agg lift mining semantics."""

from pyspark.sql import functions as F

from pandasschema_spark.operators.profile import violation_hotspots


def _mk(spark):
    # region A: 50% bad; region B: 10% bad; tier dim uncorrelated
    rows = []
    for i in range(200):
        region = "A" if i < 100 else "B"
        # badness spans both tiers evenly (i%4<2 hits one even + one odd
        # residue, likewise i%20<2) so tier shows NO lift by construction
        bad = (i % 4 < 2) if region == "A" else (i % 20 < 2)
        rows.append((i, region, "t{}".format(i % 2), bool(bad)))
    return spark.createDataFrame(rows, "id long, region string, tier string, bad boolean")


def test_lift_selectivity(spark):
    df = _mk(spark)
    out = violation_hotspots(df, F.col("bad"), ["region", "tier"],
                             min_support=10, min_lift_pct=120).collect()
    # global = 60/200 = 300000 ppm; A = 500000 ppm (lift 1.67) surfaces,
    # B = 100000 ppm and both tiers (~300000) do not
    assert [(r["dim"], r["value"], r["n"], r["bad_n"], r["rate_ppm"], r["global_ppm"])
            for r in out] == [("region", "A", 100, 50, 500000, 300000)]


def test_min_support_gate(spark):
    df = _mk(spark)
    out = violation_hotspots(df, F.col("bad"), ["region", "tier"],
                             min_support=101, min_lift_pct=120).collect()
    assert out == []  # region groups have n=100 < 101


def test_null_dim_value_groups(spark):
    rows = [(1, None, True), (2, None, True), (3, "x", False), (4, "x", False)]
    df = spark.createDataFrame(rows, "id long, d string, bad boolean")
    out = violation_hotspots(df, F.col("bad"), ["d"],
                             min_support=2, min_lift_pct=110).collect()
    assert len(out) == 1 and out[0]["value"] is None and out[0]["rate_ppm"] == 1000000


def test_missingness_profile(spark):
    from pandasschema_spark.operators.profile import missingness_profile

    rows = [(None, None, 1), (None, "x", 2), ("a", "y", 3), ("b", None, None)]
    df = spark.createDataFrame(rows, "p string, q string, r long")
    got = {r["pattern"]: (r["n_rows"], r["n_missing"])
           for r in missingness_profile(df, ["p", "q", "r"]).collect()}
    assert got == {"110": (1, 2), "100": (1, 1), "000": (1, 0), "011": (1, 2)}


def test_degenerate_zero_global_rate_emits_nothing_spurious(spark):
    """global_ppm == 0 (violations rarer than 1 ppm) used to make the
    lift filter 0 >= 0 and flood the output with zero-violation values;
    the bad_n > 0 guard binds exactly there (and only there — with
    global_ppm > 0 the lift filter already implies bad_n > 0)."""
    from pyspark.sql import functions as F

    from pandasschema_spark.operators.profile import violation_hotspots

    n = 3_000_000
    df = (spark.range(n)
          .select((F.col("id") % 3).cast("string").alias("d1"),
                  (F.col("id") < 1).cast("int").alias("bad")))
    out = violation_hotspots(df, F.col("bad") == 1, ["d1"],
                             min_support=10, min_lift_pct=115).collect()
    # one violation among 3M rows in cohort d1='0': global_ppm floors to
    # 0; only the cohort actually containing the violation may appear
    assert all(r["bad_n"] > 0 for r in out)
    assert {r["value"] for r in out} == {"0"}
