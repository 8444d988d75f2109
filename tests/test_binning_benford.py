"""weighted_sample, equi_depth_label, benford_audit unit coverage:
determinism, degenerate shapes, and the status matrices."""

import math

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.colstats import (
    BENFORD_PPM,
    benford_audit,
    equi_depth_label,
)
from pandasschema_spark.operators.sampling import weighted_sample


def test_weighted_sample_clamps_and_drops_null_weight(spark):
    df = spark.createDataFrame(
        [(1, 2_000_000), (2, 1_000_000), (3, 0), (4, -5), (5, None)],
        "id long, w long")
    kept = {r["id"] for r in weighted_sample(df, "id", "w").collect()}
    # w >= denom keeps always, w <= 0 and NULL never
    assert {1, 2} <= kept and not ({3, 4, 5} & kept)


def test_weighted_sample_is_repartition_invariant_and_monotone(spark):
    df = spark.createDataFrame([(i, 300_000) for i in range(400)],
                               "id long, w long")
    a = {r["id"] for r in weighted_sample(df, "id", "w").collect()}
    b = {r["id"] for r in
         weighted_sample(df.repartition(13), "id", "w").collect()}
    assert a == b and 0 < len(a) < 400
    # raising every row's weight only ADDS rows (same buckets, higher bar)
    hi = {r["id"] for r in weighted_sample(
        df.withColumn("w", F.lit(600_000)), "id", "w").collect()}
    assert a <= hi


def test_equi_depth_label_balances_and_orders(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "x long")
    out = (equi_depth_label(df, "x", 10).groupBy("bin")
           .agg(F.count(F.lit(1)).alias("n"), F.min("x").alias("lo"),
                F.max("x").alias("hi"))
           .orderBy("bin").collect())
    assert [r["bin"] for r in out] == list(range(1, 11))
    assert all(r["n"] == 100 for r in out)
    # bins tile the range in order
    for a, b in zip(out, out[1:]):
        assert a["hi"] < b["lo"]


def test_equi_depth_label_duplicate_cutoffs_and_nulls(spark):
    # 90% of mass on one value -> consecutive cutoffs collide; ties must
    # all land in the FIRST matching bin, later bins legitimately empty
    rows = [(5,)] * 90 + [(100 + i,) for i in range(10)] + [(None,)]
    df = spark.createDataFrame(rows, "x long")
    got = equi_depth_label(df, "x", 4).collect()
    by_val = {}
    for r in got:
        by_val.setdefault(r["x"], set()).add(r["bin"])
    assert by_val[5] == {1}          # every tied row gets the same bin
    assert by_val[None] == {None}    # NULL value -> NULL label
    assert max(b for bs in by_val.values() for b in bs if b) == 4


def test_equi_depth_label_guards(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        equi_depth_label(df, "x", 1)
    empty = spark.createDataFrame([], "x long")
    with pytest.raises(ValueError):
        equi_depth_label(empty, "x", 4)


def test_benford_constants_are_floor_log10():
    for d, ppm in enumerate(BENFORD_PPM, start=1):
        assert ppm == math.floor(1e6 * math.log10(1 + 1 / d))
    assert sum(BENFORD_PPM) <= 1_000_000


def test_benford_audit_flags_uniform_and_missing_digits(spark):
    # leading digits all '1' -> digit 1 way over, 2..9 missing (n=0,
    # obs 0 vs exp >= 45757 -> deviant); nonpositive rows excluded
    df = spark.createDataFrame(
        [(100 + i,) for i in range(50)] + [(0,), (-7,), (None,)],
        "x long")
    out = {r["digit"]: r for r in benford_audit(df, "x").collect()}
    assert len(out) == 9
    assert out[1]["n"] == 50 and out[1]["status"] == "deviant"
    assert all(out[d]["n"] == 0 and out[d]["status"] == "deviant"
               for d in range(2, 10))


def test_benford_audit_passes_true_benford_sample(spark):
    # exact expected-share sample: digit d gets round(BENFORD_PPM[d]/100)
    # rows -> every |obs - exp| well under the 20k ppm tolerance
    rows = []
    for d, ppm in enumerate(BENFORD_PPM, start=1):
        rows += [(d * 10000 + i,) for i in range(round(ppm / 100))]
    df = spark.createDataFrame(rows, "x long")
    out = benford_audit(df, "x").collect()
    assert all(r["status"] == "ok" for r in out)
