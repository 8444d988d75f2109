"""file_audit: per-source-file bad-shard detection (operators/profile.py)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.profile import file_audit

DIR = "/tmp/psf_file_audit_test"


@pytest.fixture(scope="module")
def shard_df(spark):
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    # shard b is the poisoned one
    specs = {"a.csv": ["1", "2", "3"], "b.csv": ["x", "2", "y", "z"], "c.csv": ["5"]}
    for fn, vals in specs.items():
        with open(os.path.join(DIR, fn), "w") as fh:
            fh.write("v\n")
            for v in vals:
                fh.write(v + "\n")
    yield spark.read.options(header=True).csv(DIR)
    shutil.rmtree(DIR, ignore_errors=True)


def test_per_file_counts(shard_df):
    out = {r["source_file"]: r for r in
           file_audit(shard_df, ~F.col("v").rlike("^[0-9]+$")).collect()}
    assert out["a.csv"]["n_rows"] == 3 and out["a.csv"]["n_bad"] == 0
    assert out["b.csv"]["n_rows"] == 4 and out["b.csv"]["n_bad"] == 3
    assert out["c.csv"]["n_rows"] == 1 and out["c.csv"]["n_bad"] == 0
    assert out["b.csv"]["bad_ppm"] == 750000
    assert out["a.csv"]["bad_ppm"] == 0


def test_explicit_file_col(spark):
    df = spark.createDataFrame(
        [("s3://bucket/x/p1.parquet", 1), ("s3://bucket/x/p1.parquet", 9),
         ("s3://bucket/y/p2.parquet", 9)],
        "path string, v int",
    )
    out = {r["source_file"]: r for r in
           file_audit(df, F.col("v") > 5, file_col="path").collect()}
    assert out["p1.parquet"]["n_bad"] == 1 and out["p2.parquet"]["n_bad"] == 1
    # basename_only=False keeps full provenance
    full = {r["source_file"] for r in
            file_audit(df, F.col("v") > 5, file_col="path",
                       basename_only=False).collect()}
    assert full == {"s3://bucket/x/p1.parquet", "s3://bucket/y/p2.parquet"}


def test_single_agg_plan(shard_df):
    plan = file_audit(shard_df, F.col("v").isNull())._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # one logical exchange (AQE pair)
    assert "Join" not in plan
