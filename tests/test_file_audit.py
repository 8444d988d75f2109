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


class TestShardBalance:
    def test_skewed_shard_surfaces(self, spark):
        from pandasschema_spark.operators.profile import shard_balance

        rows = []
        for i in range(300):
            rows.append(("ok.csv", str(i % 3)))          # uniform thirds
        for i in range(300):
            rows.append(("skew.csv", str(i % 2)))        # no class '2'
        rows.append(("ok.csv", None))                     # excluded
        df = spark.createDataFrame(rows, "f string, cls string")
        out = {(r["source_file"], r["value"]): r
               for r in shard_balance(df, "cls", file_col="f").collect()}
        # within-file shares
        assert out[("ok.csv", "0")]["obs_ppm"] == 1000000 // 3
        assert out[("skew.csv", "0")]["obs_ppm"] == 500000
        assert ("skew.csv", "2") not in out  # absent class emits no row
        # global shares: class 2 has 100 of 600
        assert out[("ok.csv", "2")]["exp_ppm"] == 100 * 1000000 // 600
        assert sum(1 for _ in out) == 5

    def test_single_data_exchange(self, spark):
        from pandasschema_spark.operators.profile import shard_balance

        df = spark.createDataFrame([("f", "a")], "f string, cls string")
        plan = shard_balance(df, "cls", file_col="f")._jdf.queryExecution().executedPlan().toString()
        # all joins broadcast; the only hash exchange keys (file, class)
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


class TestNullBursts:
    def test_burst_surfaces(self, spark):
        from pyspark.sql import functions as F

        from pandasschema_spark.operators.profile import null_bursts

        rows = []
        # day 0: clean; day 1: field v dark for every row
        for i in range(100):
            rows.append(("2026-01-01 00:00:{:02d}".format(i % 60), 1.0))
        for i in range(100):
            rows.append(("2026-01-02 00:00:{:02d}".format(i % 60), None))
        rows.append((None, 5.0))  # NULL ts excluded
        df = spark.createDataFrame(rows, "ts string, v double").withColumn(
            "ts", F.col("ts").cast("timestamp_ntz"))
        out = {r["bucket_start_s"]: r
               for r in null_bursts(df, "ts", ["v"], bucket_s=86400).collect()}
        day0 = 1767225600  # 2026-01-01 epoch
        assert out[day0]["null_ppm"] == 0
        assert out[day0 + 86400]["null_ppm"] == 1000000
        # global rate is 500000 -> symmetric signed excess
        assert out[day0]["excess_ppm"] == -500000
        assert out[day0 + 86400]["excess_ppm"] == 500000
        assert sum(r["n_rows"] for r in out.values()) == 200

    def test_single_data_exchange(self, spark):
        from pyspark.sql import functions as F

        from pandasschema_spark.operators.profile import null_bursts

        df = spark.createDataFrame([("2026-01-01 00:00:00", 1.0)], "ts string, v double")
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        plan = null_bursts(df, "ts", ["v"])._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    def test_guards(self, spark):
        import pytest as _pytest
        from pandasschema_spark.operators.profile import null_bursts

        df = spark.createDataFrame([("x",)], "ts string")
        with _pytest.raises(ValueError):
            null_bursts(df, "ts", [])
        with _pytest.raises(ValueError):
            null_bursts(df, "ts", ["ts"], bucket_s=0)
