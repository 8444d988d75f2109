"""Deterministic hash sampling: reproducibility and partition-invariance."""

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.sampling import (
    assign_splits,
    deterministic_sample,
)


def test_sample_is_repartition_invariant(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    s1 = {r["k"] for r in deterministic_sample(df, "k", 0.3).collect()}
    s2 = {r["k"] for r in
          deterministic_sample(df.repartition(13), "k", 0.3).collect()}
    assert s1 == s2
    assert 0.2 < len(s1) / 2000 < 0.4


def test_sample_is_append_stable(spark):
    small = spark.range(0, 500).select(F.col("id").alias("k"))
    big = spark.range(0, 1000).select(F.col("id").alias("k"))
    s_small = {r["k"] for r in deterministic_sample(small, "k", 0.5).collect()}
    s_big = {r["k"] for r in deterministic_sample(big, "k", 0.5).collect()}
    assert s_small == {k for k in s_big if k < 500}


def test_salt_decorrelates(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    a = {r["k"] for r in deterministic_sample(df, "k", 0.5, salt="a").collect()}
    b = {r["k"] for r in deterministic_sample(df, "k", 0.5, salt="b").collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.3 < overlap < 0.7  # independent-ish, not identical


def test_splits_partition_and_cover(spark):
    df = spark.range(0, 1500).select(F.col("id").alias("k"))
    out = assign_splits(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["c"] for r in
              out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert None not in counts  # fractions sum to 1 -> full coverage
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_splits_holdout_is_explicit(spark):
    df = spark.range(0, 300).select(F.col("id").alias("k"))
    out = assign_splits(df, "k", {"train": 0.5})
    labels = {r["split"] for r in out.collect()}
    assert labels == {"train", None}


def test_splits_overcommit_raises(spark):
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="sum"):
        assign_splits(df, "k", {"a": 0.7, "b": 0.5})
    # a negative fraction walks the range cursor backwards, silently
    # overlapping earlier ranges (and fooling the sum check) — refused
    with pytest.raises(ValueError, match="non-negative"):
        assign_splits(df, "k", {"a": 0.6, "bad": -0.2, "b": 0.6})


def test_splits_no_truncation_gap(spark):
    """Fractions like 0.29 sit just below their decimal value in float;
    range widths must round, not truncate, or keys near denom get a
    silent NULL label despite fractions summing to 1."""
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    out = assign_splits(df, "k", {"a": 0.29, "b": 0.71})
    labels = {r["split"] for r in out.collect()}
    assert labels == {"a", "b"}  # full coverage, no NULL


def test_half_bucket_fraction_rounds_up(spark):
    """An exactly-representable half-bucket fraction (0.5/denom) must
    yield ONE bucket, not zero — Python round()'s half-to-even would
    silently empty the sample."""
    from pandasschema_spark.operators.sampling import (
        assign_splits, deterministic_sample, hash_bucket_expr)

    df = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    denom = 1_000_000
    frac = 0.5 / denom  # 0.0000005: round() -> 0 buckets, half-up -> 1
    got = deterministic_sample(df, "k", frac, denom=denom)
    want = df.where(hash_bucket_expr(F.col("k"), denom) < 1)
    assert sorted(r["k"] for r in got.collect()) \
        == sorted(r["k"] for r in want.collect())
    lab = assign_splits(df, "k", {"tiny": frac}, denom=denom)
    assert lab.where(F.col("split") == "tiny").count() == want.count()


def test_embedding_validate_defects(spark):
    from pandasschema_spark.operators.similarity import embedding_validate

    rows = [
        (1, [1.0, 2.0]),
        (2, [1.0]),                       # wrong dim
        (3, [float("nan"), 1.0]),         # NaN
        (4, [0.0, 0.0]),                  # zero vector
        (5, None),                        # null embedding -> size -1 != dim
        (6, [0.0, 5.0]),                  # min 0 but not zero vector -> clean
    ]
    df = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<float>")
    got = {r["vec_id"]: (r["n_dims"], r["has_nan"], r["is_zero"])
           for r in embedding_validate(df, dim=2).collect()}
    assert set(got) == {2, 3, 4, 5}
    assert got[2] == (1, False, False)
    assert got[3][1] is True
    assert got[4] == (2, False, True)


def test_embedding_validate_plan_codegen_clean(spark):
    from pandasschema_spark.operators.similarity import embedding_validate

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id: bigint, embedding: array<float>")
    plan = embedding_validate(df, dim=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "CodegenFallback" not in plan
