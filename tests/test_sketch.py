"""KMV distinct sketch: exact small-cardinality branch, estimator accuracy,
batch-size invariance, null handling."""

import hashlib

import pytest
from pyspark.sql import Row

from pandasschema_spark.operators.sketch import kmv_distinct


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        Row(
            uid=i % 5000,          # 5000 distinct
            cat="c{}".format(i % 7),  # 7 distinct
            maybe=(None if i % 3 == 0 else i % 11),
        )
        for i in range(20000)
    ]
    return spark.createDataFrame(rows)


def _by_col(df):
    return {r["column"]: r for r in df.collect()}


def test_exact_branch_small_cardinality(frame):
    got = _by_col(kmv_distinct(frame, ["cat", "maybe"], k=64))
    assert got["cat"]["n_kept"] == 7
    assert got["cat"]["est_distinct"] == 7
    assert got["cat"]["kth_min"] is None
    # nulls excluded: the 11 mod-11 residues all appear among i%3!=0 rows
    assert got["maybe"]["est_distinct"] == 11 and got["maybe"]["n_kept"] == 11


def test_estimator_within_kmv_error(frame):
    got = _by_col(kmv_distinct(frame, ["uid"], k=256))
    r = got["uid"]
    assert r["n_kept"] == 256
    assert r["kth_min"] is not None and len(r["kth_min"]) == 16
    # stderr ~ 1/sqrt(k-2) ~ 6.3%; 4 sigma deterministic bound
    assert abs(r["est_distinct"] - 5000) / 5000 < 0.25


def test_estimator_matches_closed_form(frame):
    """The k-set and estimate are a pure function of the data: recompute
    them in plain Python from the same md5 rule."""
    k = 128
    hs = sorted({hashlib.md5(str(u).encode()).hexdigest()[:16] for u in range(5000)})
    h_k = int(hs[k - 1], 16)
    expected = (k - 1) * (1 << 64) // h_k
    got = _by_col(kmv_distinct(frame, ["uid"], k=k))["uid"]
    assert got["kth_min"] == hs[k - 1]
    assert got["est_distinct"] == expected


def test_batch_size_invariance(frame, spark):
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    base = {r["column"]: (r["n_kept"], r["kth_min"], r["est_distinct"])
            for r in kmv_distinct(frame, ["uid", "cat"], k=64).collect()}
    spark.conf.set(key, "7")
    try:
        small = {r["column"]: (r["n_kept"], r["kth_min"], r["est_distinct"])
                 for r in kmv_distinct(frame, ["uid", "cat"], k=64).collect()}
        assert small == base
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_all_null_column(spark):
    df = spark.createDataFrame([Row(x=None), Row(x=None)], "x: int")
    got = _by_col(kmv_distinct(df, ["x"], k=8))
    assert got["x"]["n_kept"] == 0 and got["x"]["est_distinct"] == 0


def test_k_guard(frame):
    with pytest.raises(ValueError):
        kmv_distinct(frame, ["uid"], k=1)
    with pytest.raises(ValueError):
        kmv_distinct(frame, [], k=16)


class TestCms:
    def test_matches_hashlib_closed_form(self, spark):
        import hashlib
        from collections import Counter

        from pandasschema_spark.operators.sketch import cms_sketch

        vals = ["a", "b", "a", "c", None, "a", "b"]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = {(r["r"], r["b"]): r["cnt"]
               for r in cms_sketch(df, "v", width=16, depth=4).collect()}
        want = Counter()
        for v in vals:
            if v is None:
                continue
            hx = hashlib.md5(v.encode()).hexdigest()
            for r in range(4):
                want[(r, int(hx[8 * r: 8 * r + 8], 16) % 16)] += 1
        assert got == dict(want)

    def test_estimate_overcounts_never_under(self, spark):
        from collections import Counter

        from pandasschema_spark.operators.sketch import cms_estimate, cms_sketch

        vals = [str(i % 37) for i in range(1000)] + ["hot"] * 200
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        sk = cms_sketch(df, "v", width=64, depth=4)
        truth = Counter(vals)
        est = cms_estimate(sk, list(truth) + ["absent"], width=64, depth=4)
        for k, t in truth.items():
            assert est[k] >= t
        assert est["hot"] == 200 or est["hot"] > 200
        # absent key can only collide upward, never go negative
        assert est["absent"] >= 0

    def test_sketches_merge_by_addition(self, spark):
        from pandasschema_spark.operators.sketch import cms_sketch

        a = spark.createDataFrame([("x",), ("y",)], "v string")
        b = spark.createDataFrame([("x",), ("z",)], "v string")
        both = a.unionByName(b)
        sa = {(r["r"], r["b"]): r["cnt"] for r in cms_sketch(a, "v", width=8, depth=2).collect()}
        sb = {(r["r"], r["b"]): r["cnt"] for r in cms_sketch(b, "v", width=8, depth=2).collect()}
        su = {(r["r"], r["b"]): r["cnt"] for r in cms_sketch(both, "v", width=8, depth=2).collect()}
        merged = dict(sa)
        for k, v in sb.items():
            merged[k] = merged.get(k, 0) + v
        assert merged == su

    def test_guards(self, spark):
        import pytest as _pytest

        from pandasschema_spark.operators.sketch import cms_sketch

        df = spark.createDataFrame([("x",)], "v string")
        with _pytest.raises(ValueError):
            cms_sketch(df, "v", depth=5)
        with _pytest.raises(ValueError):
            cms_sketch(df, "v", width=0)

    def test_single_exchange(self, spark):
        from pandasschema_spark.operators.sketch import cms_sketch

        df = spark.createDataFrame([("x",)], "v string")
        plan = cms_sketch(df, "v")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 2 and "Join" not in plan


def test_cms_estimate_spark_cast_rendering_and_depth_guard(spark):
    """cms_sketch hashes Spark's string CAST ('true'), so cms_estimate
    must render keys the same way — and a depth mismatch must raise,
    not silently return 0 (voiding the >=-true-count guarantee)."""
    import pytest

    from pandasschema_spark.operators.sketch import cms_estimate, cms_sketch

    df = spark.createDataFrame([(True,)] * 7 + [(False,)] * 3, "b boolean")
    sk = cms_sketch(df, "b", width=64, depth=2)
    est = cms_estimate(sk, [True, False], width=64, depth=2)
    assert est[True] >= 7 and est[False] >= 3
    with pytest.raises(ValueError, match="depth"):
        cms_estimate(sk, [True], width=64, depth=4)


def test_kmv_reduce_accumulates_across_batches(spark):
    """The bottom-k pre-reduce folds ACROSS Arrow batches and yields once
    per partition — the exchange must carry O(partitions x k) rows, not
    O(batches x k)."""
    from pyspark.sql import functions as F

    from pandasschema_spark.operators.sketch import kmv_distinct

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.range(0, 20000, 1, 2).select(
            (F.col("id") % 5000).cast("string").alias("v"))
        out = {r["column"]: r for r in kmv_distinct(df, ["v"], k=64).collect()}
        est = out["v"]["est_distinct"]
        assert 3500 <= est <= 6500  # ~5000 within KMV error at k=64
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
