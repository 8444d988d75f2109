"""quota_sample: exact per-cohort selection by md5(id) order."""

import hashlib

from pandasschema_spark.operators.sampling import quota_sample


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, id long")


def _quotas(spark, d):
    return spark.createDataFrame(list(d.items()), "value string, quota long")


def test_selects_exactly_the_md5_bottom_quota(spark):
    rows = [("a", i) for i in range(10)] + [("b", i) for i in range(10, 16)]
    out = quota_sample(_df(spark, rows), "g", "id",
                       _quotas(spark, {"a": 3, "b": 2}))
    got = {(r["g"], r["id"]) for r in out.collect()}
    want = set()
    for g, ids in (("a", range(10)), ("b", range(10, 16))):
        k = {"a": 3, "b": 2}[g]
        picked = sorted(ids, key=lambda i: hashlib.md5(
            str(i).encode()).hexdigest())[:k]
        want |= {(g, i) for i in picked}
    assert got == want


def test_quota_larger_than_cohort_keeps_all(spark):
    rows = [("a", 1), ("a", 2)]
    out = quota_sample(_df(spark, rows), "g", "id",
                       _quotas(spark, {"a": 99}))
    assert out.count() == 2


def test_absent_and_zero_quota_cohorts_unsampled(spark):
    rows = [("a", 1), ("b", 2), ("c", 3)]
    out = quota_sample(_df(spark, rows), "g", "id",
                       _quotas(spark, {"a": 1, "b": 0}))
    got = {r["g"] for r in out.collect()}
    assert got == {"a"}  # b quota 0, c absent from the quota frame


def test_rerun_stability_and_rank_column(spark):
    rows = [("a", i) for i in range(20)]
    q = _quotas(spark, {"a": 5})
    first = {(r["id"], r["rk"]) for r in
             quota_sample(_df(spark, rows), "g", "id", q).collect()}
    second = {(r["id"], r["rk"]) for r in
              quota_sample(_df(spark, rows), "g", "id", q).collect()}
    assert first == second and len(first) == 5
    assert {rk for _, rk in first} == {1, 2, 3, 4, 5}
