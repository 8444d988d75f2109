"""apportion_budget: exact largest-remainder (Hamilton) apportionment."""

import pytest

from pandasschema_spark.operators.sampling import apportion_budget


def _alloc(spark, weights, budget):
    df = spark.createDataFrame(list(weights.items()), "value string, w long")
    out = apportion_budget(df, "value", "w", budget).collect()
    return {r["value"]: r["quota"] for r in out}


def test_sum_equals_budget_exactly(spark):
    # floors alone give 33+33+33 = 99; Hamilton must hand out the +1
    q = _alloc(spark, {"a": 1, "b": 1, "c": 1}, 100)
    assert sum(q.values()) == 100
    # equal weights, equal remainders -> value-asc tiebreak: 'a' gets it
    assert q == {"a": 34, "b": 33, "c": 33}


def test_textbook_hamilton(spark):
    # weights 5/3/2, budget 7: exact shares 3.5/2.1/1.4, floors 3/2/1,
    # leftover 1 goes to the largest remainder (.5 -> 'a')
    assert _alloc(spark, {"a": 5, "b": 3, "c": 2}, 7) == \
        {"a": 4, "b": 2, "c": 1}


def test_zero_weight_never_receives(spark):
    q = _alloc(spark, {"a": 0, "b": 1}, 5)
    assert q == {"a": 0, "b": 5}


def test_matches_python_reference_across_edge_budgets(spark):
    weights = {"a": 3037000499, "b": 1, "c": 7, "d": 12345}
    for budget in (0, 1, 2, 10**15):
        got = _alloc(spark, weights, budget)
        W = sum(weights.values())
        base = {k: budget * w // W for k, w in weights.items()}
        rem = {k: budget * w % W for k, w in weights.items()}
        leftover = budget - sum(base.values())
        order = sorted(weights, key=lambda k: (-rem[k], k))
        want = {k: base[k] + (1 if order.index(k) < leftover else 0)
                for k in weights}
        assert got == want, budget
        assert sum(got.values()) == budget


def test_quota_ppm_and_guard(spark):
    df = spark.createDataFrame([("a", 1), ("b", 3)], "value string, w long")
    out = {r["value"]: r for r in
           apportion_budget(df, "value", "w", 1000).collect()}
    assert out["b"]["quota_ppm"] == out["b"]["quota"] * 1_000_000 // 1000
    with pytest.raises(ValueError):
        apportion_budget(df, "value", "w", -1)


def test_weight_domain_guard(spark):
    # all-zero total previously produced silent NULL quotas (pmod by 0);
    # negative weights corrupt the largest-remainder ordering
    zeros = spark.createDataFrame([("a", 0), ("b", 0)], "value string, w long")
    with pytest.raises(ValueError, match="total weight"):
        apportion_budget(zeros, "value", "w", 100)
    neg = spark.createDataFrame([("a", 5), ("b", -1)], "value string, w long")
    with pytest.raises(ValueError, match="non-negative"):
        apportion_budget(neg, "value", "w", 100)
    empty = spark.createDataFrame([], "value string, w long")
    with pytest.raises(ValueError, match="total weight"):
        apportion_budget(empty, "value", "w", 100)
    # budgets past int64 cannot ride F.lit / the BIGINT quota column —
    # refused up front instead of a py4j NumberFormatException mid-plan
    ok = spark.createDataFrame([("a", 5)], "value string, w long")
    with pytest.raises(ValueError, match="int64"):
        apportion_budget(ok, "value", "w", 10 ** 20)


def test_plan_is_cohort_frame_only(spark):
    df = spark.createDataFrame([("a", 1), ("b", 3)], "value string, w long")
    plan = apportion_budget(df, "value", "w", 100)._jdf.queryExecution() \
        .executedPlan().toString()
    # totals (W, leftover L) and the remainder rank all ride whole-frame
    # windows over the O(cohorts) frame (deliberate single partition,
    # documented): the input subtree is planned ONCE — no join of any
    # kind, no crossJoin(broadcast(agg)) subtree duplication
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_weight_guard_sees_decimal_cast_and_nulls(spark):
    # a fractional negative double truncates to 0 under cast('long') —
    # the guard must look through the SAME decimal(38,0) cast the
    # computation uses; NULL weights must fail loud, never NULL quotas
    frac_neg = spark.createDataFrame(
        [("a", 5.0), ("b", -0.5)], "value string, w double")
    with pytest.raises(ValueError, match="non-negative"):
        apportion_budget(frac_neg, "value", "w", 100)
    with_null = spark.createDataFrame(
        [("a", 5), ("b", None)], "value string, w long")
    with pytest.raises(ValueError, match="non-NULL"):
        apportion_budget(with_null, "value", "w", 100)
