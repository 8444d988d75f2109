"""inclusion_profile: inclusion-dependency (FK) discovery."""

import pytest

from pandasschema_spark.operators.referential import inclusion_profile


def _rows(out):
    return {(r["col_a"], r["col_b"]): r for r in out.collect()}


def test_fk_pair_reads_full_containment_both_directions_visible(spark):
    child = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,), (4,), (5,)], "pk long")
    got = _rows(inclusion_profile([("c", child, ["k"]),
                                   ("p", parent, ["pk"])]))
    fwd = got[("c.k", "p.pk")]
    # child's 3 distinct values all occur in parent -> FK signature
    assert (fwd["n_a"], fwd["n_b"], fwd["n_common"]) == (3, 5, 3)
    assert fwd["containment_ppm"] == 1_000_000
    rev = got[("p.pk", "c.k")]
    assert rev["containment_ppm"] == 3 * 1_000_000 // 5


def test_disjoint_pairs_are_absent_not_zero(spark):
    a = spark.createDataFrame([("x",)], "a string")
    b = spark.createDataFrame([("y",)], "b string")
    got = _rows(inclusion_profile([("t", a, ["a"]), ("u", b, ["b"])]))
    assert got == {}


def test_nulls_never_participate(spark):
    a = spark.createDataFrame([(1,), (None,)], "a long")
    b = spark.createDataFrame([(1,), (None,)], "b long")
    got = _rows(inclusion_profile([("t", a, ["a"]), ("u", b, ["b"])]))
    # NULL is missingness, not a shared value: n_a counts 1, not 2
    assert got[("t.a", "u.b")]["n_a"] == 1
    assert got[("t.a", "u.b")]["containment_ppm"] == 1_000_000


def test_within_table_pairs_and_min_common(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 9)], "a long, b long")
    got = _rows(inclusion_profile([("t", df, ["a", "b"])]))
    assert got[("t.a", "t.b")]["n_common"] == 2
    assert got[("t.a", "t.b")]["containment_ppm"] == 2 * 1_000_000 // 3
    gated = _rows(inclusion_profile([("t", df, ["a", "b"])], min_common=3))
    assert gated == {}


def test_duplicate_values_collapse_to_distinct(spark):
    # occurrences never inflate the counts: 100x the same value = 1
    a = spark.createDataFrame([("v",)] * 100, "a string")
    b = spark.createDataFrame([("v",)] * 3, "b string")
    got = _rows(inclusion_profile([("t", a, ["a"]), ("u", b, ["b"])]))
    assert got[("t.a", "u.b")]["n_a"] == 1
    assert got[("t.a", "u.b")]["n_common"] == 1


def test_guards(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError):
        inclusion_profile([])
    with pytest.raises(ValueError):
        inclusion_profile([("t", df, [])])
    with pytest.raises(ValueError):
        inclusion_profile([("t", df, ["a"]), ("t", df, ["a"])])
    with pytest.raises(ValueError):
        inclusion_profile([("t", df, ["a"])], min_common=0)


def test_plan_sizes_via_windows_and_stays_codegen(spark):
    a = spark.createDataFrame([(1,)], "a long")
    b = spark.createDataFrame([(1,)], "b long")
    plan = inclusion_profile([("t", a, ["a"]), ("u", b, ["b"])]) \
        ._jdf.queryExecution().executedPlan().toString()
    # pair expansion is chained Generate explodes (codegen), never a HOF
    # lambda; sizes surface from the diagonal rows via two max-over-
    # partition windows on the O(p^2) pair aggregate — no join-back at
    # all (the diagonal-join form recomputed the melt + collect_set
    # subtree 3x: measured 24 parquet scans in the plan vs 8)
    assert "CodegenFallback" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Window") == 2, plan
    assert "partial_collect_set" in plan or "objHashAggregate" in plan.lower(), plan
