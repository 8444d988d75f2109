"""Order-statistics operators: exact quantiles, z-score outliers,
heavy hitters, stratified sampling."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.colstats import (
    class_balance,
    heavy_hitters_by,
    exact_quantiles,
    heavy_hitters,
    zscore_cutoffs,
    zscore_outliers,
)
from pandasschema_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)


def test_exact_quantiles_match_numpy_disc(spark):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=3000).tolist()
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    out = {r["q_pm"]: r for r in
           exact_quantiles(df, "x", [10, 500, 990]).collect()}
    s = sorted(vals)
    for q in (10, 500, 990):
        rank = -((-q * len(vals)) // 1000)  # ceil
        assert out[q]["rank"] == rank
        assert out[q]["value"] == s[rank - 1]
        assert out[q]["n"] == len(vals)


def test_exact_quantiles_ignore_nulls_and_ties(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "x long")
    out = {r["q_pm"]: r["value"] for r in
           exact_quantiles(df, "x", [500, 1000]).collect()}
    # n=4 (null excluded): p50 rank=2 -> 1, p100 rank=4 -> 2
    assert out[500] == 1 and out[1000] == 2


def test_zscore_cutoffs_exact_identity(spark):
    """Cutoffs must agree with the direct big-int squared comparison for
    every value — including near the boundary."""
    vals = [10, 12, 11, 9, 13, 10, 11, 500, 2, 10, 12]  # one huge, one low
    df = spark.createDataFrame([("g", int(v)) for v in vals], "g string, x long")
    (c,) = zscore_cutoffs(df, "x", ["g"], k=2)
    n, s = len(vals), sum(vals)
    ss = sum(v * v for v in vals)
    big = 4 * (n * ss - s * s)
    for v in range(0, 600):
        direct = (n * v - s) ** 2 > big
        via_cuts = v <= c.lo_cut or v >= c.hi_cut
        assert direct == via_cuts, v


def test_zscore_outliers_flags_tail(spark):
    rows = [("a", i, 50 + (i % 7)) for i in range(200)]
    rows += [("a", 900, 10_000), ("a", 901, -9_000)]
    rows += [("b", i + 1000, 7) for i in range(50)]  # zero-ish variance group
    df = spark.createDataFrame(rows, "g string, id long, x long")
    out = zscore_outliers(df, "x", ["g"], k=3, keep_cols=["id"]).collect()
    assert {r["id"] for r in out} == {900, 901}
    assert all(r["g"] == "a" for r in out)


def test_zscore_requires_integer_k(spark):
    df = spark.createDataFrame([("a", 1)], "g string, x long")
    with pytest.raises(ValueError, match="integer"):
        zscore_cutoffs(df, "x", ["g"], k=2.5)


def test_heavy_hitters_ranks_and_ties(spark):
    rows = [(v,) for v in [1] * 5 + [2] * 5 + [3] * 7 + [4] * 2 + [5]]
    df = spark.createDataFrame(rows, "x long")
    out = heavy_hitters(df, "x", top_k=3).orderBy("rank").collect()
    # count desc, value asc on ties: 3(7), then 1(5) before 2(5)
    assert [(r["value"], r["cnt"], r["rank"]) for r in out] == \
        [(3, 7, 1), (1, 5, 2), (2, 5, 3)]


def test_stratified_sample_matches_per_stratum_rule(spark):
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)],
        "k long, lang string")
    frac = {"en": 0.5, "de": 0.05}
    got = {r["k"] for r in
           stratified_sample(df, "k", "lang", frac,
                             default_fraction=1.0).collect()}
    # per-stratum equivalence with the plain sampler restricted to the stratum
    for lang, f in [("en", 0.5), ("de", 0.05), ("fr", 1.0)]:
        sub = df.where(F.col("lang") == lang)
        want = {r["k"] for r in deterministic_sample(sub, "k", f).collect()}
        assert {k for k in got if ["en", "de", "fr"][k % 3] == lang} == want


def test_stratified_sample_is_repartition_invariant(spark):
    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(2000)], "k long, s string")
    a = {r["k"] for r in
         stratified_sample(df, "k", "s", {"a": 0.3, "b": 0.7}).collect()}
    b = {r["k"] for r in
         stratified_sample(df.repartition(13), "k", "s",
                           {"a": 0.3, "b": 0.7}).collect()}
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# property-based: the integer identities must hold for arbitrary data
# ---------------------------------------------------------------------------

import hypothesis.strategies as st
from hypothesis import given, settings


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=999))
def test_quantile_rank_law_property(vals, q_pm):
    """Pure-python check of the ceil-rank law the operator and oracle
    share: value at rank ceil(q*n/denom) in sorted order, driven by the
    same (q*n + denom - 1) // denom integer form both engines use."""
    n = len(vals)
    rank = (q_pm * n + 999) // 1000
    assert rank == -((-q_pm * n) // 1000)  # the two ceil forms agree
    assert 1 <= rank <= n
    s = sorted(vals)
    v = s[rank - 1]
    # v is the smallest value whose cumulative count reaches rank
    below = sum(1 for x in vals if x < v)
    at = sum(1 for x in vals if x <= v)
    assert below < rank <= at


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=2, max_size=40),
       st.integers(min_value=1, max_value=6))
def test_zscore_cutoff_identity_property(vals, k):
    """Cutoff form == squared form for arbitrary ints (incl. values far
    outside the observed range): x <= lo or x >= hi <=>
    (n*x - s)^2 > k^2*(n*ss - s^2)."""
    import math

    n, s = len(vals), sum(vals)
    ss = sum(v * v for v in vals)
    c = k * k * (n * ss - s * s)
    t = math.isqrt(c) + 1
    lo = (s - t) // n
    hi = -((-(s + t)) // n)
    probes = set(vals) | {lo - 1, lo, lo + 1, hi - 1, hi, hi + 1,
                          min(vals) - 10**12, max(vals) + 10**12}
    for x in probes:
        assert ((n * x - s) ** 2 > c) == (x <= lo or x >= hi), (x, lo, hi)


def test_heavy_hitters_by_per_group_ranks(spark):
    rows = ([("a", "x")] * 4 + [("a", "y")] * 4 + [("a", "z")] * 2
            + [("b", "y")] * 3 + [("b", "z")])
    df = spark.createDataFrame(rows, "g string, v string")
    out = {(r["grp"], r["rank"]): (r["value"], r["cnt"]) for r in
           heavy_hitters_by(df, "g", "v", top_k=2).collect()}
    # ties (a: x=4, y=4) break value-asc; only top-2 per group survive
    assert out == {("a", 1): ("x", 4), ("a", 2): ("y", 4),
                   ("b", 1): ("y", 3), ("b", 2): ("z", 1)}


def test_class_balance_shares(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] + [(None,)], "v string")
    out = {r["value"]: (r["cnt"], r["total"], r["share_ppm"]) for r in
           class_balance(spark.createDataFrame(
               [("a",)] * 6 + [("b",)] * 3 + [("c",)] + [(None,)],
               "v string"), "v").collect()}
    assert out == {"a": (6, 10, 600000), "b": (3, 10, 300000),
                   "c": (1, 10, 100000)}


def test_zscore_outliers_null_group_reported(spark):
    """zscore_cutoffs keeps a NULL cohort (groupBy semantics); the
    outlier join must be NULL-safe so that cohort's rows are not
    silently dropped."""
    from pandasschema_spark.operators.colstats import zscore_outliers

    rows = [(None, 10)] * 30 + [(None, 1000)] + [("g", 10)] * 30 + [("g", 1000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = zscore_outliers(df, "v", ["grp"], k=3)
    got = {(r["grp"], r["value"]) for r in out.collect()}
    assert got == {(None, 1000), ("g", 1000)}


def test_winsorized_and_mad_fail_loud_on_empty(spark):
    from pandasschema_spark.operators.colstats import (
        mad_outliers, winsorized_sum_by)

    empty = spark.createDataFrame([], "grp string, v long")
    with pytest.raises(ValueError, match="no non-null values"):
        winsorized_sum_by(empty, "v", ["grp"])
    all_null = spark.createDataFrame([("a", None)], "grp string, v long")
    with pytest.raises(ValueError, match="no non-null values"):
        mad_outliers(all_null, "v")
