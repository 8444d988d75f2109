"""windowed_duplicate_ids: freshness-scoped content dedup."""

import pytest

from pandasschema_spark.operators.dedup import windowed_duplicate_ids


def test_nearest_previous_not_first(spark):
    # A@0, B@49, C@51: B flags vs A (gap 49); C flags vs B (gap 2) even
    # though C vs the ORIGINAL A is 51 > window — a chain of stale
    # re-crawls never launders itself against an expired original
    df = spark.createDataFrame(
        [(0, "same"), (49, "same"), (51, "same"), (200, "same"),
         (10, "other")],
        "id long, text string")
    out = {r["id"]: (r["prev_id"], r["gap"]) for r in
           windowed_duplicate_ids(df, "text", "id", window=50).collect()}
    assert out == {49: (0, 49), 51: (49, 2)}  # 200 vs 51 expired (149)


def test_normalization_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "A  b"), (3, "a b"), (5, None), (7, None)],
        "id long, text string")
    out = windowed_duplicate_ids(df, "text", "id", window=10).collect()
    # whitespace/case variants merge; NULL texts carry no content identity
    assert [(r["id"], r["prev_id"], r["gap"]) for r in out] == [(3, 1, 2)]


def test_hot_content_cap_drops_wholesale(spark):
    rows = [(i, "boiler") for i in range(10)] + [(100, "x"), (101, "x")]
    df = spark.createDataFrame(rows, "id long, text string")
    capped = windowed_duplicate_ids(df, "text", "id", window=5,
                                    max_content_df=9).collect()
    assert [(r["id"], r["gap"]) for r in capped] == [(101, 1)]
    exact = windowed_duplicate_ids(df, "text", "id", window=5,
                                   max_content_df=None).collect()
    assert len(exact) == 10  # 9 boiler gaps + the x pair


def test_guard(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        windowed_duplicate_ids(df, "text", "id", window=0)


def test_plan_one_digest_exchange(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = windowed_duplicate_ids(df, "text", "id", window=5,
                                  max_content_df=None) \
        ._jdf.queryExecution().executedPlan().toString()
    # one hash(digest) exchange feeding the lag window; no join, no agg
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan and "HashAggregate" not in plan, plan
