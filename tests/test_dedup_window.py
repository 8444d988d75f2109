"""windowed_duplicate_ids + incremental_window_duplicates:
freshness-scoped content dedup, batch and daily-ingest forms."""

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.dedup import (
    incremental_window_duplicates,
    window_fingerprints,
    windowed_duplicate_ids,
)


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


def _split(df, threshold):
    store_texts = df.where(F.col("id") < threshold)
    new = df.where(F.col("id") >= threshold)
    return window_fingerprints(store_texts, "text", "id"), new


def test_incremental_equals_batch_over_union(spark):
    """The attested equality: incremental over (store fingerprints, new
    batch) == batch windowed_duplicate_ids over the union restricted to
    new-batch ids — on a live corpus with cross-batch, in-batch,
    expired, and normalization-merged content."""
    rows = [(0, "same"), (49, "same"), (51, "same"), (200, "same"),
            (10, "other"), (55, "OTHER "), (60, "other"),
            (52, "fresh today"), (54, "fresh  today"), (300, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    store, new = _split(df, 50)
    inc = {(r["id"], r["prev_id"], r["gap"]) for r in
           incremental_window_duplicates(new, store, "text", "id",
                                         window=50).collect()}
    batch = {(r["id"], r["prev_id"], r["gap"]) for r in
             windowed_duplicate_ids(df, "text", "id", window=50).collect()
             if r["id"] >= 50}
    assert inc == batch
    # cross-batch flag (51 vs store 49), in-batch flags (54 vs 52 after
    # normalization, 60 vs 55 after normalization, 55 vs store 10),
    # expired (200 vs 51 = 149 > 50), and never a store-internal row
    assert inc == {(51, 49, 2), (54, 52, 2), (55, 10, 45), (60, 55, 5)}


def test_incremental_union_cap_drops_wholesale(spark):
    """The hot-content cap counts over the UNION of store and new —
    6 store + 6 new copies exceed a cap of 9 even though neither side
    does alone, and the content drops from BOTH sides."""
    rows = [(i, "boiler") for i in range(6)] + \
        [(100 + i, "boiler") for i in range(6)] + [(4, "x"), (101, "x")]
    df = spark.createDataFrame(rows, "id long, text string")
    store, new = _split(df, 50)
    capped = incremental_window_duplicates(new, store, "text", "id",
                                           window=500,
                                           max_content_df=9).collect()
    assert [(r["id"], r["prev_id"]) for r in capped] == [(101, 4)]
    exact = incremental_window_duplicates(new, store, "text", "id",
                                          window=500,
                                          max_content_df=None).count()
    assert exact == 7  # 6 boiler flags on the new side + the x pair


def test_incremental_replayed_id_deterministic(spark):
    """A cross-side id collision (replayed ingest) flags the NEW row
    against its store twin with gap 0, deterministically — the window
    orders (id, side) with the store row first, so no per-task
    tie-break decides the output. Changed content under the same id is
    a different fingerprint and never flags."""
    store_rows = [(100, "same content"), (200, "old content")]
    new_rows = [(100, "same content"), (200, "CHANGED content"),
                (205, "old content")]
    store = window_fingerprints(
        spark.createDataFrame(store_rows, "id long, text string"),
        "text", "id")
    new = spark.createDataFrame(new_rows, "id long, text string")
    for _ in range(3):  # rerun: the output must be identical every time
        got = {(r["id"], r["prev_id"], r["gap"]) for r in
               incremental_window_duplicates(new, store, "text", "id",
                                             window=50).collect()}
        assert got == {(100, 100, 0), (205, 200, 5)}


def test_incremental_guard_and_plan(spark):
    df = spark.createDataFrame([(1, "x"), (100, "x")], "id long, text string")
    store, new = _split(df, 50)
    with pytest.raises(ValueError):
        incremental_window_duplicates(new, store, "text", "id", window=0)
    plan = incremental_window_duplicates(
        new, store, "text", "id", window=500, max_content_df=None) \
        ._jdf.queryExecution().executedPlan().toString()
    # the union of two slim sides feeds ONE hash(fingerprint) exchange
    # into the lag window; no join, no agg on the uncapped path
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan and "HashAggregate" not in plan, plan


def test_plan_one_digest_exchange(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    plan = windowed_duplicate_ids(df, "text", "id", window=5,
                                  max_content_df=None) \
        ._jdf.queryExecution().executedPlan().toString()
    # one hash(digest) exchange feeding the lag window; no join, no agg
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan and "HashAggregate" not in plan, plan
