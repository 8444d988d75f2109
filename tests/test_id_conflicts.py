"""id_conflicts: key-collision triage (re-ingest vs label conflict)."""

import pytest

from pandasschema_spark.operators.distinct import id_conflicts


def test_reingest_vs_conflict(spark):
    df = spark.createDataFrame(
        [("a", "hello", 1), ("a", "hello", 1),      # harmless re-ingest
         ("b", "x", 2), ("b", "y", 2), ("b", "y", 3),  # label conflict
         ("c", "solo", 4)],                          # unique -> absent
        "clip_id string, transcript string, sr int")
    out = {r["clip_id"]: r for r in
           id_conflicts(df, "clip_id", ["transcript"],
                        meta_cols=["sr"]).collect()}
    assert set(out) == {"a", "b"}
    assert (out["a"]["n_rows"], out["a"]["n_labels"], out["a"]["n_meta"]) == (2, 1, 1)
    assert (out["b"]["n_rows"], out["b"]["n_labels"], out["b"]["n_meta"]) == (3, 2, 2)


def test_null_label_is_a_distinct_value(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", "t"), ("b", None), ("b", None)],
        "clip_id string, transcript string")
    out = {r["clip_id"]: r for r in
           id_conflicts(df, "clip_id", ["transcript"]).collect()}
    assert out["a"]["n_labels"] == 2   # NULL vs 't'
    assert out["b"]["n_labels"] == 1   # NULL == NULL


def test_null_sentinel_no_tuple_collision(spark):
    # ('a', NULL) must NOT collide with ('a',) rendered as 'a' + ''
    df = spark.createDataFrame(
        [("k", "a", None), ("k", "a", "")],
        "clip_id string, t1 string, t2 string")
    out = id_conflicts(df, "clip_id", ["t1", "t2"]).collect()
    assert out[0]["n_labels"] == 2


def test_null_id_excluded_and_guard(spark):
    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), ("a", "z")],
        "clip_id string, transcript string")
    assert id_conflicts(df, "clip_id", ["transcript"]).collect() == []
    with pytest.raises(ValueError):
        id_conflicts(df, "clip_id", [])


def test_no_expand_in_plan(spark):
    df = spark.createDataFrame(
        [("a", "x", 1)], "clip_id string, transcript string, sr int")
    plan = id_conflicts(df, "clip_id", ["transcript"], meta_cols=["sr"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
