"""event_transitions: per-user Markov bigram matrix."""

from datetime import datetime

from pandasschema_spark.operators.sessions import event_transitions


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), i, t)
         for i, (u, s, t) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long, event_type string")


def test_transition_counts(spark):
    df = _df(spark, [
        (1, 0, "a"), (1, 1, "b"), (1, 2, "a"),   # a->b, b->a
        (2, 0, "a"), (2, 1, "b"),                # a->b
        (3, 0, "x"),                             # no transition
    ])
    out = {(r["from_type"], r["to_type"]): r["n"] for r in
           event_transitions(df, "user_id", "ts", "event_type",
                             tiebreak_col="event_id").collect()}
    assert out == {("a", "b"): 2, ("b", "a"): 1}


def test_tiebreak_orders_equal_timestamps(spark):
    df = _df(spark, [(1, 0, "a"), (1, 0, "b"), (1, 0, "c")])
    out = {(r["from_type"], r["to_type"]) for r in
           event_transitions(df, "user_id", "ts", "event_type",
                             tiebreak_col="event_id").collect()}
    # event_id order: a -> b -> c
    assert out == {("a", "b"), ("b", "c")}


def test_hot_user_cap_drops_wholesale(spark):
    df = _df(spark, [(1, s, "a") for s in range(5)] + [(2, 0, "a"), (2, 1, "b")])
    out = {(r["from_type"], r["to_type"]): r["n"] for r in
           event_transitions(df, "user_id", "ts", "event_type",
                             tiebreak_col="event_id",
                             max_events_per_user=4).collect()}
    assert out == {("a", "b"): 1}


def test_single_user_exchange(spark):
    df = _df(spark, [(1, 0, "a"), (1, 1, "b")])
    plan = event_transitions(df, "user_id", "ts", "event_type",
                             tiebreak_col="event_id") \
        ._jdf.queryExecution().executedPlan().toString()
    # one hash(user) exchange for the window; the matrix rollup's own
    # exchange moves O(types^2) rows only
    assert plan.count("Window") == 1
    assert "SinglePartition" not in plan
