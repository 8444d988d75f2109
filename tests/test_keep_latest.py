"""keep_latest: window-free argmax compaction."""

import pytest
from pyspark.sql import Window, functions as F

from pandasschema_spark.operators.dedup import keep_latest


def test_matches_window_form(spark):
    rows = [(i % 17, (i * 31) % 97, i, "p%d" % (i % 5)) for i in range(400)]
    df = spark.createDataFrame(rows, "k int, ver int, id int, payload string") \
        .repartition(7)
    w = Window.partitionBy("k").orderBy(F.desc("ver"), F.desc("id"))
    expect = sorted(tuple(r) for r in
                    df.withColumn("rn", F.row_number().over(w))
                      .where("rn = 1").drop("rn").collect())
    got = sorted(tuple(r) for r in
                 keep_latest(df, ["k"], ["ver", "id"], ["payload"]).collect())
    assert got == expect


def test_payload_never_decides(spark):
    # equal order tuple is impossible with the id tiebreak; payload order
    # (z < a alphabetically reversed) must not leak into the winner
    df = spark.createDataFrame(
        [(1, 5, 1, "zzz"), (1, 5, 2, "aaa")], "k int, ver int, id int, p string")
    out = keep_latest(df, ["k"], ["ver", "id"], ["p"]).collect()
    assert [(r["k"], r["ver"], r["id"], r["p"]) for r in out] == [(1, 5, 2, "aaa")]


def test_guards(spark):
    df = spark.createDataFrame([(1, 1)], "k int, v int")
    with pytest.raises(ValueError):
        keep_latest(df, [], ["v"])
    with pytest.raises(ValueError):
        keep_latest(df, ["k"], [])


def test_plan_no_window_single_exchange(spark):
    df = spark.createDataFrame([(1, 1, 1)], "k int, ver int, id int")
    plan = keep_latest(df, ["k"], ["ver", "id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "partial_max" in plan, plan  # map-side combine is the point
