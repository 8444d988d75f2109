"""As-of join and banded point-in-interval join (operators/joins.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from pandasschema_spark.operators.joins import (
    asof_join,
    point_in_interval_join,
)


def _asof_fixture(spark):
    # key 1: right at ts 10, 20, 30; key 2: right at ts 5; key 3: none
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "z")],
        "k long, rts long, tag string")
    left = spark.createDataFrame(
        [(1, 9, 100), (1, 10, 101), (1, 25, 102), (1, 99, 103),
         (2, 5, 200), (3, 50, 300)],
        "k long, lts long, rowid long")
    return left, right


def test_asof_inclusive_picks_latest_at_or_before(spark):
    left, right = _asof_fixture(spark)
    out = {r["rowid"]: r["tag"]
           for r in asof_join(left, right, "k", "lts", "rts").collect()}
    assert out == {100: None,   # nothing at/before 9
                   101: "a",    # inclusive: rts == lts matches
                   102: "b",
                   103: "c",
                   200: "z",    # inclusive tie on key 2
                   300: None}   # key with no right rows


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _asof_fixture(spark)
    out = {r["rowid"]: r["tag"]
           for r in asof_join(left, right, "k", "lts", "rts",
                              strict=True).collect()}
    assert out[101] is None     # strict: rts == lts does NOT match
    assert out[200] is None
    # away from ties strict == inclusive: latest rts strictly before
    assert out[102] == "b" and out[103] == "c"


def test_asof_left_rows_all_survive_and_null_right_dropped(spark):
    left, right = _asof_fixture(spark)
    right_with_junk = right.unionByName(spark.createDataFrame(
        [(None, 1, "junk"), (1, None, "junk2")],
        "k long, rts long, tag string"))
    out = asof_join(left, right_with_junk, "k", "lts", "rts").collect()
    assert len(out) == left.count()
    assert not any((r["tag"] or "").startswith("junk") for r in out)


def test_asof_payload_collision_raises(spark):
    left, right = _asof_fixture(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("tag", "rowid"),
                  "k", "lts", "rts")


def test_asof_single_exchange(spark):
    """The union-tag plan shuffles ONCE on the key — no join node, no
    second exchange, no row expansion."""
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, "k", "lts", "rts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
    assert "Join" not in plan, plan[:3000]


def test_interval_join_matches_naive_range_join(spark):
    points = spark.createDataFrame(
        [(1, t, 1000 + t) for t in range(0, 200, 7)]
        + [(2, 64, 900), (2, 65, 901)],
        "k long, ts long, pid long")
    intervals = spark.createDataFrame(
        [(1, 10, 50, "w1"), (1, 40, 140, "w2"), (2, 65, 66, "w3"),
         (1, 300, 400, "empty")],
        "k long, s long, e long, wid string")
    got = sorted((r["pid"], r["wid"]) for r in point_in_interval_join(
        points, intervals, "k", "ts", "s", "e", band=32).collect())
    naive = sorted((r["pid"], r["wid"]) for r in points.join(
        intervals, "k").where((F.col("ts") >= F.col("s"))
                              & (F.col("ts") < F.col("e"))).collect())
    assert got == naive and len(got) > 5
    # each qualifying pair exactly once — no band-overlap duplicates
    assert len(got) == len(set(got))


def test_interval_join_band_guard_raises(spark):
    points = spark.createDataFrame([(1, 5, 1)], "k long, ts long, pid long")
    intervals = spark.createDataFrame(
        [(1, 0, 10_000_000, "huge")], "k long, s long, e long, wid string")
    with pytest.raises(Exception, match="max_bands"):
        point_in_interval_join(points, intervals, "k", "ts", "s", "e",
                               band=2, max_bands=8).collect()


def test_interval_join_no_cartesian_plan(spark):
    points = spark.createDataFrame(
        [(1, t, t) for t in range(50)], "k long, ts long, pid long")
    intervals = spark.createDataFrame(
        [(1, 0, 25, "w")], "k long, s long, e long, wid string")
    out = point_in_interval_join(points, intervals, "k", "ts", "s", "e",
                                 band=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan[:3000]


def test_interval_join_negative_epochs_floor_div(spark):
    """Bands must use FLOOR division: a point at ts=-1 and an interval
    [-5, 3) share band -1 with band=4 — truncating division would put
    them in band 0 and still work, but mixed signs around 0 break it."""
    points = spark.createDataFrame(
        [(1, -1, 10), (1, -5, 11), (1, 2, 12), (1, -6, 13)],
        "k long, ts long, pid long")
    intervals = spark.createDataFrame(
        [(1, -5, 3, "w")], "k long, s long, e long, wid string")
    got = sorted(r["pid"] for r in point_in_interval_join(
        points, intervals, "k", "ts", "s", "e", band=4).collect())
    assert got == [10, 11, 12]
