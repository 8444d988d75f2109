"""canonical_representatives: best-copy-per-cluster curation policy."""

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.dedup import canonical_representatives


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_best_by_quality_with_transitive_closure(spark):
    # chain 1-2, 2-3 closes into one cluster; 4 pairs with 5; 6 singleton
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 30, "b"), (3, 20, "c"),
         (4, 5, "d"), (5, 5, "e"), (6, 7, "f")],
        "id long, q int, payload string")
    pairs = _pairs(spark, [(1, 2), (2, 3), (4, 5)])
    out = {r["cluster_id"]: r for r in
           canonical_representatives(df, "id", pairs, ["q"],
                                     payload_cols=["payload"]).collect()}
    assert set(out) == {1, 4, 6}
    # cluster 1: max q=30 -> id 2; payload rides along
    assert (out[1]["id"], out[1]["q"], out[1]["payload"],
            out[1]["n_members"]) == (2, 30, "b", 3)
    # cluster 4: q tie -> LARGEST id wins, payload never decides
    assert (out[4]["id"], out[4]["n_members"]) == (5, 2)
    # singleton: its own cluster, n_members 1
    assert (out[6]["id"], out[6]["q"], out[6]["n_members"]) == (6, 7, 1)


def test_payload_never_decides_tie(spark):
    df = spark.createDataFrame(
        [(1, 5, "zzz"), (2, 5, "aaa")], "id long, q int, p string")
    out, = canonical_representatives(
        df, "id", _pairs(spark, [(1, 2)]), ["q"],
        payload_cols=["p"]).collect()
    # equal q -> id 2 wins even though its payload sorts lower
    assert (out["id"], out["p"]) == (2, "aaa")


def test_star_fast_path_matches_cc_closure(spark):
    # pairs_are_stars skips the connected-components closure; on a
    # min-rooted star forest (the exact_duplicate_ids output shape,
    # including edges given in either orientation) it must produce
    # byte-identical clusters, winners and member counts
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 30, "b"), (3, 20, "c"),
         (4, 5, "d"), (5, 5, "e"), (6, 7, "f"), (9, 2, "g")],
        "id long, q int, payload string")
    # stars rooted at the min id: {1,2,3} -> 1, {4,5} -> 4; edge (4,5)
    # deliberately reversed to exercise the least/greatest canon
    pairs = _pairs(spark, [(2, 1), (3, 1), (5, 4)])
    kw = dict(payload_cols=["payload"])
    slow = sorted(map(tuple, canonical_representatives(
        df, "id", pairs, ["q"], **kw).collect()))
    fast = sorted(map(tuple, canonical_representatives(
        df, "id", pairs, ["q"], pairs_are_stars=True, **kw).collect()))
    assert fast == slow
    # singletons (6, 9) keep themselves in both paths
    assert {t[0] for t in fast} == {1, 4, 6, 9}


def test_guard_and_plan(spark):
    df = spark.createDataFrame([(1, 1)], "id long, q int")
    with pytest.raises(ValueError):
        canonical_representatives(df, "id", _pairs(spark, []), [])
    plan = canonical_representatives(
        df, "id", _pairs(spark, [(1, 2)]), ["q"])._jdf.queryExecution() \
        .executedPlan().toString()
    # window-free argmax: the hot-cluster sort-through-one-task shape
    # must never appear
    assert "Window" not in plan, plan
    assert "partial_max" in plan, plan
