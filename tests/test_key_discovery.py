"""key_discovery: candidate-key (unique column combination) profiling."""

import pytest

from pandasschema_spark.operators.colstats import key_discovery


def _rows(out):
    return {r["candidate"]: r for r in out.collect()}


def test_key_vs_nonkey_and_composite(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 10), (4, "b", 20)],
        "id long, g string, v long")
    got = _rows(key_discovery(df, [["id"], ["g"], ["g", "v"]]))
    assert got["id"]["is_key"] and got["id"]["unique_ppm"] == 1_000_000
    g = got["g"]
    assert not g["is_key"] and g["n_distinct"] == 2
    assert g["unique_ppm"] == 2 * 1_000_000 // 4
    gv = got["g+v"]
    assert gv["is_key"] and gv["n_distinct"] == 4


def test_null_components_disqualify(spark):
    # a row with a NULL component can never be distinguished by the
    # candidate: it is unusable, and its presence vetoes is_key
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id long, g string")
    got = _rows(key_discovery(df, [["g"], ["id", "g"]]))
    assert got["g"]["n_nonnull"] == 2 and got["g"]["n_distinct"] == 2
    assert not got["g"]["is_key"]  # one unusable row
    assert got["id+g"]["n_nonnull"] == 2 and not got["id+g"]["is_key"]


def test_empty_frame_and_all_null(spark):
    df = spark.createDataFrame([], "id long")
    row, = key_discovery(df, [["id"]]).collect()
    assert (row["n_rows"], row["unique_ppm"], row["is_key"]) == (0, None, False)
    df2 = spark.createDataFrame([(None,), (None,)], "id string")
    row, = key_discovery(df2, [["id"]]).collect()
    assert (row["n_nonnull"], row["unique_ppm"], row["is_key"]) == \
        (0, None, False)


def test_kmv_screen_auto_route(spark):
    """Forced route (tiny cell budget, >= 8 candidates): the true key
    survives the screen and stays exact; far-from-key candidates are
    screened out with exact=false, the KMV estimate in n_distinct
    (exact here — under k distinct values the k-set is the value set),
    and NULL n_nonnull/unique_ppm."""
    rows = [(i, i % 3, "c", i % 2, i % 5, i % 7, i % 11, i % 13)
            for i in range(400)]
    df = spark.createDataFrame(
        rows, "id long, a long, b string, c long, d long, e long, "
              "f long, g long")
    cands = [["id"], ["a"], ["b"], ["c"], ["d"], ["e"], ["f"], ["a", "d"]]
    got = _rows(key_discovery(df, cands, screen_cell_budget=10))
    key = got["id"]
    assert key["exact"] and key["is_key"] and key["n_distinct"] == 400
    assert key["unique_ppm"] == 1_000_000
    expect_est = {"a": 3, "b": 1, "c": 2, "d": 5, "e": 7, "f": 11,
                  "a+d": 15}
    for label, est in expect_est.items():
        r = got[label]
        assert not r["exact"] and not r["is_key"], label
        assert r["n_distinct"] == est, label
        assert r["n_nonnull"] is None and r["unique_ppm"] is None, label
        assert r["n_rows"] == 400, label
    # below the candidate-count floor the route is never taken, even
    # with a tiny budget — the single-pass plan (below) is unchanged
    unrouted = _rows(key_discovery(df, cands[:3], screen_cell_budget=10))
    assert all(r["exact"] for r in unrouted.values())
    assert unrouted["a"]["n_nonnull"] == 400


def test_kmv_screen_null_components(spark):
    """A NULL component nulls the composite screen column (usable-row
    rule) — the screen must not credit unusable rows with distinctness."""
    df = spark.createDataFrame(
        [(i, None if i % 2 else "x{}".format(i)) for i in range(200)],
        "id long, g string")
    # need >= 8 candidates to arm the route: pad with distinct aliases
    df = df.selectExpr("*", "id AS id2", "id AS id3", "id AS id4",
                       "id AS id5")
    got = _rows(key_discovery(
        df, [["id"], ["g"], ["id", "g"], ["id2"], ["id3"], ["id4"],
             ["id5"], ["g", "id"]],
        screen_cell_budget=10))
    # g has 100 usable distinct values of 200 rows = exactly at the 50%
    # bar -> survives and is exact; its composite with id likewise
    assert got["g"]["exact"] and got["g"]["n_nonnull"] == 100
    assert got["id+g"]["exact"] and got["id+g"]["n_distinct"] == 100
    assert got["id"]["is_key"] and got["id"]["exact"]


def test_single_pass_plan_and_guards(spark):
    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError):
        key_discovery(df, [])
    with pytest.raises(ValueError):
        key_discovery(df, [["id"], []])
    with pytest.raises(ValueError):
        key_discovery(df, [["missing"]])
    with pytest.raises(ValueError):
        key_discovery(df, [["id"], ["id"]])
    # one aggregation pass: Spark rewrites multi-countDistinct through
    # a single Expand — never one scan per candidate
    from pyspark.sql import functions as F
    qe = (df.agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("id").alias("d1"),
                 F.countDistinct("id", "g").alias("d2"))
          ._jdf.queryExecution().executedPlan().toString())
    assert qe.count("Scan ExistingRDD") == 1, qe
    assert "Expand" in qe, qe
