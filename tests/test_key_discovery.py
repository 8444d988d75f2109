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
