"""join_fanout pre-flight explosion audit + contract_audit data
contracts: exactness vs the joins/aggregates they model, the full
status matrix, and the argument guards."""

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.colstats import (
    ColumnContract,
    contract_audit,
)
from pandasschema_spark.operators.joins import join_fanout


def test_join_fanout_predicts_exact_join_cardinality(spark):
    left = spark.createDataFrame(
        [(k, i) for k in ("a", "a", "a", "b", "c") for i in range(2)]
        + [(None, 9)], "k string, i long")
    right = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("d", 4), (None, 5)],
        "k string, v long")
    got = {r["k"]: (r["n_left"], r["n_right"], r["pairs"])
           for r in join_fanout(left, right, "k", min_pairs=1).collect()}
    # a: 6x2=12, b: 2x1=2; c/d one-sided, NULL never joins
    assert got == {"a": (6, 2, 12), "b": (2, 1, 2)}
    # sum(pairs) == the real inner-join row count
    assert sum(p for _, _, p in got.values()) == \
        left.join(right, "k").count()


def test_join_fanout_min_pairs_and_top_k(spark):
    df = spark.createDataFrame(
        [(k,) for k, n in [("x", 5), ("y", 3), ("z", 1)] for _ in range(n)],
        "k string")
    out = join_fanout(df, df, "k", min_pairs=2).collect()
    assert {r["k"]: r["pairs"] for r in out} == {"x": 25, "y": 9}
    top = join_fanout(df, df, "k", min_pairs=1, top_k=2).collect()
    assert [r["k"] for r in top] == ["x", "y"]  # pairs desc


def test_contract_audit_status_matrix(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("b", 1, None), ("c", 1, "x"), (None, 1, "y")],
        "many string, one int, holey string")
    out = {r["column"]: r for r in contract_audit(df, [
        ColumnContract("many", min_distinct=1, max_distinct=2,
                       max_null_ppm=1_000_000),      # 3 distinct > 2
        ColumnContract("one", min_distinct=2),        # 1 distinct < 2
        ColumnContract("holey", max_null_ppm=100_000),  # 2/4 null
    ]).collect()}
    assert out["many"]["status"] == "too_many_distinct"
    assert (out["many"]["n_rows"], out["many"]["n_distinct"],
            out["many"]["n_null"]) == (4, 3, 1)
    assert out["one"]["status"] == "too_few_distinct"
    assert out["holey"]["status"] == "too_many_nulls"
    assert out["holey"]["null_ppm"] == 500_000


def test_contract_audit_combined_violations_and_ok(spark):
    df = spark.createDataFrame(
        [(None,), (None,), (None,), ("v",)], "c string")
    row = contract_audit(df, [
        ColumnContract("c", min_distinct=2, max_null_ppm=0)]).collect()[0]
    assert row["status"] == "too_few_distinct,too_many_nulls"
    ok = contract_audit(df, [ColumnContract("c")]).collect()[0]
    assert ok["status"] == "ok"


def test_contract_audit_guards(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError):
        contract_audit(df, [])
    with pytest.raises(ValueError):
        contract_audit(df, [ColumnContract("nope")])
