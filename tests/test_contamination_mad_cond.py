"""contamination_check, mad_outliers, head_per_group, ConditionalValidation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasschema_spark import Column, Schema
from pandasschema_spark.errors import PanSchArgumentError
from pandasschema_spark.operators.colstats import mad_outliers
from pandasschema_spark.operators.dedup import contamination_check
from pandasschema_spark.operators.sampling import head_per_group
from pandasschema_spark.serialize import (
    check_to_spec,
    conditional_check,
    schema_from_json,
    schema_to_json,
    spec_to_check,
)
from pandasschema_spark.validation import (
    ConditionalValidation,
    InListValidation,
    InRangeValidation,
)


def test_contamination_flags_overlap_only(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(10, "he said the quick brown fox jumps today"),   # shares 8-gram? no; use n=3
         (11, "completely fresh words nothing shared here at all"),
         (12, "pack my box with five dozen liquor jugs")],  # verbatim copy
        "doc_id long, text string")
    got = {r["eval_id"]: r for r in contamination_check(
        train, ev, "text", "doc_id", n=3).collect()}
    assert 12 in got and got[12]["n_shared_grams"] == got[12]["n_grams"]
    assert 10 in got and 0 < got[10]["n_shared_grams"] < got[10]["n_grams"]
    assert 11 not in got


def test_contamination_stop_shingle_cap(spark):
    # a gram present in >cap train docs is boilerplate: not contamination
    train = spark.createDataFrame(
        [(i, "common boiler plate") for i in range(5)],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(10, "common boiler plate")], "doc_id long, text string")
    assert contamination_check(train, ev, "text", "doc_id",
                               n=3, max_gram_df=3).count() == 0
    assert contamination_check(train, ev, "text", "doc_id",
                               n=3, max_gram_df=None).count() == 1


def test_mad_outliers_robust_to_planted_mass(spark):
    # 997 inliers near 100, 3 enormous outliers: mean/std would move,
    # median/MAD do not
    rows = [(i, 100 + (i % 7)) for i in range(997)]
    rows += [(9001, 10**9), (9002, -10**9), (9003, 10**12)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = sorted(r["id"] for r in mad_outliers(
        df, "v", k=5, keep_cols=["id"]).collect())
    assert got == [9001, 9002, 9003]


def test_mad_outliers_requires_integer_k(spark):
    df = spark.createDataFrame([(1, 1)], "id long, v long")
    with pytest.raises(ValueError):
        mad_outliers(df, "v", k=2.5)


def test_head_per_group_deterministic_and_k_bounded(spark):
    df = spark.createDataFrame(
        [(i, "g{}".format(i % 3)) for i in range(60)], "id long, g string")
    a = head_per_group(df, ["g"], 4, "id").collect()
    b = head_per_group(df.repartition(13), ["g"], 4, "id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per.setdefault(r["g"], []).append(r["rk"])
    assert all(sorted(v) == [1, 2, 3, 4] for v in per.values())


def test_conditional_validation_vacuous_and_binding(spark):
    df = spark.createDataFrame(
        [(1, "flac", 8000),     # binding, fails
         (2, "flac", 44100),    # binding, passes
         (3, "opus", 8000),     # not binding: vacuous pass
         (4, None, 8000)],      # NULL condition: vacuous pass
        "id long, codec string, sr long")
    check = ConditionalValidation(
        ["codec", "sr"], lambda d: d["codec"] == "flac",
        InRangeValidation(16000, 10**9), "sr",
        message="flac needs >=16k sample rate")
    res = Schema([Column("sr", [check])]).validate(
        df, columns=["sr"], row_key=F.col("id"))
    rows = res.violations.collect()
    assert [r["row"] for r in rows] == [1]
    assert rows[0]["message"] == "flac needs >=16k sample rate"


def test_conditional_validation_pandas_parity():
    check = ConditionalValidation(
        ["codec", "sr"], lambda d: d["codec"] == "flac",
        InRangeValidation(16000, 10**9), "sr",
        when_pandas_fn=lambda f: f["codec"] == "flac")
    frame = pd.DataFrame({"codec": ["flac", "flac", "opus", None],
                          "sr": [8000, 44100, 8000, 8000]})
    assert list(check.pandas_validate_frame(frame)) == [
        False, True, True, True]


def test_conditional_validation_arg_errors():
    with pytest.raises(PanSchArgumentError):
        ConditionalValidation(["a"], lambda d: d["a"] > 0,
                              InRangeValidation(0, 1), "b")   # b not listed
    with pytest.raises(PanSchArgumentError):
        ConditionalValidation(["a", "b"], lambda d: d["a"] > 0,
                              "not a validation", "b")


def test_conditional_check_serializes_round_trip():
    check = conditional_check(
        ["o_orderpriority", "o_totalprice"], "o_totalprice >= 300000.0",
        InListValidation(["1-URGENT", "2-HIGH"]), "o_orderpriority",
        message="high-value order must be urgent/high priority")
    spec = check_to_spec(check)
    assert spec["type"] == "conditional" and spec["then"]["type"] == "in_list"
    back = spec_to_check(spec)
    assert isinstance(back, ConditionalValidation)
    assert back.message == check.message
    assert back.source_when_sql == "o_totalprice >= 300000.0"
    s = Schema([Column("o_orderpriority", [check])])
    assert schema_to_json(schema_from_json(schema_to_json(s))) \
        == schema_to_json(s)


def test_conditional_lambda_not_serializable():
    check = ConditionalValidation(
        ["a", "b"], lambda d: d["a"] > 0, InRangeValidation(0, 1), "b")
    with pytest.raises(PanSchArgumentError, match="conditional"):
        check_to_spec(check)
