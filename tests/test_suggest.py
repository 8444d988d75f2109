"""suggest_rules: validation-rule mining (operators/suggest.py)."""

import pytest

from pandasschema_spark.operators.suggest import suggest_rules


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            ("a", "2026-01-01", "12", 5, None),
            ("b", "2026-01-02", "7", -3, 2.5),
            ("a", "2026-12-31", "003", 9, 9.5),
        ],
        "cat string, d string, digits string, n int, x double",
    )


def _got(df, rules):
    return {(r["column"], r["check"]): r["param"] for r in rules.collect()}


def test_suggestions(frame):
    got = _got(frame, suggest_rules(frame, ["cat", "d", "digits", "n", "x"]))
    assert got[("cat", "inlist")] == "a, b"
    assert got[("cat", "notnull")] == ""
    assert got[("d", "dateformat")] == "%Y-%m-%d"
    assert ("d", "matches_int") not in got
    assert got[("digits", "matches_int")] == r"^[+-]?[0-9]+$"
    assert got[("n", "inrange")] == "[-3, 9]"
    assert got[("n", "notnull")] == ""
    # x has a NULL: no notnull, range over non-nulls
    assert ("x", "notnull") not in got
    assert got[("x", "inrange")] == "[2.5, 9.5]"


def test_inlist_cap(spark):
    df = spark.createDataFrame([(str(i),) for i in range(50)], "v string")
    got = _got(df, suggest_rules(df, ["v"], max_inlist=20))
    assert ("v", "inlist") not in got
    got2 = _got(df, suggest_rules(df, ["v"], max_inlist=50))
    assert ("v", "inlist") in got2 and len(got2[("v", "inlist")].split(", ")) == 50


def test_all_null_column_suggests_nothing(spark):
    df = spark.createDataFrame([(None,), (None,)], "v string")
    assert suggest_rules(df, ["v"]).count() == 0


def test_empty_frame(spark):
    df = spark.createDataFrame([], "v string, n int")
    assert suggest_rules(df, ["v", "n"]).count() == 0


def test_suggestions_validate_clean(spark, frame):
    # promoting the mined rules must yield ZERO violations on the data
    # that mined them (the definition of "evidenced by the data")
    from pandasschema_spark import Column, Schema
    from pandasschema_spark.validation import (
        DateFormatValidation, InListValidation, InRangeValidation,
        MatchesPatternValidation)

    schema = Schema([
        Column("cat", [InListValidation(["a", "b"])]),
        Column("d", [DateFormatValidation("%Y-%m-%d")]),
        Column("digits", [MatchesPatternValidation(r"^[+-]?[0-9]+$")]),
        Column("n", [InRangeValidation(-3, 10)]),
    ])
    res = schema.validate(frame.withColumn("row", (frame["n"] * 0)),
                          columns=["cat", "d", "digits", "n"], row_key="row")
    assert res.violations.count() == 0


def test_guards(frame):
    with pytest.raises(ValueError):
        suggest_rules(frame, [])
    with pytest.raises(ValueError):
        suggest_rules(frame, ["nope"])
