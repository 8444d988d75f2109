"""oov_scan: closed-vocabulary token validation, codegen-clean."""

import pytest

from pandasschema_spark.operators.text import oov_scan

VOCAB = ["ba", "be", "ta", "c++", "u.s."]


def _run(spark, rows, **kw):
    df = spark.createDataFrame(list(enumerate(rows)), "id long, t string")
    return {r["id"]: (r["n_tokens"], r["n_oov"]) for r in
            oov_scan(df, "t", "id", VOCAB, **kw).collect()}


def test_oov_counts(spark):
    out = _run(spark, [
        "ba be ta",          # clean -> absent
        "ba XX ta yy",       # 2 oov
        "@ # !",             # all oov
        "BA BE",             # case-insensitive clean -> absent
        None,                # null -> absent
        "",                  # empty -> clean -> absent
    ])
    assert out == {1: (4, 2), 2: (3, 3)}


def test_vocab_is_literal_not_regex(spark):
    # 'c++' and 'u.s.' must match only themselves: 'c' or 'uXsX' are OOV
    out = _run(spark, ["c++ u.s.", "c us uxsx"])
    assert 0 not in out
    assert out[1] == (3, 3)


def test_keep_clean_profile(spark):
    out = _run(spark, ["ba", "zz", None], keep_clean=True)
    assert out == {0: (1, 0), 1: (1, 1)}


def test_guard_and_plan(spark):
    df = spark.createDataFrame([(1, "x")], "id long, t string")
    with pytest.raises(ValueError):
        oov_scan(df, "t", "id", [])
    plan = oov_scan(df, "t", "id", VOCAB)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrayFilter" not in plan and "lambdafunction" not in plan.lower()
