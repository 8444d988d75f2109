"""validate_bitmap: per-row reason-code bitmap (triage fast path).

Bit i of the bitmap = check i (schema order, == the ``seq`` ordinal of
``validate``) fails on that row; n_fail = popcount. Cross-checked against
the exploded violations frame so the two compiled forms can never drift.
"""

import pytest
from pyspark.sql import Row, functions as F

from pandasschema_spark import Column, Schema
from pandasschema_spark.errors import PanSchArgumentError
from pandasschema_spark.validation import (
    InListValidation,
    InRangeValidation,
    IsDistinctValidation,
    MatchesPatternValidation,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        Row(rid=1, qty=5, flag="A", name="ok_name"),
        Row(rid=2, qty=99, flag="A", name="ok_name"),     # bit0
        Row(rid=3, qty=5, flag="Z", name="ok_name"),      # bit1
        Row(rid=4, qty=99, flag="Z", name="??"),          # bits 0,1,2
        Row(rid=5, qty=None, flag="B", name=""),          # bit0 null fails (allow_empty=False), bit2 empty fails
    ]
    return spark.createDataFrame(rows)


def _schema():
    return Schema(
        [
            Column("qty", [InRangeValidation(1, 25)]),
            Column("flag", [InListValidation(["A", "B"])]),
            Column("name", [MatchesPatternValidation(r"^[a-z_]+$")]),
        ]
    )


def test_bitmap_values_match_expected(frame):
    got = {
        r["row"]: (r["bitmap"], r["n_fail"])
        for r in _schema().validate_bitmap(frame, columns=["qty", "flag", "name"], row_key="rid").collect()
    }
    assert got == {2: (1, 1), 3: (2, 1), 4: (7, 3), 5: (5, 2)}


def test_bitmap_agrees_with_violations_explode(frame):
    """popcount-sum over the bitmap == row count of the exploded frame,
    and per-row failing-bit sets match the violations' seq ordinals."""
    schema = _schema()
    res = schema.validate(frame, columns=["qty", "flag", "name"], row_key="rid")
    per_row = {}
    for w in res.violations.collect():
        per_row.setdefault(w["row"], set()).add(w["seq"])
    bm = schema.validate_bitmap(frame, columns=["qty", "flag", "name"], row_key="rid").collect()
    got = {r["row"]: {i for i in range(63) if r["bitmap"] >> i & 1} for r in bm}
    assert got == per_row


def test_keep_clean_emits_all_rows(frame):
    out = _schema().validate_bitmap(
        frame, columns=["qty", "flag", "name"], row_key="rid", keep_clean=True
    )
    rows = {r["row"]: r["bitmap"] for r in out.collect()}
    assert rows[1] == 0 and len(rows) == 5


def test_allow_empty_exempts_bits(spark):
    df = spark.createDataFrame([Row(rid=1, qty=None), Row(rid=2, qty=99)])
    schema = Schema([Column("qty", [InRangeValidation(1, 25)], allow_empty=True)])
    got = {r["row"]: r["bitmap"] for r in schema.validate_bitmap(df, columns=["qty"], row_key="rid").collect()}
    assert got == {2: 1}


def test_global_checks_rejected(spark):
    df = spark.createDataFrame([Row(rid=1, qty=1)])
    schema = Schema([Column("qty", [IsDistinctValidation()])])
    with pytest.raises(PanSchArgumentError, match="row-local"):
        schema.validate_bitmap(df, columns=["qty"], row_key="rid")


def test_precheck_warning_raises(spark):
    df = spark.createDataFrame([Row(rid=1, qty=1)])
    schema = Schema([Column("qty", [InRangeValidation(1, 25)]), Column("missing", [InRangeValidation(0, 1)])])
    with pytest.raises(PanSchArgumentError, match="precheck"):
        schema.validate_bitmap(df, columns=["qty", "missing"], row_key="rid")


def test_more_than_63_checks_rejected(spark):
    df = spark.createDataFrame([Row(rid=1, qty=1)])
    schema = Schema([Column("qty", [InRangeValidation(i, i + 1) for i in range(64)])])
    with pytest.raises(ValueError, match="63"):
        schema.validate_bitmap(df, columns=["qty"], row_key="rid")


def test_bitmap_plan_is_shuffle_free(frame):
    out = _schema().validate_bitmap(frame, columns=["qty", "flag", "name"], row_key="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "CodegenFallback" not in plan
