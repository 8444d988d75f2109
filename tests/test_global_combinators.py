"""Combinators over global checks (~IsDistinct, IsDistinct | row-local):
reference semantics are series-WIDE, so the schema compiler must route the
whole combinator through the whole-table plan — a per-Arrow-batch pandas
UDF would give batch-boundary-dependent answers. Set algebra under test:
fail(~v) = complement, fail(a|b) = intersection, fail(a&b) = union."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandasschema_spark.column import Column
from pandasschema_spark.errors import PanSchArgumentError
from pandasschema_spark.schema import Schema
from pandasschema_spark.validation import (
    ConditionalValidation,
    InRangeValidation,
    InTableValidation,
    IsDistinctValidation,
)


def _df(spark):
    rows = [(0, "a", 5), (1, "a", 50), (2, "b", 5), (3, "c", 50), (4, "a", 5)]
    return spark.createDataFrame(rows, "row_ord long, k string, v long")


def _rows(schema, df):
    res = schema.validate(df, columns=[c.name for c in schema.columns],
                          row_key="row_ord")
    return sorted(r["row"] for r in res.violations.collect())


def test_is_global_propagates():
    d = IsDistinctValidation()
    assert (~d).is_global
    assert (d | InRangeValidation(0, 10)).is_global
    assert (InRangeValidation(0, 10) & d).is_global
    assert not (~InRangeValidation(0, 10)).is_global


def test_inverse_of_distinct_is_complement(spark):
    df = _df(spark)
    # fail(IsDistinct) = non-first duplicates of k = rows 1, 4
    assert _rows(Schema([Column("k", [IsDistinctValidation()])]), df) == [1, 4]
    # fail(~IsDistinct) = everything else (firsts + uniques)
    assert _rows(Schema([Column("k", [~IsDistinctValidation()])]), df) == [0, 2, 3]
    # pandas-reference parity of the same composition
    s = pd.Series(["a", "a", "b", "c", "a"])
    ref_fail = sorted((~(~IsDistinctValidation()).pandas_validate(s))
                      .pipe(lambda m: list(m[m].index)))
    assert ref_fail == [0, 2, 3]


def test_or_is_intersection_and_is_union(spark):
    df = _df(spark)
    dist = IsDistinctValidation()          # fails rows 1, 4 (on k)
    # a row-local leaf on the SAME column: k must be 'a' -> fails 2, 3
    from pandasschema_spark.validation import InListValidation

    in_a = InListValidation(["a"])
    # OR: fail where BOTH fail -> {1,4} & {2,3} = {}
    assert _rows(Schema([Column("k", [dist | in_a])]), df) == []
    # AND: fail where EITHER fails -> union {1,2,3,4}
    assert _rows(Schema([Column("k", [IsDistinctValidation() & InListValidation(["a"])])]),
                 df) == [1, 2, 3, 4]
    # message/metadata shape: one warning per failing row, combined message
    res = Schema([Column("k", [IsDistinctValidation() & InListValidation(["a"])])]).validate(
        df, columns=["k"], row_key="row_ord")
    r0 = res.violations.orderBy("row").first()
    assert "not unique" in r0["message"] and "legal options" in r0["message"]


def test_inverse_of_intable(spark):
    df = _df(spark)
    dim = spark.createDataFrame([("a",), ("b",)], "code string")
    # fail(InTable) = k not in dim = row 3 ('c')
    assert _rows(Schema([Column("k", [InTableValidation(dim, "code")])]), df) == [3]
    # fail(~InTable) = rows present in dim
    assert _rows(Schema([Column("k", [~InTableValidation(dim, "code")])]), df) == [0, 1, 2, 4]


def test_conditional_refuses_global_then(spark):
    with pytest.raises(PanSchArgumentError, match="row-local"):
        ConditionalValidation(
            ["k", "v"], lambda d: F.col("v") > 0,
            IsDistinctValidation(), "k")
    with pytest.raises(PanSchArgumentError, match="row-local"):
        ConditionalValidation(
            ["k", "v"], lambda d: F.col("v") > 0,
            ~IsDistinctValidation(), "k")
