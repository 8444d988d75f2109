"""Referential-integrity check as a broadcast LEFT ANTI join.

Engine extension (the reference has no joins — SURVEY.md §2.4); this powers
the north star's "referential checks against a codec dimension table".
Null foreign keys fail (pandas ``isin`` semantics: null is never in the
list), which LEFT ANTI gives for free since ``null = x`` never matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.compiler import value_repr


def referential_violations(
    df: DataFrame,
    value_col: str,
    row_col: str,
    dim_df: DataFrame,
    dim_col: str,
    *,
    warn_col: str,
    message: str,
    check_id: str,
    seq: int,
    broadcast: bool = True,
    allow_empty: bool = False,
) -> DataFrame:
    from ..validation import is_numeric_spark_type

    spark_type = df.schema[value_col].dataType
    dim = dim_df.select(F.col(dim_col).alias("__dimv__")).distinct()
    if broadcast:
        dim = F.broadcast(dim)
    base = df.select(F.col(value_col).alias("__v__"), F.col(row_col).cast("long").alias("__r__"))
    miss = base.join(dim, base["__v__"] == F.col("__dimv__"), "left_anti")
    v = F.col("__v__")
    if allow_empty:
        if is_numeric_spark_type(spark_type):
            miss = miss.where(v.isNotNull())
        else:
            miss = miss.where(v.isNotNull() & (F.length(v.cast("string")) > 0))
    return miss.select(
        F.col("__r__").alias("row"),
        F.lit(warn_col).alias("column"),
        value_repr(v, spark_type).alias("value"),
        F.lit(message).alias("message"),
        F.lit(check_id).alias("check_id"),
        F.lit(seq).cast("int").alias("seq"),
    )
