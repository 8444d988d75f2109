"""Check compiler: schema pairs -> ONE Spark select -> violations DataFrame.

Architectural divergence from the reference (by design): the reference runs
each check eagerly, one full Series scan per check
(/root/reference/pandas_schema/column.py:27, validation.py:85) and
materializes warnings in a per-row Python loop (validation.py:101-108). We
compile every row-local check of every column into a single ``select`` — one
scan, whole-stage-codegen'd by Catalyst, with common subexpressions (e.g.
the string cast shared by several checks on one column) deduplicated by
codegen CSE — and emit violations via an array-of-structs ``explode``:
one output row per (failing cell x failed check).

Violations schema: (row long, column string, value string, message string,
check_id string, seq int). ``seq`` is the (column-position, check-position)
global ordinal so collected warnings can reproduce the reference's stable
``sorted(errors, key=row)`` ordering (schema.py:88).
"""

from __future__ import annotations

import dataclasses
import typing

from pyspark.sql import DataFrame, functions as F, types as T

from ..validation import _SeriesValidation, is_numeric_spark_type

VIOLATION_FIELDS = [
    ("row", T.LongType()),
    ("column", T.StringType()),
    ("value", T.StringType()),
    ("message", T.StringType()),
    ("check_id", T.StringType()),
    ("seq", T.IntegerType()),
]

VIOLATION_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in VIOLATION_FIELDS])

#: rendering of a null failing value — mirrors pandas CSV semantics where a
#: missing cell is NaN and str(nan) == 'nan' (reference validation.py:103)
NULL_VALUE_REPR = "nan"


@dataclasses.dataclass
class RowCheck:
    """One compiled row-local check bound to a concrete df column."""

    seq: int
    check_id: str
    df_col: str          # data-frame column the check reads
    warn_col: str        # name carried in the warning (schema vs df name differ when ordered=True)
    message: str
    validation: _SeriesValidation
    allow_empty: bool


def empty_violations(spark) -> DataFrame:
    return spark.createDataFrame([], VIOLATION_SCHEMA)


def _empty_exemption(col, spark_type: T.DataType):
    """allow_empty semantics (reference validation.py:86-95): numeric /
    boolean columns exempt nulls; other columns exempt nulls AND
    zero-length strings (pandas .str.len() is NaN for null -> also exempt).
    Returns the NOT-exempt predicate to AND with the fail mask."""
    if is_numeric_spark_type(spark_type):
        return col.isNotNull()
    return col.isNotNull() & (F.length(col.cast("string")) > 0)


def value_repr(col, spark_type: T.DataType):
    """String rendering of the failing cell, matching str(value) in the
    reference's warning loop for the common dtypes (ints '270', floats
    '270.0', strings verbatim, nulls 'nan'). Binary payloads (audio bytes)
    render as a length summary instead of megabytes of mojibake."""
    if isinstance(spark_type, T.BinaryType):
        return F.concat(
            F.lit("<binary "), F.coalesce(F.length(col).cast("string"), F.lit("0")), F.lit(" bytes>")
        )
    return F.coalesce(col.cast("string"), F.lit(NULL_VALUE_REPR))


def build_row_violations(df: DataFrame, checks: typing.List[RowCheck], row_col: str) -> DataFrame:
    """Compile all row-local checks into one select + explode.

    The produced plan is a narrow map: scan -> project(array of
    conditional structs) -> filter(non-empty) -> explode. No shuffle.
    """
    if not checks:
        return empty_violations(df.sparkSession)

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    structs = []
    for ck in checks:
        col = df[ck.df_col]
        spark_type = dtypes[ck.df_col]
        fail = _fail_predicate(df, dtypes, ck)
        structs.append(
            F.when(
                fail,
                F.struct(
                    F.col(row_col).cast("long").alias("row"),
                    F.lit(ck.warn_col).alias("column"),
                    value_repr(col, spark_type).alias("value"),
                    F.lit(ck.message).alias("message"),
                    F.lit(ck.check_id).alias("check_id"),
                    F.lit(ck.seq).cast("int").alias("seq"),
                ),
            )
        )

    # Explode ALL k struct slots (nulls included) and filter afterwards:
    # the tempting F.filter(array, isNotNull) higher-order function is
    # CodegenFallback and forces the WHOLE projection - every check
    # expression - into interpreted mode (measured 4x slower than
    # Generate + null filter, which stays on the codegen path).
    return (
        df.select(F.explode(F.array(*structs)).alias("v"))
        .where(F.col("v").isNotNull())
        .select("v.row", "v.column", "v.value", "v.message", "v.check_id", "v.seq")
    )


def _fail_predicate(df, dtypes, ck: RowCheck):
    """The compiled FAIL predicate for one row check (shared by the
    violations explode and the bitmap projection)."""
    col = df[ck.df_col]
    spark_type = dtypes[ck.df_col]
    if getattr(ck.validation, "is_multi_column", False):
        pass_pred = ck.validation.compile_row_predicate(df)
    else:
        pass_pred = ck.validation.compile_predicate(col, spark_type)
    fail = ~pass_pred
    if ck.allow_empty:
        fail = fail & _empty_exemption(col, spark_type)
    return fail


def build_violation_bitmap(
    df: DataFrame,
    checks: typing.List[RowCheck],
    row_col: str,
    keep_clean: bool = False,
) -> DataFrame:
    """Compile all row-local checks into ONE per-row reason-code bitmap.

    Output: (row long, bitmap long, n_fail int) where bit i of ``bitmap``
    is set iff ``checks[i]`` fails on that row (bit order = schema check
    order, the same ordinal ``build_row_violations`` emits as ``seq``).
    ``n_fail`` is the population count. Rows that pass every check are
    dropped unless ``keep_clean=True`` (the unfiltered form feeds the
    failure-combination histogram: groupBy(bitmap).count()).

    Scale shape: a single narrow projection — scan -> project(int64) ->
    optional filter — zero shuffle, fully whole-stage-codegen'd. Each bit
    is a disjoint power-of-two literal so a plain SUM is a bitwise OR;
    no higher-order array functions (CodegenFallback) are used. This is
    the triage fast path for 10^12-row runs: 12 bytes/row out instead of
    one exploded struct per failing cell, and co-failure patterns fall
    out of one map-side-combined histogram.
    """
    if not checks:
        raise ValueError("violation bitmap needs at least one row-local check")
    if len(checks) > 63:
        raise ValueError(
            "violation bitmap supports at most 63 row-local checks (got {}); "
            "split the schema or use build_row_violations".format(len(checks))
        )
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    bitmap = None
    for i, ck in enumerate(checks):
        bit = F.when(_fail_predicate(df, dtypes, ck), F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bitmap = bit if bitmap is None else bitmap + bit
    out = df.select(
        F.col(row_col).cast("long").alias("row"),
        bitmap.alias("bitmap"),
        F.bit_count(bitmap).cast("int").alias("n_fail"),
    )
    if not keep_clean:
        out = out.where(F.col("bitmap") != 0)
    return out
