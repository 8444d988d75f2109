"""Differential fuzzing against the ACTUAL reference package.

/root/reference is importable under pandas 2.2, so the strongest parity
oracle is to run it side-by-side: random frames x random schemas ->
reference warning list vs our collect_warnings(), compared as
(row, column, message, value-str) multisets.

Frames are CSV-shaped (homogeneous columns; missing = NaN/None), matching
the reference's primary ingestion path, where str(nan) == 'nan' equals our
NULL_VALUE_REPR rendering.
"""

import random
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

sys.path.insert(0, "/root/reference")

ref = pytest.importorskip("pandas_schema")

# the reference's ordered=True path calls df.iteritems(), removed in
# pandas 2.x — restore it as the alias it always was so the reference's
# own code runs unmodified under the modern pandas in this container
if not hasattr(pd.DataFrame, "iteritems"):
    pd.DataFrame.iteritems = pd.DataFrame.items

from pandas_schema import Column as RefColumn  # noqa: E402
from pandas_schema import Schema as RefSchema  # noqa: E402
from pandas_schema import validation as RV  # noqa: E402

from pandasschema_spark import Column, Schema  # noqa: E402
from pandasschema_spark import validation as OV  # noqa: E402

WORDS = ["alpha", "beta", "7", "8.5", "seven", "", " pad", "pad ", "nan", "x.txt",
         "20240101", "99999999", "1e3", "-4", "0"]


def _mk_checks(rng):
    """A random subset of row-local checks, built for BOTH engines."""
    pool = [
        (lambda: RV.InRangeValidation(0, 10), lambda: OV.InRangeValidation(0, 10)),
        (lambda: RV.MatchesPatternValidation(r"^\d+$"), lambda: OV.MatchesPatternValidation(r"^\d+$")),
        (lambda: RV.MatchesPatternValidation("a"), lambda: OV.MatchesPatternValidation("a")),
        (lambda: RV.TrailingWhitespaceValidation(), lambda: OV.TrailingWhitespaceValidation()),
        (lambda: RV.LeadingWhitespaceValidation(), lambda: OV.LeadingWhitespaceValidation()),
        (lambda: RV.CanConvertValidation(int), lambda: OV.CanConvertValidation(int)),
        (lambda: RV.DateFormatValidation("%Y%m%d"), lambda: OV.DateFormatValidation("%Y%m%d")),
        (lambda: RV.InListValidation(["alpha", "7", ""]), lambda: OV.InListValidation(["alpha", "7", ""])),
        (lambda: RV.IsDistinctValidation(), lambda: OV.IsDistinctValidation()),
        (lambda: ~RV.MatchesPatternValidation("a"), lambda: ~OV.MatchesPatternValidation("a")),
        (lambda: RV.MatchesPatternValidation("a") | RV.MatchesPatternValidation(r"^\d"),
         lambda: OV.MatchesPatternValidation("a") | OV.MatchesPatternValidation(r"^\d")),
        (lambda: RV.MatchesPatternValidation("a") & RV.MatchesPatternValidation("x"),
         lambda: OV.MatchesPatternValidation("a") & OV.MatchesPatternValidation("x")),
        # combinators over the GLOBAL check: the reference evaluates
        # them series-wide in pandas; our engine must produce the same
        # warning set through the whole-table fail-row set algebra
        (lambda: ~RV.IsDistinctValidation(), lambda: ~OV.IsDistinctValidation()),
        (lambda: RV.IsDistinctValidation() | RV.MatchesPatternValidation("a"),
         lambda: OV.IsDistinctValidation() | OV.MatchesPatternValidation("a")),
        (lambda: RV.IsDistinctValidation() & RV.MatchesPatternValidation("a"),
         lambda: OV.IsDistinctValidation() & OV.MatchesPatternValidation("a")),
    ]
    n = rng.randint(1, 3)
    picks = [pool[rng.randrange(len(pool))] for _ in range(n)]
    return [p[0]() for p in picks], [p[1]() for p in picks]


def _string_frame(rng, n_rows, n_cols):
    # missing = np.nan, NOT None: pd.read_csv (the reference's ingestion
    # path) produces NaN, whose astype(str) is 'nan' — matching our
    # NULL_VALUE_REPR for Spark NULL. Python None (astype(str) -> 'None')
    # only arises in hand-built frames and has no parquet equivalent.
    data = {}
    for c in range(n_cols):
        data["c{}".format(c)] = [
            (np.nan if rng.random() < 0.15 else WORDS[rng.randrange(len(WORDS))])
            for _ in range(n_rows)
        ]
    return pd.DataFrame(data)


def _numeric_frame(rng, n_rows, n_cols):
    data = {}
    for c in range(n_cols):
        data["c{}".format(c)] = [
            (np.nan if rng.random() < 0.15 else rng.choice([0.0, 1.5, 7.0, 9.99, 10.0, -3.25, 270.0]))
            for _ in range(n_rows)
        ]
    return pd.DataFrame(data)


def _ref_warnings(pdf, ref_cols):
    out = []
    for w in RefSchema(ref_cols).validate(pdf):
        v = w.value
        vs = "nan" if v is None or (isinstance(v, float) and np.isnan(v)) else str(v)
        out.append((w.row, w.column, vs, w.message))
    return sorted(out)


def _our_warnings(spark, pdf, our_cols, numeric):
    stype = T.DoubleType() if numeric else T.StringType()
    fields = [T.StructField("row_idx", T.LongType())] + [
        T.StructField(c, stype) for c in pdf.columns
    ]
    rows = []
    for i, r in pdf.iterrows():
        vals = [None if (v is None or (isinstance(v, float) and np.isnan(v))) else v for v in r]
        rows.append((i, *vals))
    df = spark.createDataFrame(rows, T.StructType(fields))
    res = Schema(our_cols).validate(df, columns=list(pdf.columns), row_key="row_idx")
    got = []
    for w in res.collect_warnings():
        got.append((w.row, w.column, str(w.value), w.message))
    return sorted(got)


@pytest.mark.parametrize("trial", range(10))
def test_differential_schema_pairing(spark, trial):
    """Schema-level dispatch parity: ordered pairing, subset validation,
    missing columns, column-count precheck — random frames through BOTH
    engines' full Schema.validate, warning strings compared."""
    rng = random.Random(7000 + trial)
    n_rows = rng.randint(1, 8)
    pdf = _string_frame(rng, n_rows, 3)
    ordered = rng.random() < 0.4
    # schema over 3 names, sometimes mismatched vs frame columns
    schema_names = ["c0", "c1", "c2"]
    if not ordered and rng.random() < 0.3:
        schema_names[rng.randrange(3)] = "ghost"  # missing-column warning path
    ref_cols, our_cols = [], []
    for name in schema_names:
        rcs, ocs = _mk_checks(rng)
        ref_cols.append(RefColumn(name, rcs))
        our_cols.append(Column(name, ocs))
    subset = None
    if not ordered and rng.random() < 0.4:
        subset = sorted(rng.sample(schema_names, rng.randint(1, 3)))

    ref_schema = RefSchema(ref_cols, ordered=ordered)
    expected = sorted(str(w) for w in ref_schema.validate(pdf, columns=subset))

    from pyspark.sql import types as T
    fields = [T.StructField(c, T.StringType()) for c in pdf.columns]
    rows = []
    for _, r in pdf.iterrows():
        rows.append(tuple(None if (isinstance(v, float) and np.isnan(v)) else v for v in r))
    df = spark.createDataFrame(rows, T.StructType(fields))
    ours = Schema(our_cols, ordered=ordered)
    # row_key=None -> engine materializes the read-order ordinal, matching
    # pandas' integer index; the frame must carry EXACTLY the reference's
    # columns so the column-count precheck semantics agree
    res = ours.validate(df, columns=subset, row_key=None)
    got = sorted(str(w) for w in res.collect_warnings())
    assert got == expected, "trial={} ordered={} subset={}\n{}".format(trial, ordered, subset, pdf)


@pytest.mark.parametrize("trial", range(30))
def test_differential_vs_reference(spark, trial):
    rng = random.Random(1000 + trial)
    numeric = rng.random() < 0.35
    n_rows, n_cols = rng.randint(1, 12), rng.randint(1, 3)
    pdf = (_numeric_frame if numeric else _string_frame)(rng, n_rows, n_cols)
    if numeric:
        # checks meaningful on doubles
        mk = [
            (lambda: RV.InRangeValidation(0, 10), lambda: OV.InRangeValidation(0, 10)),
            (lambda: RV.IsDistinctValidation(), lambda: OV.IsDistinctValidation()),
            (lambda: RV.CanConvertValidation(int), lambda: OV.CanConvertValidation(int)),
        ]
        picks = [mk[rng.randrange(len(mk))] for _ in range(rng.randint(1, 2))]
        ref_checks = [[p[0]()] for p in picks]
        our_checks = [[p[1]()] for p in picks]
        cols = list(pdf.columns)[: len(picks)]
        ref_cols = [RefColumn(c, ref_checks[i], allow_empty=bool(rng.random() < 0.4))
                    for i, c in enumerate(cols)]
        our_cols = [Column(c, our_checks[i], allow_empty=ref_cols[i].allow_empty)
                    for i, c in enumerate(cols)]
        pdf = pdf[cols]
    else:
        ref_cols, our_cols = [], []
        for c in pdf.columns:
            rcs, ocs = _mk_checks(rng)
            allow_empty = rng.random() < 0.4
            ref_cols.append(RefColumn(c, rcs, allow_empty=allow_empty))
            our_cols.append(Column(c, ocs, allow_empty=allow_empty))
    expected = _ref_warnings(pdf, ref_cols)
    got = _our_warnings(spark, pdf, our_cols, numeric)
    assert got == expected, "trial={} frame=\n{}".format(trial, pdf)
