"""Ingestion sources with stable row ordinals.

The reference's canonical flow is ``pd.read_csv`` -> ``Schema.validate``
with the warning ``row`` equal to the CSV row ordinal
(/root/reference/example/example.py:14, README.rst:42-46). Spark has no
implicit row order, so these readers materialize a read-order ordinal at
ingest (plans/rowindex.py: two narrow scans + an O(partitions) driver
aggregation — no shuffle) and the schema validates with
``row_key=<ordinal column>``.

Determinism note: the ordinal follows Spark's scan order — stable for a
fixed file set (files in listing order, rows in file order) which is
exactly the reference's CSV semantics; appending files appends ordinals.
For tables with a natural key, pass that as ``row_key`` instead and skip
the ordinal scan entirely (the 10^12-row path — clip_id ordinals in the
audio warehouse are assigned at generation, never re-derived).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.rowindex import with_row_index

ORDINAL_COL = "row_ord"


def read_csv_with_ordinal(spark: SparkSession, path: str, *,
                          header: bool = True, ordinal_col: str = ORDINAL_COL,
                          infer_schema: bool = False, **options) -> DataFrame:
    """CSV -> DataFrame with a read-order ordinal column. All columns stay
    strings by default (``infer_schema=False``): the reference validates
    CSV cells by their string repr (nulls render 'nan'), and string-in /
    string-out keeps warning values byte-compatible."""
    reader = spark.read.options(header=header, inferSchema=infer_schema, **options)
    return with_row_index(reader.csv(path), ordinal_col)


def read_jsonl_with_ordinal(spark: SparkSession, path: str, *,
                            ordinal_col: str = ORDINAL_COL,
                            **options) -> DataFrame:
    """JSON-lines -> DataFrame with a read-order ordinal column."""
    return with_row_index(spark.read.options(**options).json(path), ordinal_col)
