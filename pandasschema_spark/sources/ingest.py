"""Ingestion sources with stable row ordinals.

The reference's canonical flow is ``pd.read_csv`` -> ``Schema.validate``
with the warning ``row`` equal to the CSV row ordinal
(/root/reference/example/example.py:14, README.rst:42-46). Spark has no
implicit row order, so these readers materialize a read-order ordinal at
ingest (plans/rowindex.py: two narrow scans + an O(partitions) driver
aggregation — no shuffle) and the schema validates with
``row_key=<ordinal column>``.

Determinism note: the ordinal is (file path ascending, row position
within file) — the order ``sorted(glob)`` + concat gives, matching the
reference's single-CSV semantics and extending it predictably to
directories. Spark's raw scan order does NOT provide this (it sorts
splits by size descending for bin-packing), so the readers use the
file-aware ordinal (plans/rowindex.py:with_file_ordered_row_index).
Appending files that sort after the existing ones appends ordinals.
For tables with a natural key, pass that as ``row_key`` instead and skip
the ordinal scan entirely (the 10^12-row path — clip_id ordinals in the
audio warehouse are assigned at generation, never re-derived).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.rowindex import with_file_ordered_row_index

ORDINAL_COL = "row_ord"


def read_csv_with_ordinal(spark: SparkSession, path: str, *,
                          header: bool = True, ordinal_col: str = ORDINAL_COL,
                          infer_schema: bool = False, **options) -> DataFrame:
    """CSV -> DataFrame with a read-order ordinal column. All columns stay
    strings by default (``infer_schema=False``): the reference validates
    CSV cells by their string repr (nulls render 'nan'), and string-in /
    string-out keeps warning values byte-compatible."""
    reader = spark.read.options(header=header, inferSchema=infer_schema, **options)
    return with_file_ordered_row_index(reader.csv(path), ordinal_col)


def read_jsonl_with_ordinal(spark: SparkSession, path: str, *,
                            ordinal_col: str = ORDINAL_COL,
                            **options) -> DataFrame:
    """JSON-lines -> DataFrame with a read-order ordinal column."""
    return with_file_ordered_row_index(spark.read.options(**options).json(path), ordinal_col)
