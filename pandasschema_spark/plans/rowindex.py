"""Stable row-ordinal materialization.

The reference identifies failing cells by the pandas index label
(/root/reference/pandas_schema/validation.py:98-108) — for CSV frames the
0-based row ordinal. Spark has no implicit row order, so we materialize an
explicit ordinal: ``monotonically_increasing_id`` encodes
``(partition_id << 33) + intra_partition_counter`` with the counter
contiguous from 0 within each partition, so a single tiny per-partition
count aggregation yields exact global offsets.

Scale note: this costs one extra scan, so at warehouse scale the ordinal
(or better, a natural row key such as ``clip_id``) is persisted once at
ingest and ``Schema.validate(df, row_key=...)`` is used instead; this
helper exists for reference-parity tests and ad-hoc frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PART_SHIFT = 8589934592  # 2^33, monotonically_increasing_id's partition stride

ROW_IDX_COL = "__row_idx__"


def with_row_index(df: DataFrame, name: str = ROW_IDX_COL) -> DataFrame:
    """Append a 0-based, read-order row ordinal column without a global sort.

    Two narrow scans + one O(num_partitions) driver aggregation; no shuffle
    of the data itself.
    """
    mid = F.monotonically_increasing_id()
    tagged = df.withColumn("__mid__", mid)
    # bit shift, not division: double division rounds above 2^53, which a
    # partition id beyond ~2^20 would reach (mid = pid << 33 | counter)
    pid = F.shiftright(F.col("__mid__"), 33)
    counts = (
        tagged.groupBy(pid.alias("__pid__"))
        .agg(F.count(F.lit(1)).alias("__cnt__"))
        .collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid__"]):
        offsets[row["__pid__"]] = acc
        acc += row["__cnt__"]
    if not offsets:
        return tagged.withColumn(name, F.lit(0).cast("long")).drop("__mid__")
    # inline the offset table as a literal CASE chain (one entry per input
    # partition — bounded by the scan's partition count, fine to inline)
    expr = None
    for p, off in offsets.items():
        cond = (pid == F.lit(p))
        expr = F.when(cond, F.lit(off)) if expr is None else expr.when(cond, F.lit(off))
    intra = F.col("__mid__") % F.lit(_PART_SHIFT)
    return tagged.withColumn(name, (expr + intra).cast("long")).drop("__mid__")
