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

import typing

from pyspark.sql import DataFrame, functions as F

_PART_SHIFT = 8589934592  # 2^33, monotonically_increasing_id's partition stride

ROW_IDX_COL = "__row_idx__"


def offsets_from_counts(counts, *, overflow_ctx: str):
    """pid -> running-sum offset table from a collected
    groupBy(pid).count() — the shared machinery behind with_row_index
    and operators/rank.global_ordinal (one rule, one place). Raises
    when any partition holds >= 2^33 rows: monotonically_increasing_id's
    per-partition counter would overflow into the next pid's id space
    and silently corrupt ordinals."""
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid__"]):
        if row["__cnt__"] >= _PART_SHIFT:
            raise ValueError(
                "{}: partition {} holds {} rows >= 2^33 — "
                "monotonically_increasing_id would overflow into the "
                "next partition's id space; raise the partition count"
                .format(overflow_ctx, row["__pid__"], row["__cnt__"]))
        offsets[row["__pid__"]] = acc
        acc += row["__cnt__"]
    return offsets


def offset_case_expr(offsets, pid, *, ctx: str):
    """Literal CASE chain pid -> offset with a fail-loud otherwise: a
    pid unseen during the counting pass means the source repartitioned
    between the two jobs — silent NULL ordinals otherwise."""
    expr = None
    for p, off in offsets.items():
        cond = (pid == F.lit(p))
        expr = F.when(cond, F.lit(off)) if expr is None else expr.when(cond, F.lit(off))
    return expr.otherwise(F.raise_error(F.concat(
        F.lit("{}: partition id ".format(ctx)), pid.cast("string"),
        F.lit(" appeared after the counting pass — the source's "
              "partitioning is unstable; re-run or pass an explicit "
              "row_key"))))


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
    offsets = offsets_from_counts(counts, overflow_ctx="with_row_index")
    if not offsets:
        return tagged.withColumn(name, F.lit(0).cast("long")).drop("__mid__")
    # inline the offset table as a literal CASE chain (one entry per input
    # partition — bounded by the scan's partition count, fine to inline);
    # the otherwise() branch fails LOUD on a pid unseen during the
    # counting pass (the id column re-evaluates in a separate job)
    expr = offset_case_expr(offsets, pid, ctx="with_row_index")
    intra = F.col("__mid__") % F.lit(_PART_SHIFT)
    return tagged.withColumn(name, (expr + intra).cast("long")).drop("__mid__")


def with_file_ordered_row_index(df: DataFrame, name: str = ROW_IDX_COL) -> DataFrame:
    """Append a 0-based row ordinal ordered by (file path ascending,
    position within file) — the order ``sorted(glob)`` + ``pd.concat``
    would give, which is what a reference user ingesting a multi-file
    CSV directory expects.

    ``with_row_index`` follows Spark's SCAN order, and Spark sorts file
    splits by size DESCENDING for bin-packing — a directory of unequal
    CSV part files gets its ordinals assigned largest-file-first
    (empirically verified; tests/test_ingest.py). This variant re-keys
    each scan chunk by its source file: one O(chunks) driver
    aggregation of (partition, file) -> (count, first id). Within one
    file, chunk order follows monotonically_increasing_id order, which
    matches byte-offset order because Spark's length sort is stable and
    a file's equal-size splits enter it consecutively. Same scale shape
    as with_row_index: two narrow scans, no data shuffle; the per-row
    ``input_file_name()`` string is confined to the ordinal scan."""
    mid = F.monotonically_increasing_id()
    tagged = (df.withColumn("__mid__", mid)
                .withColumn("__fname__", F.input_file_name()))
    pid = F.shiftright(F.col("__mid__"), 33)
    chunks = (
        tagged.groupBy(pid.alias("__pid__"), F.col("__fname__"))
        .agg(F.count(F.lit(1)).alias("__cnt__"),
             F.min("__mid__").alias("__min_mid__"))
        .collect()
    )
    if not chunks:
        return (tagged.withColumn(name, F.lit(0).cast("long"))
                .drop("__mid__", "__fname__"))
    # The delta arithmetic below is only valid if each (partition, file)
    # chunk's mids are CONTIGUOUS and the chunks tile each partition
    # exactly: sorted by min_mid within a pid, the first chunk must start
    # at pid<<33 and each next chunk at prev.min + prev.cnt. Spark's
    # default split packing guarantees this (a file's equal-size splits
    # enter the stable length sort consecutively), but tuned
    # maxPartitionBytes/openCostInBytes confs can co-pack two
    # non-adjacent splits of one file into a partition, where the groupBy
    # would silently merge them into one chunk and emit corrupt
    # ordinals. The driver already holds (pid, cnt, min_mid) — verify
    # the tiling and refuse loudly instead.
    by_pid: typing.Dict[int, typing.List] = {}
    for row in chunks:
        by_pid.setdefault(row["__pid__"], []).append(row)
    for p, rows in by_pid.items():
        expect = p << 33
        for row in sorted(rows, key=lambda r: r["__min_mid__"]):
            if row["__min_mid__"] != expect:
                raise RuntimeError(
                    "with_file_ordered_row_index: non-contiguous scan chunk "
                    "in partition {} (file {!r} starts at mid {}, expected "
                    "{}); the source's split packing interleaves files "
                    "within a partition — re-ingest with default "
                    "spark.sql.files.* confs or use a persisted natural "
                    "row key instead".format(
                        p, row["__fname__"], row["__min_mid__"], expect))
            expect = row["__min_mid__"] + row["__cnt__"]
    # per-chunk delta so that ordinal = delta + mid
    deltas: typing.Dict[int, typing.List[typing.Tuple[str, int]]] = {}
    acc = 0
    for row in sorted(chunks, key=lambda r: (r["__fname__"], r["__min_mid__"])):
        deltas.setdefault(row["__pid__"], []).append(
            (row["__fname__"], acc - row["__min_mid__"]))
        acc += row["__cnt__"]
    # nested dispatch: OUTER on pid (one integer compare per partition),
    # INNER on fname only among that partition's few packed files — a
    # flat (pid, fname) chain would run O(total chunks) per-row STRING
    # compares in the output scan
    expr = None
    for p, files in deltas.items():
        if len(files) == 1:
            inner = F.lit(files[0][1])
        else:
            inner = None
            for fname, delta in files:
                c = F.col("__fname__") == F.lit(fname)
                inner = (F.when(c, F.lit(delta)) if inner is None
                         else inner.when(c, F.lit(delta)))
        cond = pid == F.lit(p)
        expr = F.when(cond, inner) if expr is None else expr.when(cond, inner)
    return (tagged.withColumn(name, (expr + F.col("__mid__")).cast("long"))
            .drop("__mid__", "__fname__"))
