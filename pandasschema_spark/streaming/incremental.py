"""Incremental (Structured Streaming) validation.

The reference is strictly batch (SURVEY.md §2.4: no streaming anywhere),
and the north_rule's resumability is checkpoint-batch (runner.py). This
module adds the streaming ingestion path a production warehouse needs:
validate clip files AS THEY ARRIVE, with exactly-once violation output.

Design:
- source: file stream over the warehouse directory (new parquet files =
  new data; Iceberg's streaming read slots in behind the same DataFrame).
- row-local checks run INSIDE foreachBatch by reusing Schema.validate —
  the whole compiled one-scan plan applies unchanged to each micro-batch.
- exactly-once: violations are written partitioned by batch_id with
  dynamic-partition overwrite, so a replayed micro-batch (failure between
  sink write and checkpoint commit) overwrites its own partition instead
  of duplicating — idempotence without a transactional sink.
- global checks (cross-row uniqueness, referential vs a dim snapshot):
  uniqueness is windowed WITHIN the stream's state horizon — exact global
  keep-first over an unbounded stream needs unbounded state, so the
  streaming layer checks within-batch duplicates and defers the global
  pass to the batch runner (the honest scale trade-off, stated here
  rather than hidden).
- drift monitoring: watermarked event-time windowed histograms
  (streaming_histogram) feed the same numpy chi-square/KS stats as batch.
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import Schema
from ..sources.warehouse import Warehouse

STREAM_VIOLATIONS_TABLE = "stream_violations"
STREAM_METRICS_TABLE = "stream_metrics"


def stream_validate(
    spark: SparkSession,
    schema: Schema,
    source_dir: str,
    source_schema,
    warehouse: Warehouse,
    checkpoint_dir: str,
    *,
    validate_columns: typing.List[str],
    row_key: str = "row_ord",
    trigger_available_now: bool = True,
    max_files_per_trigger: int = None,
):
    """Start (and with available-now trigger, run to completion) the
    incremental validation stream. Returns the StreamingQuery."""
    from ..runner import ValidationRunner

    local_schema, _global = ValidationRunner.split_schema(schema)
    if local_schema is None:
        raise ValueError("no row-local checks in schema; nothing to stream")

    reader = (
        spark.readStream.schema(source_schema)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    cols = [c for c in validate_columns if c in {x.name for x in local_schema.columns}]

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        res = local_schema.validate(batch_df, columns=cols, row_key=row_key)
        violations = (
            res.violations
            .withColumn("batch_id", F.lit(int(batch_id)))
            .persist()
        )
        try:
            # idempotent on replay: a re-run of batch N replaces partition N
            warehouse.overwrite_partitions(
                violations.select("batch_id", "row", "column", "value", "message", "check_id", "seq"),
                STREAM_VIOLATIONS_TABLE,
                partition_by=["batch_id"],
            )
            rows_seen = batch_df.count()
            fails = violations.count()
            metrics = spark.createDataFrame(
                [(int(batch_id), rows_seen, fails)],
                "batch_id long, rows_seen long, fail_count long",
            ).withColumn("finished_at", F.current_timestamp())
            warehouse.overwrite_partitions(metrics, STREAM_METRICS_TABLE, partition_by=["batch_id"])
        finally:
            violations.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def within_batch_duplicates(batch_df: DataFrame, value_col: str, row_col: str) -> DataFrame:
    """Streaming-scope uniqueness: non-first duplicates WITHIN the batch
    (the global pass stays in the batch runner — exact keep-first over an
    unbounded stream would need unbounded state)."""
    from ..operators.distinct import distinct_violations

    return distinct_violations(
        batch_df, value_col, row_col,
        warn_col=value_col, message="contains values that are not unique (within batch)",
        check_id="stream:{}".format(value_col), seq=0,
    )


def streaming_histogram(
    stream: DataFrame,
    value_col: str,
    ts_col: str,
    *,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked event-time windowed category histogram — the streaming
    leg of the drift checks. Late rows beyond the watermark are dropped
    (bounded state); the emitted (window, value, cnt) rows feed the same
    numpy chi-square / KS statistics as the batch histograms."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(value_col).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def streaming_session_stats(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap sessionization via the native ``session_window``
    stateful aggregation: per (user, merged-window) one row of
    (session_id = min event id, n_events, start/end). Watermark bounds
    the state — a session finalizes (and emits, in append mode) once the
    watermark passes its window end, so state is O(open sessions), not
    O(history).

    Boundary semantics vs the batch operator (operators/sessions.py):
    session_window merges events with gap strictly LESS than ``gap``
    while the batch operator keeps equal-gap events together (diff >
    gap breaks). Identical on any data without microsecond-exact
    gap-width spacing; tests/test_streaming.py asserts batch parity on
    finalized sessions."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"),
                 F.col(user_col))
        .agg(F.min(id_col).alias("session_id"),
             F.count(F.lit(1)).alias("n_events"),
             F.min(ts_col).alias("start_ts"),
             F.max(ts_col).alias("end_ts"))
    )


def streaming_rate_limit(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "10 minutes",
    max_events: int = 1,
) -> DataFrame:
    """Streaming counterpart of operators/sessions.rate_limit_violations:
    per-(user, tumbling window) event counts over ``max_events``, via the
    native windowed stateful aggregation. The watermark bounds state to
    open windows and (append mode) finalizes a window's verdict once it
    can no longer change — the continuous form of the batch bot check.
    Epoch-aligned tumbling windows match the batch operator's
    ``us div window_us`` bucketing exactly, so finalized violations
    equal the batch result on the same data (pytest parity)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"),
                 F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") > max_events)
        .select(user_col, F.col("win.start").alias("window_start"),
                "n_events")
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    id_cols: typing.Sequence[str],
    ts_col: str,
    *,
    delay: str = "10 minutes",
) -> DataFrame:
    """Bounded-state streaming deduplication: drop records whose
    ``id_cols`` key was already seen within the watermark horizon —
    the production answer to at-least-once ingest (retried producers,
    replayed partitions) where exact global dedup would need unbounded
    state.

    Thin, documented wrapper over ``dropDuplicatesWithinWatermark``:
    state holds one entry per key seen in the last ``delay`` of event
    time and is evicted by the watermark, so memory is bounded by the
    key arrival RATE, not the stream's lifetime — at 10^12 events/day
    with a 10-minute horizon that is ~10^7 in-flight keys per shard,
    not 10^12. The guarantee is asymmetric and stated plainly:
    duplicates closer together than ``delay`` (the at-least-once retry
    window) are ALWAYS dropped; duplicates farther apart MAY both
    survive — the downstream batch keep-first pass (operators/
    distinct.py) remains the exactness reconciler, same division of
    labor as streaming_duplicate_violations.

    The first-arrival row is kept (matching keep-first by arrival);
    output is append-mode safe."""
    if not id_cols:
        raise ValueError("id_cols must be non-empty")
    return (stream.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(list(id_cols)))


def streaming_cms_sketch(
    stream: DataFrame, col: str, *, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Streaming count-min sketch: the same md5-chunk counters as the
    batch :func:`..operators.sketch.cms_sketch`, maintained incrementally
    — state is the (r, b) counter grid, bounded at depth x width forever,
    which is the entire point of sketching a stream (an exact frequency
    table grows with the key space; the sketch never does). Because the
    counters are pure additions over deterministic hashes, the streaming
    result after any prefix equals the batch sketch of the same prefix
    (pytest-locked parity), and sketches from different streams/days
    still merge by addition downstream."""
    from ..operators.sketch import cms_sketch as _batch

    # the batch builder's projection is already incremental-safe: a
    # groupBy-count over row-local hashes (no windows, no ordering), so
    # structured streaming runs the identical plan in update mode
    return _batch(stream, col, width=width, depth=depth)
