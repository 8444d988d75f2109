"""Checkpoint-resumable validation runner with per-partition lineage.

north_rule requirements covered here: "resumable from checkpoint with
per-partition lineage + metrics", "per-partition pass/fail", "AQE-driven
partition coalescing" (AQE conf set by ensure_session in bench/entry).

Unit of lineage = the warehouse's `bucket` partition column (written by
sources.datagen.write_clips; an Iceberg deployment would use its partition
values). A run processes buckets in batches:

    for each batch of pending buckets:
        read input WHERE bucket IN (...)           <- partition pruning
        validate (clips constraint suite)
        overwrite-violations partitions for batch  <- idempotent on retry
        append manifest rows (bucket x check metrics, status='ok')

Manifest append happens only AFTER the violations write commits, so a kill
anywhere leaves either (no manifest row, replayable partial output that the
retry's dynamic-partition overwrite replaces) or (manifest row, committed
output). resume = anti-join of bucket list against the manifest — no bucket
is validated twice, and the final violations equal an uninterrupted run
(tested in tests/test_resume.py).

Manifest schema (FIXTURES.md §C3): run_id, bucket, rows_seen, check_id,
fail_count, status, finished_at.
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .schema import Schema
from .sources.warehouse import Warehouse

MANIFEST_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("rows_seen", T.LongType(), False),
    T.StructField("check_id", T.StringType(), False),
    T.StructField("fail_count", T.LongType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("finished_at", T.TimestampType(), False),
])

VIOLATIONS_TABLE = "violations"
MANIFEST_TABLE = "manifest"


class ValidationRunner:
    def __init__(
        self,
        warehouse: Warehouse,
        run_id: str,
        *,
        input_table: str = "clips",
        batch_buckets: int = 8,
    ):
        self.wh = warehouse
        self.run_id = run_id
        self.input_table = input_table
        self.batch_buckets = batch_buckets

    # -- lineage ------------------------------------------------------------
    def completed_buckets(self, spark: SparkSession) -> typing.Set[int]:
        if not self.wh.exists(MANIFEST_TABLE):
            return set()
        m = self.wh.read(spark, MANIFEST_TABLE)
        rows = (
            m.where((F.col("run_id") == self.run_id) & (F.col("status") == "ok"))
            .select("bucket").distinct().collect()
        )
        return {r["bucket"] for r in rows}

    def all_buckets(self, spark: SparkSession) -> typing.List[int]:
        # partition listing — metadata-only on Parquet dirs and on Iceberg
        rows = (
            self.wh.read(spark, self.input_table)
            .select("bucket").distinct().collect()
        )
        return sorted(r["bucket"] for r in rows)

    # -- the run ------------------------------------------------------------
    GLOBAL_BUCKET = -1  # manifest lineage marker for the global phase

    @staticmethod
    def split_schema(schema: Schema):
        """(row-local schema, global schema). Distinctness/referential are
        properties of the WHOLE table — they cannot be checkpointed per
        bucket without auxiliary state, so they run as one dedicated phase
        whose lineage unit is the phase itself (manifest bucket = -1)."""
        from .column import Column as _Col

        local_cols, global_cols = [], []
        for c in schema.columns:
            loc = [v for v in c.validations if not getattr(v, "is_global", False)]
            glo = [v for v in c.validations if getattr(v, "is_global", False)]
            if schema.ordered:
                # ordered pairing is POSITIONAL (Schema.validate zips
                # df columns against schema columns): every column must
                # keep its slot in both sub-schemas — dropping the
                # check-free ones would shift later checks onto the
                # wrong DataFrame columns. Empty-validation placeholders
                # produce no checks and cost nothing.
                local_cols.append(_Col(c.name, loc, c.allow_empty))
                global_cols.append(_Col(c.name, glo, c.allow_empty))
            else:
                if loc:
                    local_cols.append(_Col(c.name, loc, c.allow_empty))
                if glo:
                    global_cols.append(_Col(c.name, glo, c.allow_empty))
        has_local = any(c.validations for c in local_cols)
        has_global = any(c.validations for c in global_cols)
        return (
            Schema(local_cols, schema.ordered) if has_local else None,
            Schema(global_cols, schema.ordered) if has_global else None,
        )

    def run(
        self,
        spark: SparkSession,
        schema: Schema,
        *,
        validate_columns: typing.List[str],
        row_key: str = "row_ord",
        fail_after_batches: int = None,  # test hook: simulate a crash
    ) -> dict:
        """Validate all pending buckets; returns run summary."""
        local_schema, global_schema = self.split_schema(schema)
        # frame-level precheck (schema-vs-frame drift: missing columns,
        # dtype warnings): these depend only on (schema, table schema),
        # not on data, and Schema.validate SKIPS checks for columns it
        # warned about — discarding them would let a renamed/dropped
        # column report a green run with the column never validated.
        # Written once per run under the FRAME_BUCKET marker (idempotent
        # overwrite) and surfaced in the summary.
        frame_warnings = self._write_frame_warnings(
            spark, schema, validate_columns, row_key)
        done_all = self.completed_buckets(spark)
        # the GLOBAL_BUCKET manifest marker is a PHASE, not a data
        # bucket — counting it would inflate buckets_total /
        # buckets_skipped_resume by one after the global phase commits
        done = [b for b in done_all if b != self.GLOBAL_BUCKET]
        todo = [b for b in self.all_buckets(spark) if b not in done]
        batches = [
            todo[i : i + self.batch_buckets] for i in range(0, len(todo), self.batch_buckets)
        ]
        n_batches = 0
        for batch in batches:
            if fail_after_batches is not None and n_batches >= fail_after_batches:
                raise RuntimeError("injected failure after {} batches".format(n_batches))
            if local_schema is not None:
                self._run_batch(spark, local_schema, batch, validate_columns, row_key)
            n_batches += 1
        global_ran = False
        if global_schema is not None and self.GLOBAL_BUCKET not in done_all:
            if fail_after_batches is not None and n_batches >= fail_after_batches:
                raise RuntimeError("injected failure before global phase")
            self._run_global(spark, global_schema, validate_columns, row_key)
            global_ran = True
        return {
            "run_id": self.run_id,
            "buckets_total": len(todo) + len(done),
            "buckets_skipped_resume": len(done),
            "buckets_validated": len(todo),
            "batches": n_batches,
            "global_phase_ran": global_ran,
            "frame_warnings": frame_warnings,
        }

    FRAME_BUCKET = -2  # violations-table marker for frame-level warnings

    def _write_frame_warnings(self, spark, schema, validate_columns, row_key):
        """Run the compile-time precheck against the table schema and
        persist any frame warnings as row=-1 violation rows (phase
        'frame', bucket FRAME_BUCKET — overwritten idempotently on
        resume). Returns the warning count."""
        src = self.wh.read(spark, self.input_table)
        names = {c.name for c in schema.columns}
        cols = [c for c in validate_columns if c in names]
        result = schema.validate(src.limit(0), columns=cols, row_key=row_key)
        warns = result.frame_warnings
        if not warns:
            return 0
        rows = [(self.run_id, "frame", -1, w.column, None, w.message,
                 "__frame__", -1, self.FRAME_BUCKET) for w in warns]
        fw = spark.createDataFrame(
            rows,
            "run_id string, phase string, row long, column string, "
            "value string, message string, check_id string, seq int, "
            "bucket int")
        self.wh.overwrite_partitions(
            fw, VIOLATIONS_TABLE, partition_by=["run_id", "phase", "bucket"])
        return len(warns)

    def _run_global(self, spark, global_schema, validate_columns, row_key):
        """One pass over the whole table for shuffle-requiring checks
        (salted uniqueness agg, broadcast referential anti-join)."""
        src = self.wh.read(spark, self.input_table)
        cols = [c for c in validate_columns if c in {x.name for x in global_schema.columns}]
        result = global_schema.validate(src, columns=cols, row_key=row_key)
        keyed = src.select(F.col(row_key).cast("long").alias("row"), "bucket")
        violations = (
            result.violations.join(keyed, "row", "left")
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("phase", F.lit("global"))
            .persist()
        )
        try:
            self.wh.overwrite_partitions(
                violations.select(
                    "run_id", "phase", "row", "column", "value", "message", "check_id", "seq", "bucket"
                ),
                VIOLATIONS_TABLE,
                partition_by=["run_id", "phase", "bucket"],
            )
            fail_total = violations.count()
            manifest = spark.createDataFrame(
                [(self.run_id, self.GLOBAL_BUCKET, 0, "__global__", fail_total, "ok")],
                "run_id string, bucket int, rows_seen long, check_id string, fail_count long, status string",
            ).withColumn("finished_at", F.current_timestamp())
            self.wh.append(manifest, MANIFEST_TABLE)
        finally:
            violations.unpersist()

    def _run_batch(self, spark, schema, buckets, validate_columns, row_key):
        src = (
            self.wh.read(spark, self.input_table)
            .where(F.col("bucket").isin([int(b) for b in buckets]))  # partition pruning
        )
        cols = [c for c in validate_columns if c in {x.name for x in schema.columns}]
        result = schema.validate(src, columns=cols, row_key=row_key)
        # attach lineage: map violation rows back to their bucket via the
        # source (exact and format-agnostic; no assumption that bucket is a
        # function of the row key)
        keyed = src.select(F.col(row_key).cast("long").alias("row"), "bucket")
        violations = (
            result.violations.join(keyed, "row", "left")
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("phase", F.lit("local"))
        )
        # cache: violations feed both the sink write and the metrics agg
        violations = violations.persist()
        try:
            self.wh.overwrite_partitions(
                violations.select(
                    "run_id", "phase", "row", "column", "value", "message", "check_id", "seq", "bucket"
                ),
                VIOLATIONS_TABLE,
                partition_by=["run_id", "phase", "bucket"],
            )
            # per-partition metrics: rows_seen per bucket (+ fail counts per check)
            rows_seen = src.groupBy("bucket").agg(F.count(F.lit(1)).alias("rows_seen"))
            fails = violations.groupBy("bucket", "check_id").agg(
                F.count(F.lit(1)).alias("fail_count")
            )
            all_buckets_df = spark.createDataFrame(
                [(int(b),) for b in buckets], T.StructType([T.StructField("bucket", T.IntegerType(), False)])
            )
            manifest = (
                all_buckets_df.join(rows_seen, "bucket", "left")
                .join(fails, "bucket", "left")
                .select(
                    F.lit(self.run_id).alias("run_id"),
                    F.col("bucket").cast("int"),
                    F.coalesce("rows_seen", F.lit(0)).cast("long").alias("rows_seen"),
                    F.coalesce("check_id", F.lit("__all__")).alias("check_id"),
                    F.coalesce("fail_count", F.lit(0)).cast("long").alias("fail_count"),
                    F.lit("ok").alias("status"),
                    F.current_timestamp().alias("finished_at"),
                )
            )
            # manifest append is the commit point for these buckets
            self.wh.append(manifest, MANIFEST_TABLE)
        finally:
            violations.unpersist()

    # -- results ------------------------------------------------------------
    def violations(self, spark: SparkSession) -> DataFrame:
        return self.wh.read(spark, VIOLATIONS_TABLE).where(F.col("run_id") == self.run_id)

    def manifest(self, spark: SparkSession) -> DataFrame:
        return self.wh.read(spark, MANIFEST_TABLE).where(F.col("run_id") == self.run_id)
