"""Checkpoint-resume semantics (SURVEY.md §5.2.4): kill after k batches,
re-run with the same run_id, verify no bucket validated twice and the final
violations equal an uninterrupted run. Cross-bucket duplicates must be
caught by the dedicated global phase."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.clips_suite import PUBLIC_COLUMNS, clips_schema
from pandasschema_spark.runner import ValidationRunner
from pandasschema_spark.sources import datagen as G
from pandasschema_spark.sources.warehouse import Warehouse

N = 4000
BUCKETS = 16
SEED = 42


@pytest.fixture(scope="module")
def wh_root(spark):
    root = tempfile.mkdtemp(prefix="pss_wh_")
    G.write_clips(spark, Warehouse(root).path("clips"), N, SEED,
                  with_audio=False, partitions=8, bucket_count=BUCKETS)
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _schema(spark):
    # audio-free variant keeps the test fast; distinct + referential + row-local
    return clips_schema(G.codec_dim(spark), seed=SEED, with_pcm_checks=False)


def _collect_violations(runner, spark):
    return sorted(
        (r["row"], r["column"], r["message"])
        for r in runner.violations(spark).collect()
    )


def test_uninterrupted_run(spark, wh_root):
    wh = Warehouse(wh_root)
    runner = ValidationRunner(wh, "run_full", batch_buckets=6)
    summary = runner.run(spark, _schema(spark), validate_columns=PUBLIC_COLUMNS)
    assert summary["buckets_validated"] == BUCKETS
    assert summary["global_phase_ran"]

    v = _collect_violations(runner, spark)
    exp = G.expected_violations(N)
    # cross-bucket duplicate clip_ids (i vs i-1 land in different buckets)
    # are caught by the global phase
    dup_rows = sorted(r for (r, c, m) in v if "not unique" in m)
    assert dup_rows == exp[0]
    sr_rows = sorted(r for (r, c, m) in v if c == "sr_hz")
    assert sr_rows == exp[1]

    # manifest: one 'ok' entry set per bucket + the global marker
    m = runner.manifest(spark)
    per_bucket = {r["bucket"] for r in m.select("bucket").distinct().collect()}
    assert per_bucket == set(range(BUCKETS)) | {ValidationRunner.GLOBAL_BUCKET}
    # rows_seen totals the table
    rows_seen = (
        m.where(F.col("bucket") >= 0).select("bucket", "rows_seen").distinct()
        .agg(F.sum("rows_seen")).collect()[0][0]
    )
    assert rows_seen == N


def test_kill_and_resume_identical(spark, wh_root):
    wh = Warehouse(wh_root)
    schema = _schema(spark)

    crashed = ValidationRunner(wh, "run_resume", batch_buckets=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        crashed.run(spark, schema, validate_columns=PUBLIC_COLUMNS, fail_after_batches=2)

    # partial progress recorded: exactly 2 batches x 4 buckets
    done_after_crash = crashed.completed_buckets(spark)
    assert len(done_after_crash) == 8

    resumed = ValidationRunner(wh, "run_resume", batch_buckets=4)
    summary = resumed.run(spark, schema, validate_columns=PUBLIC_COLUMNS)
    assert summary["buckets_skipped_resume"] == 8
    assert summary["buckets_validated"] == 8  # no bucket validated twice

    # manifest: each bucket committed exactly once
    m = resumed.manifest(spark)
    counts = (
        m.where(F.col("bucket") >= 0)
        .groupBy("bucket").agg(F.countDistinct("finished_at").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in counts)

    # final violations identical to the uninterrupted run
    full = ValidationRunner(wh, "run_full")
    assert _collect_violations(resumed, spark) == _collect_violations(full, spark)


def test_compact_small_files(spark, tmp_path_factory):
    """Compaction must collapse an append-fragmented table to the
    size-targeted file count without changing its contents."""
    from pandasschema_spark.sources.warehouse import Warehouse

    wh = Warehouse(str(tmp_path_factory.mktemp("compact")))
    df = spark.range(0, 10000).selectExpr("id", "id * 2 AS x")
    for i in range(8):  # fragmented appends: 8 chunks x 4 partitions
        df.where(F.col("id") % 8 == i).repartition(4).write.mode(
            "append").parquet(wh.path("t"))
    before = {r["id"]: r["x"] for r in spark.read.parquet(wh.path("t")).collect()}
    res = wh.compact(spark, "t", target_mb=256)
    assert res["files_before"] >= 32
    assert res["files_after"] == 1  # tiny table -> one right-sized file
    after = {r["id"]: r["x"] for r in spark.read.parquet(wh.path("t")).collect()}
    assert after == before


def test_compact_crash_recovery(spark, tmp_path_factory):
    """A crash between compact()'s two renames leaves the table in
    .old__; the next compact() must restore it before rewriting."""
    from pandasschema_spark.sources.warehouse import Warehouse

    wh = Warehouse(str(tmp_path_factory.mktemp("compact_crash")))
    df = spark.range(0, 1000).selectExpr("id", "id * 3 AS x")
    df.repartition(6).write.parquet(wh.path("t"))
    before = {r["id"]: r["x"] for r in spark.read.parquet(wh.path("t")).collect()}
    # simulate the crash window: table renamed away, second rename lost
    os.rename(wh.path("t"), wh.path("t") + ".old__")
    assert not os.path.exists(wh.path("t"))
    res = wh.compact(spark, "t", target_mb=256)
    after = {r["id"]: r["x"] for r in spark.read.parquet(wh.path("t")).collect()}
    assert after == before
    assert res["files_after"] == 1


def test_compact_partitioned_respects_target(spark, tmp_path_factory):
    """With partition_by, compaction must still split data into multiple
    files per partition value when the byte target demands it (a plain
    repartition-by-columns would emit one file per value)."""
    from pandasschema_spark.sources.warehouse import Warehouse

    wh = Warehouse(str(tmp_path_factory.mktemp("compact_part")))
    df = spark.range(0, 20000).selectExpr(
        "id", "CAST(id % 2 AS INT) AS p", "repeat('x', 200) AS pad")
    for i in range(4):
        df.where(F.col("id") % 4 == i).repartition(4).write.mode(
            "append").partitionBy("p").parquet(wh.path("t"))
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(wh.path("t")) for f in fs if f.endswith(".parquet"))
    # fractional-MB target that forces ~6 output files across 2 values
    res = wh.compact(spark, "t", target_mb=total / 6 / (1024 * 1024),
                     partition_by=["p"])
    import collections

    per_value = collections.Counter()
    for r, _d, fs in os.walk(wh.path("t")):
        for f in fs:
            if f.endswith(".parquet"):
                per_value["p=1" in r] += 1
    assert res["files_after"] >= 4
    # the actual guard: EACH partition value split into >1 file
    assert set(per_value) == {True, False} and min(per_value.values()) > 1, per_value
    after = spark.read.parquet(wh.path("t"))
    assert after.count() == 20000


def test_append_schema_guard(spark, tmp_path_factory):
    """Appending a mismatched-schema frame must refuse up front —
    a silent mixed-schema table is a read-time landmine."""
    import pytest

    from pandasschema_spark.sources.warehouse import Warehouse

    wh = Warehouse(str(tmp_path_factory.mktemp("append_guard")))
    a = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    wh.write(a, "t")
    wh.append(a, "t")  # same schema: fine
    assert wh.read(spark, "t").count() == 20
    bad_type = spark.range(0, 5).selectExpr("id AS k", "id AS v")
    with pytest.raises(ValueError, match="schema mismatch"):
        wh.append(bad_type, "t")
    bad_col = spark.range(0, 5).selectExpr("id AS k", "CAST(id AS STRING) AS w")
    with pytest.raises(ValueError, match="schema mismatch"):
        wh.append(bad_col, "t")


def test_ordered_schema_split_keeps_positions(spark, wh_root):
    """split_schema on an ordered=True schema must keep EVERY column's
    positional slot — dropping check-free columns shifts later checks
    onto the wrong DataFrame columns (silent wrong results)."""
    from pandasschema_spark.column import Column
    from pandasschema_spark.schema import Schema
    from pandasschema_spark.validation import (
        IsDistinctValidation, MatchesPatternValidation)

    sch = Schema([
        Column("clip_id", [IsDistinctValidation()]),
        Column("transcript", [MatchesPatternValidation(r"^x-never-matches$")]),
    ], ordered=True)
    local, glob = ValidationRunner.split_schema(sch)
    assert [c.name for c in local.columns] == ["clip_id", "transcript"]
    assert [c.name for c in glob.columns] == ["clip_id", "transcript"]
    assert not local.columns[0].validations          # placeholder slot
    assert glob.columns[0].validations and not glob.columns[1].validations
    # end-to-end: the regex check must run against TRANSCRIPT (df col 2
    # when pairing a 2-col frame positionally), not clip_id
    df = spark.createDataFrame(
        [("c1", "hello"), ("c2", "world")],
        "clip_id string, transcript string").withColumn(
            "row_ord", F.monotonically_increasing_id())
    res = local.validate(df.select("clip_id", "transcript", "row_ord"),
                         columns=["clip_id", "transcript"], row_key="row_ord")
    cols = {r["column"] for r in res.violations.collect()}
    assert cols == {"transcript"}


def test_runner_surfaces_frame_warnings(spark, wh_root, tmp_path):
    """A schema column missing from the table must not report a green
    run: the precheck warning lands in the violations table (phase
    'frame') and in the summary."""
    from pandasschema_spark.column import Column
    from pandasschema_spark.schema import Schema
    from pandasschema_spark.validation import MatchesPatternValidation

    sch = Schema([Column("no_such_column", [MatchesPatternValidation("x")])])
    runner = ValidationRunner(Warehouse(wh_root), "fw1", input_table="clips")
    summary = runner.run(spark, sch, validate_columns=["no_such_column"])
    assert summary["frame_warnings"] == 1
    fw = (runner.violations(spark)
          .where(F.col("phase") == "frame").collect())
    assert len(fw) == 1 and "not in the data frame" in fw[0]["message"]
    # and the phase marker never inflates the data-bucket counts on rerun
    summary2 = ValidationRunner(Warehouse(wh_root), "fw1",
                                input_table="clips").run(
        spark, sch, validate_columns=["no_such_column"])
    assert summary2["buckets_total"] == summary["buckets_total"]
