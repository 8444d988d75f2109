"""spark-submit entry point for the clips validation pipeline.

The north_rule deployment shape: the engine ships as a zip on --py-files,
this file is the driver program. Example (local smoke; on a cluster swap
--master and add the Iceberg catalog confs):

    bash tools/package.sh
    spark-submit --master local[16] \\
        --py-files dist/pandasschema_spark.zip \\
        --conf spark.sql.shuffle.partitions=32 \\
        --conf spark.sql.adaptive.enabled=true \\
        tools/submit_job.py \\
        --warehouse /tmp/clips_wh --n-clips 20000 --generate \\
        --run-id run1

Resumability: re-running with the same --run-id skips buckets already in
the manifest; kill it mid-run and rerun to see 'buckets_skipped_resume'.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--n-clips", type=int, default=20000)
    ap.add_argument("--generate", action="store_true",
                    help="(re)generate the clips table before validating")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--batch-buckets", type=int, default=8)
    ap.add_argument("--no-pcm", action="store_true", help="skip the Arrow PCM/transcript checks")
    ap.add_argument("--schema-json", default=None,
                    help="path to a declarative schema spec (serialize.py); "
                         "overrides the built-in clips suite — the "
                         "config-driven deployment shape")
    ap.add_argument("--validate-columns", default=None,
                    help="comma-separated column subset (with --schema-json)")
    ap.add_argument("--fail-after-batches", type=int, default=None,
                    help="test hook: crash after N batches to exercise resume")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("pandasschema-spark-validate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports resolve from the --py-files zip on executors AND driver
    from pandasschema_spark.clips_suite import PUBLIC_COLUMNS, clips_schema
    from pandasschema_spark.runner import ValidationRunner
    from pandasschema_spark.sources.datagen import codec_dim, write_clips
    from pandasschema_spark.sources.warehouse import Warehouse

    wh = Warehouse(args.warehouse)
    if args.generate:
        write_clips(spark, wh.path("clips"), args.n_clips, bucket_count=args.buckets)

    if args.schema_json:
        from pandasschema_spark.serialize import schema_from_json

        with open(args.schema_json) as fh:
            schema = schema_from_json(fh.read(), spark)
        columns = (args.validate_columns.split(",") if args.validate_columns
                   else [c.name for c in schema.columns])
    else:
        schema = clips_schema(codec_dim(spark), with_pcm_checks=not args.no_pcm)
        columns = PUBLIC_COLUMNS
    runner = ValidationRunner(wh, args.run_id, batch_buckets=args.batch_buckets)
    summary = runner.run(
        spark, schema, validate_columns=columns, row_key="row_ord",
        fail_after_batches=args.fail_after_batches,
    )
    summary["violations_total"] = runner.violations(spark).count()
    summary["manifest_rows"] = runner.manifest(spark).count()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
