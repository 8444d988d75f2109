"""Sketch-operator scale stress: the per-partition bottom-k fold.

Evidence for SCALE.md's KMV claims after the round-6 fix: the
mapInPandas pre-reduce folds bottom-k ACROSS Arrow batches and yields
once per partition, so the exchange (and the single rank task behind
it) sees O(partitions x k) rows, never O(batches x k). With the Arrow
batch size forced down to 2,000 rows, a 20M-row column is ~10,000
batches: per-batch yields would rank ~10M rows through one task, the
fold ranks <= partitions x k.

The run asserts exactness where it is guaranteed (n < k columns report
exact counts; estimator within 4 sigma of truth otherwise) and reports
the reduced-frame row count actually shuffled (the fold invariant,
measured not claimed).

Usage: python tools/stress_sketch.py [n_rows] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = 1024
    spark = (
        SparkSession.builder.master("local[{}]".format(cpus))
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandasschema_spark.operators.sketch import kmv_distinct

    parts = cpus * 4
    true_distinct = n // 20
    df = spark.range(0, n, 1, parts).select(
        (F.col("id") % true_distinct).cast("string").alias("hi_card"),
        (F.col("id") % 97).cast("string").alias("lo_card"),
    )
    df = df.persist()
    df.count()

    t0 = time.time()
    out = {r["column"]: r for r in
           kmv_distinct(df, ["hi_card", "lo_card"], k=k).collect()}
    kmv_s = round(time.time() - t0, 2)

    lo = out["lo_card"]
    assert lo["est_distinct"] == 97, lo  # n < k: EXACT by construction
    hi = out["hi_card"]
    # Broder bound: stderr ~ true/sqrt(k-1); assert within 4 sigma
    sigma = true_distinct / (k - 1) ** 0.5
    err = abs(hi["est_distinct"] - true_distinct)
    assert err < 4 * sigma, (hi["est_distinct"], true_distinct, sigma)

    # the fold invariant, measured: the reduced pre-rank frame must be
    # O(partitions x cols x k), nowhere near O(batches x k)
    from pandasschema_spark.operators.sketch import _bottomk_reduce

    pairs = df.select(
        F.explode(F.array(
            F.struct(F.lit("hi_card").alias("column"),
                     F.substring(F.md5(F.col("hi_card").cast("binary")), 1, 16).alias("h")),
            F.struct(F.lit("lo_card").alias("column"),
                     F.substring(F.md5(F.col("lo_card").cast("binary")), 1, 16).alias("h")),
        )).alias("v")).select("v.column", "v.h")
    reduced_rows = pairs.mapInPandas(
        _bottomk_reduce(k, group_col="column"), schema="column string, h string").count()
    bound = parts * 2 * k
    assert reduced_rows <= bound, (reduced_rows, bound)

    df.unpersist()
    spark.stop()
    print(json.dumps({
        "rows": n,
        "cpus": cpus,
        "k": k,
        "kmv_two_cols_sec": kmv_s,
        "rows_per_sec": int(n / kmv_s),
        "est_hi": int(hi["est_distinct"]),
        "true_hi": true_distinct,
        "reduced_rows_shuffled": int(reduced_rows),
        "reduced_bound_parts_x_cols_x_k": bound,
        "arrow_batch": 2000,
        "n_batches_approx": n // 2000,
    }))


if __name__ == "__main__":
    main()
