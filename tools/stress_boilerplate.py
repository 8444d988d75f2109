"""Scale-stress the round-5 corpus operators on a synthetic 1M-doc
corpus: boilerplate_scan (line-frequency template filter) and
windowed_duplicate_ids (freshness dedup) — both shapes whose scale
claims (digest-only shuffles, broadcast dictionary, single lag
exchange) deserve a measured number, not just a plan dump.

Usage: python tools/stress_boilerplate.py [n_docs] [cpus]
Prints one JSON line; paste the numbers into SCALE.md's measured
evidence section.
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = (SparkSession.builder.master("local[{}]".format(cpus))
             .config("spark.sql.shuffle.partitions", str(2 * cpus))
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pandasschema_spark.operators.dedup import windowed_duplicate_ids
    from pandasschema_spark.operators.text import boilerplate_scan

    # ~6 lines/doc: two corpus-wide templates (always boilerplate), a
    # %997-keyed semi-template (df ~ 1003 at 1M — just over the 1000
    # threshold; the dictionary stays ~997 entries), three unique lines.
    i = F.col("id")
    text = F.concat(
        F.lit("subscribe to our newsletter\n"),
        F.lit("all rights reserved worldwide\n"),
        F.lit("campaign "), (i % 997).cast("string"), F.lit("\n"),
        F.lit("body alpha "), i.cast("string"), F.lit("\n"),
        F.lit("body beta "), (i * 31).cast("string"), F.lit("\n"),
        F.lit("body gamma "), (i * 17 + 5).cast("string"))
    docs = spark.range(n_docs).select("id", text.alias("text"))
    docs.count()  # materialize the range plan / warm the JVM

    t0 = time.time()
    bp = boilerplate_scan(docs, "text", "id", min_doc_freq=1000)
    n_rows = bp.count()
    flagged = bp.where(F.col("n_boiler") != 3).count()
    bp_sec = round(time.time() - t0, 2)

    # freshness dedup: every 5th doc re-crawls 7 ids later (in-window),
    # every 10th re-crawls 10k later (expired)
    base = docs.select((i * 1000).alias("id"), "text")
    fresh = docs.where(i % 5 == 0).select((i * 1000 + 7).alias("id"), "text")
    stale = docs.where(i % 10 == 0).select(
        (i * 1000 + 10_000).alias("id"), "text")
    corpus = base.unionByName(fresh).unionByName(stale)
    t0 = time.time()
    dup = windowed_duplicate_ids(corpus, "text", "id", window=50)
    n_dups = dup.count()
    win_sec = round(time.time() - t0, 2)

    expect_dups = sum(1 for k in range(0, n_docs, 5))
    assert n_rows == n_docs, (n_rows, n_docs)
    assert flagged == 0, flagged  # every doc: 3 boiler lines of 6
    assert n_dups == expect_dups, (n_dups, expect_dups)

    print(json.dumps({
        "n_docs": n_docs, "cpus": cpus,
        "boilerplate_sec": bp_sec,
        "boilerplate_docs_per_sec": round(n_docs / bp_sec, 1),
        "windowed_dedup_sec": win_sec,
        "windowed_dedup_rows_per_sec": round(n_docs * 1.3 / win_sec, 1),
        "windowed_dups_found": n_dups,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
