"""Entity-resolution scale stress: millions of dirty names end-to-end.

Evidence for SCALE.md's claims about operators/entity.py: blocking keeps
the candidate join linear-ish (md5-stem names spread over ~n distinct
blocks, so per-block squares stay tiny), the bounded levenshtein verify
never leaves codegen, and the closure + full assignment finish in edge
time, not all-pairs time. The corpus is the gate's construction scaled
up: n base stems, a deletion variant per id%3==0, a substitution per
id%5==0 (both in-block, distance 1), a prepend per id%11==0 (block
moved, must stay a singleton).

Usage: python tools/stress_entity.py [n_base] [cpus]
Prints one JSON line {rows, linked, seconds, ...}; asserts the planted
expectations: linked rows == n_m1 + n_m2, everything else self-resolved.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[{}]".format(cpus))
        .appName("entity-stress")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandasschema_spark.operators.entity import resolve_entities

    base = spark.range(0, n_base, 1, cpus * 4).select(
        F.col("id"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 16).alias("name"),
    )
    m1 = base.where(F.col("id") % 3 == 0).select(
        (F.col("id") + 2_000_000_000).alias("id"),
        F.expr("concat(substring(name, 1, cast(8 + id % 6 as int)),"
               "       substring(name, cast(10 + id % 6 as int)))").alias("name"),
    )
    m2 = base.where(F.col("id") % 5 == 0).select(
        (F.col("id") + 4_000_000_000).alias("id"),
        F.expr("concat(substring(name, 1, cast(8 + id % 4 as int)), 'z',"
               "       substring(name, cast(10 + id % 4 as int)))").alias("name"),
    )
    m3 = base.where(F.col("id") % 11 == 0).select(
        (F.col("id") + 6_000_000_000).alias("id"),
        F.concat(F.lit("z"), F.col("name")).alias("name"),
    )
    corpus = base.unionByName(m1).unionByName(m2).unionByName(m3)

    n_m1 = (n_base + 2) // 3
    n_m2 = (n_base + 4) // 5
    n_m3 = (n_base + 10) // 11
    n_rows = n_base + n_m1 + n_m2 + n_m3

    t0 = time.time()
    out = resolve_entities(corpus, "name", "id")
    linked = out.where(F.col("entity_id") != F.col("id")).count()
    total = out.count()
    sec = time.time() - t0
    print(json.dumps({
        "rows": total, "base": n_base, "variants": n_m1 + n_m2 + n_m3,
        "cpus": cpus, "seconds": round(sec, 1), "linked": linked,
        "expected_linked": n_m1 + n_m2,
    }))
    # every in-block variant links to its base (min id of the cluster);
    # bases and out-of-block prepends self-resolve. A single accidental
    # md5-stem collision within 2 edits would break these equalities —
    # that's the point: the stress doubles as a large-scale correctness
    # check of blocking + verify + closure + assignment.
    assert total == n_rows, (total, n_rows)
    assert linked == n_m1 + n_m2, (linked, n_m1 + n_m2)
    spark.stop()


if __name__ == "__main__":
    main()
