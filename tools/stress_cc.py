"""Connected-components scale stress: millions of edges with long chains.

Evidence for SCALE.md's O(log n) claim: a chain-heavy graph (worst case
for naive label propagation, whose round count is the chain LENGTH) must
converge in a handful of star rounds with wall time dominated by the
edge-list shuffles, not the iteration count.

Usage: python tools/stress_cc.py [n_nodes] [chain_len] [cpus]
Prints one JSON line {edges (actual count), chain_len, seconds,
clusters} — edges = n_nodes - n_nodes//chain_len (one link dropped per
chain boundary).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[{}]".format(cpus))
        .appName("cc-stress")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandasschema_spark.operators.graph import connected_components

    # chains of length chain_len: node i links to i+1 unless it ends a chain
    edges = (
        spark.range(0, n_edges, 1, cpus * 4)
        .where((F.col("id") + 1) % chain_len != 0)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    actual_edges = n_edges - n_edges // chain_len
    t0 = time.time()
    cc = connected_components(edges, max_iter=25)
    n_clusters = cc.select("cluster_id").distinct().count()
    sec = time.time() - t0
    print(json.dumps({
        "edges": actual_edges, "nodes": n_edges, "chain_len": chain_len,
        "cpus": cpus, "seconds": round(sec, 1), "clusters": n_clusters,
        "expected_clusters": (n_edges + chain_len - 1) // chain_len,
    }))
    assert n_clusters == (n_edges + chain_len - 1) // chain_len, "wrong clustering"
    spark.stop()


if __name__ == "__main__":
    main()
