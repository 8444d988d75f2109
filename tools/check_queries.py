"""Local mirror of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same sf dir, compare row multisets (columns sorted by name,
values stringified). Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("check_queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')".format(
                t=t, d=sf_dir
            )
        )
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print("FAIL  {:24s} spark error: {}".format(name, str(ex)[:300]))
            failures.append(name)
            continue
        finally:
            # free any operator-attached persists (dedup gram indexes,
            # split()'s violating-key set, ...) — this harness runs all
            # queries in ONE long-lived session
            from pandasschema_spark.operators.dedup import release_cached

            release_cached(locals().get("sdf"))
        spark_t = time.time() - t0
        if name not in oracles:
            print("OK?   {:24s} rows={} ({:.1f}s) [rows-only: no oracle]".format(
                name, len(srows), spark_t))
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print("FAIL  {:24s} duckdb error: {}".format(name, str(ex)[:300]))
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print("FAIL  {:24s} schema mismatch spark={} duckdb={}".format(name, scols, ocols))
            failures.append(name)
            continue
        a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
        if a == b:
            print("PASS  {:24s} rows={} ({:.1f}s)".format(name, len(a), spark_t))
        else:
            failures.append(name)
            only_a = [r for r in a if r not in set(b)][:3]
            only_b = [r for r in b if r not in set(a)][:3]
            print("FAIL  {:24s} rows spark={} duckdb={}".format(name, len(a), len(b)))
            for r in only_a:
                print("        spark-only : {}".format(r)[:220])
            for r in only_b:
                print("        duckdb-only: {}".format(r)[:220])
    print("\n{} failures".format(len(failures)), failures if failures else "")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
