"""sequence_violations, pii_scan, winsorized_sum_by unit tests."""

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.colstats import winsorized_sum_by
from pandasschema_spark.operators.sessions import sequence_violations
from pandasschema_spark.operators.text import pii_scan


def _kinds(rows):
    out = {}
    for r in rows:
        out.setdefault(r["grp"], set()).add(r["kind"])
    return out


def test_sequence_violations_kinds(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3),            # clean
         (2, 1), (2, 3),                    # gap
         (3, 1), (3, 2), (3, 2),            # duplicate
         (4, 2), (4, 3),                    # bad_start
         (5, 1), (5, None)],                # null ordinal
        "g long, o long")
    got = _kinds(sequence_violations(df, "g", "o").collect())
    assert 1 not in got
    assert got[2] == {"gap"}
    assert got[3] == {"duplicate"}
    assert got[4] == {"bad_start"}
    assert got[5] == {"null_ordinal"}


def test_sequence_violations_moment_collision_caught(spark):
    """{1,5,6,...} vs {2,3,7,...}: same sum and sum of squares as the
    contiguous run's complement swap — exact histogram still flags it."""
    df = spark.createDataFrame(
        [(1, o) for o in (1, 5, 6, 4)] + [(2, o) for o in (2, 3, 7, 4)],
        "g long, o long")
    got = _kinds(sequence_violations(df, "g", "o").collect())
    assert "gap" in got[1] and "gap" in got[2]
    assert "bad_start" in got[2]


def test_sequence_violations_custom_start_and_stats(spark):
    df = spark.createDataFrame([(1, 0), (1, 1), (2, 1)], "g long, o long")
    rows = sequence_violations(df, "g", "o", start=0).collect()
    got = _kinds(rows)
    assert 1 not in got and got[2] == {"bad_start"}
    (r,) = rows
    assert (r["n_rows"], r["n_distinct"], r["min_ord"], r["max_ord"]) \
        == (1, 1, 1, 1)


def test_pii_scan_counts_and_filter(spark):
    df = spark.createDataFrame(
        [(1, "reach me at bob@example.com or +4915112345678"),
         (2, "server 10.0.0.1 and 192.168.1.254 up"),
         (3, "ssn 123-45-6789"),
         (4, "perfectly clean text"),
         (5, None)],
        "doc_id long, txt string")
    rows = {r["doc_id"]: r for r in pii_scan(df, "txt", "doc_id").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone_e164"] == 1
    assert rows[2]["n_ipv4"] == 2
    assert rows[3]["n_ssn_like"] == 1 and rows[3]["n_pii"] == 1
    # 5 (NULL text) scans as zero hits and is filtered, never an error


def test_pii_scan_codegen_clean_single_scan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pii_scan(docs, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "CodegenFallback" not in plan, plan[:2000]


def test_winsorized_sum_by_clamps_tails(spark):
    # 100 values 0..99 in one group: p10 ceil-rank value = 9,
    # p990 -> rank 99 -> value 98
    df = spark.createDataFrame([("a", v) for v in range(100)],
                               "g string, v long")
    (r,) = winsorized_sum_by(df, "v", ["g"], lo_pm=100, hi_pm=990).collect()
    lo_v, hi_v = 9, 98
    expect = sum(min(max(v, lo_v), hi_v) for v in range(100))
    assert r["w_sum"] == expect
    assert r["n_rows"] == 100
    assert r["n_lo"] == lo_v and r["n_hi"] == 1   # 0..8 up, 99 down


def test_winsorized_sum_by_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", 5)], "g string, v long")
    rows = {r["g"]: r for r in winsorized_sum_by(
        df, "v", ["g"], lo_pm=10, hi_pm=990).collect()}
    assert rows["a"]["n_rows"] == 2
    assert rows["b"]["n_rows"] == 1


def test_winsorized_sum_by_validates_quantile_range(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError):
        winsorized_sum_by(df, "v", ["g"], lo_pm=0, hi_pm=990)
    with pytest.raises(ValueError):
        winsorized_sum_by(df, "v", ["g"], lo_pm=500, hi_pm=100)
