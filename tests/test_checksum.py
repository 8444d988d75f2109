"""table_checksum: order/partitioning independence, sensitivity, closed form."""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from pandasschema_spark.operators.checksum import table_checksum


def _closed_form(values):
    lo = hi = 0
    n_nulls = 0
    for v in values:
        if v is None:
            n_nulls += 1
            continue
        h = hashlib.md5(str(v).encode()).hexdigest()
        lo += int(h[0:8], 16)
        hi += int(h[8:16], 16)
    return n_nulls, lo % (1 << 32), hi % (1 << 32)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [Row(k=i, s=("v{}".format(i % 37) if i % 5 else None)) for i in range(2000)]
    return spark.createDataFrame(rows)


def test_matches_python_closed_form(frame):
    got = {r["column"]: r for r in table_checksum(frame, ["k", "s"]).collect()}
    ks = [r["k"] for r in frame.select("k").collect()]
    ss = [r["s"] for r in frame.select("s").collect()]
    for col, vals in (("k", ks), ("s", ss)):
        nn, lo, hi = _closed_form(vals)
        r = got[col]
        assert (r["n_rows"], r["n_nulls"], r["sum_lo"], r["sum_hi"]) == (2000, nn, lo, hi)


def test_order_and_partitioning_independent(frame):
    base = sorted(map(tuple, table_checksum(frame, ["k", "s"]).collect()))
    shuffled = frame.repartition(13, F.col("s")).sortWithinPartitions(F.desc("k"))
    assert sorted(map(tuple, table_checksum(shuffled, ["k", "s"]).collect())) == base


def test_single_value_change_detected(frame, spark):
    mutated = frame.withColumn(
        "s", F.when(F.col("k") == 123, F.lit("tampered")).otherwise(F.col("s"))
    )
    a = {r["column"]: (r["sum_lo"], r["sum_hi"]) for r in table_checksum(frame, ["k", "s"]).collect()}
    b = {r["column"]: (r["sum_lo"], r["sum_hi"]) for r in table_checksum(mutated, ["k", "s"]).collect()}
    assert a["k"] == b["k"] and a["s"] != b["s"]


def test_empty_table(spark):
    df = spark.createDataFrame([], "k: bigint")
    r = table_checksum(df, ["k"]).collect()[0]
    assert tuple(r) == ("k", 0, 0, 0, 0)


def test_cols_guard(frame):
    with pytest.raises(ValueError):
        table_checksum(frame, [])


def test_bucketed_rolls_up_to_table_checksum(frame):
    from pandasschema_spark.operators.checksum import table_checksum_by

    per = table_checksum_by(frame, "k", ["k", "s"], buckets=8).collect()
    table = {r["column"]: r for r in table_checksum(frame, ["k", "s"]).collect()}
    roll = {}
    for r in per:
        c = r["column"]
        n, nn, lo, hi = roll.get(c, (0, 0, 0, 0))
        roll[c] = (n + r["n_rows"], nn + r["n_nulls"], lo + r["sum_lo"], hi + r["sum_hi"])
    for c, (n, nn, lo, hi) in roll.items():
        t = table[c]
        assert n == t["n_rows"] and nn == t["n_nulls"]
        assert lo % (1 << 32) == t["sum_lo"] and hi % (1 << 32) == t["sum_hi"]


def test_bucketed_localizes_divergence(frame):
    from pyspark.sql import functions as F
    from pandasschema_spark.operators.checksum import table_checksum_by

    mutated = frame.withColumn(
        "s", F.when(F.col("k") == 77, F.lit("tampered")).otherwise(F.col("s"))
    )
    a = {(r["bucket"], r["column"]): (r["sum_lo"], r["sum_hi"])
         for r in table_checksum_by(frame, "k", ["s"], buckets=8).collect()}
    b = {(r["bucket"], r["column"]): (r["sum_lo"], r["sum_hi"])
         for r in table_checksum_by(mutated, "k", ["s"], buckets=8).collect()}
    diff = [key for key in a if a[key] != b.get(key)]
    assert len(diff) == 1  # exactly the bucket holding k=77
