"""layout_audit: per-file range overlap / clustering audit."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pandasschema_spark.operators.layout import layout_audit

DIR = "/tmp/psf_layout_test"


def _write(ranges):
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    for name, vals in ranges.items():
        pq.write_table(pa.table({"v": pa.array(vals, pa.int64())}),
                       os.path.join(DIR, name))


@pytest.fixture(scope="module")
def audited(spark):
    _write({
        "f0.parquet": list(range(0, 1000)),
        "f1.parquet": list(range(1000, 2000)),      # touches f2 only
        "f2.parquet": list(range(500, 1501)),       # straddles f0 and f1
        "f3.parquet": list(range(3000, 3500)),      # disjoint
        "f4.parquet": [None, None],                 # all-null
    })
    df = spark.read.parquet(DIR)
    yield {r["source_file"]: r for r in layout_audit(df, "v").collect()}
    shutil.rmtree(DIR, ignore_errors=True)


def test_ranges_and_counts(audited):
    a = audited
    assert (a["f0.parquet"]["min_v"], a["f0.parquet"]["max_v"]) == (0, 999)
    assert a["f0.parquet"]["n_rows"] == 1000
    assert a["f4.parquet"]["min_v"] is None and a["f4.parquet"]["n_rows"] == 2


def test_overlap_sweep(audited):
    assert audited["f0.parquet"]["n_overlaps"] == 1   # f2
    assert audited["f1.parquet"]["n_overlaps"] == 1   # f2
    assert audited["f2.parquet"]["n_overlaps"] == 2   # f0, f1
    assert audited["f3.parquet"]["n_overlaps"] == 0
    assert audited["f4.parquet"]["n_overlaps"] == 0   # null range never blocks pruning


def test_sweep_matches_bruteforce(spark):
    # adversarial ranges: duplicates, containment, point intervals
    ranges = {
        "a.parquet": [5, 5],            # point [5,5]
        "b.parquet": [5, 5, 5],         # identical point
        "c.parquet": [0, 10],           # contains both
        "d.parquet": [6, 7],
        "e.parquet": [11, 12],
    }
    _write(ranges)
    out = {r["source_file"]: r["n_overlaps"]
           for r in layout_audit(spark.read.parquet(DIR), "v").collect()}
    spans = {k: (min(v), max(v)) for k, v in ranges.items()}
    for i, (lo_i, hi_i) in spans.items():
        brute = sum(1 for j, (lo_j, hi_j) in spans.items()
                    if j != i and lo_j <= hi_i and hi_j >= lo_i)
        assert out[i] == brute, i
    shutil.rmtree(DIR, ignore_errors=True)


def test_explicit_file_col(spark):
    df = spark.createDataFrame(
        [("p1", 1), ("p1", 5), ("p2", 4), ("p2", 9)], "f string, v int")
    out = {r["source_file"]: r["n_overlaps"]
           for r in layout_audit(df, "v", file_col="f").collect()}
    assert out == {"p1": 1, "p2": 1}


def test_nan_and_basename_collision_guards(spark, tmp_path):
    """NaN values contribute no range info (Spark's NaN-is-greatest max
    would poison the bisect sweep), and two distinct paths sharing a
    basename refuse to merge into one audit row."""
    import pytest
    from pyspark.sql import functions as F

    from pandasschema_spark.operators.layout import layout_audit

    df = spark.createDataFrame(
        [("a.parquet", 1.0), ("a.parquet", float("nan")),
         ("b.parquet", 5.0), ("c.parquet", float("nan"))],
        "f string, v double")
    out = {r["source_file"]: r for r in
           layout_audit(df, "v", file_col="f").collect()}
    assert out["a.parquet"]["max_v"] == 1.0          # NaN excluded
    assert out["c.parquet"]["min_v"] is None         # all-NaN = range-less
    assert out["c.parquet"]["n_overlaps"] == 0
    clash = spark.createDataFrame(
        [("x/part-0.csv", 1.0), ("y/part-0.csv", 2.0)], "f string, v double")
    with pytest.raises(ValueError, match="basename collision"):
        layout_audit(clash, "v", file_col="f")
