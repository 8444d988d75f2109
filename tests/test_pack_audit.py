"""pack_audit: length-bucket batch-packing waste (operators/audio.py)."""

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.audio import pack_audit


@pytest.fixture(scope="module")
def durs(spark):
    return spark.createDataFrame(
        [(1, 30), (2, 50), (3, 60), (4, 100), (5, 170), (6, None), (7, 0)],
        "id int, dur_ms int",
    )


def test_buckets_and_waste(durs):
    out = {r["bucket_ms"]: r for r in pack_audit(durs, (50, 100, 150)).collect()}
    b50 = out[50]
    assert (b50["n_clips"], b50["sum_dur_ms"], b50["pad_ms"]) == (3, 80, 70)
    assert b50["pad_ppm"] == 70 * 1000000 // 150
    b100 = out[100]
    assert (b100["n_clips"], b100["sum_dur_ms"], b100["pad_ms"]) == (2, 160, 40)
    # 170 overflows the 150 rung
    over = out[None]
    assert (over["n_clips"], over["sum_dur_ms"]) == (1, 170)
    assert over["pad_ms"] is None and over["pad_ppm"] is None
    # NULL duration excluded entirely
    assert sum(r["n_clips"] for r in out.values()) == 6


def test_exact_fit_zero_pad(spark):
    df = spark.createDataFrame([(1, 100), (2, 100)], "id int, dur_ms int")
    row = pack_audit(df, (100,)).collect()[0]
    assert row["pad_ms"] == 0 and row["pad_ppm"] == 0


def test_guards(durs):
    with pytest.raises(ValueError):
        pack_audit(durs, ())
    with pytest.raises(ValueError):
        pack_audit(durs, (0, 50))


def test_metadata_only_plan(durs):
    plan = pack_audit(durs, (50, 100))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2 and "Join" not in plan
