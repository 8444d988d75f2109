"""embedding_centroid_drift: exact inter-cohort centroid angle."""

import pytest

from pandasschema_spark.operators.drift import embedding_centroid_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec array<float>, c string")


def test_aligned_orthogonal_and_opposed(spark):
    rows = (
        [([1.0, 0.0], "a")] * 3          # centroid along x
        + [([2.0, 0.0], "b")] * 2        # same direction, other scale
        + [([0.0, 5.0], "o")] * 2        # orthogonal
        + [([-1.0, 0.0], "n")] * 2       # opposed
    )
    out = {(r["cohort_a"], r["cohort_b"]): r for r in
           embedding_centroid_drift(_df(spark, rows), "vec", "c",
                                    quant=100).collect()}
    ab = out[("a", "b")]
    assert (ab["n_a"], ab["n_b"]) == (3, 2)
    assert ab["cos2_ppm"] == 1_000_000 and ab["dot_sign"] == 1
    ao = out[("a", "o")]
    assert ao["cos2_ppm"] == 0 and ao["dot_sign"] == 0
    an = out[("a", "n")]
    assert an["cos2_ppm"] == 1_000_000 and an["dot_sign"] == -1
    assert len(out) == 6  # all C(4,2) pairs


def test_exact_quantized_angle(spark):
    # centroids (quantized sums): a = (300, 0), d = (200, 200)
    # cos^2 = (300*200)^2 / (300^2 * (200^2+200^2)) = 0.5 exactly
    rows = [([1.0, 0.0], "a")] * 3 + [([1.0, 1.0], "d")] * 2
    out = {(r["cohort_a"], r["cohort_b"]): r for r in
           embedding_centroid_drift(_df(spark, rows), "vec", "c",
                                    quant=100).collect()}
    assert out[("a", "d")]["cos2_ppm"] == 500_000


def test_zero_centroid_null_and_exclusions(spark):
    rows = [([1.0, -1.0], "z"), ([-1.0, 1.0], "z"),  # sums to zero
            ([1.0, 0.0], "a"), (None, "a"), ([1.0, 0.0], None)]
    out = {(r["cohort_a"], r["cohort_b"]): r for r in
           embedding_centroid_drift(_df(spark, rows), "vec", "c").collect()}
    assert set(out) == {("a", "z")}
    r = out[("a", "z")]
    assert r["cos2_ppm"] is None and (r["n_a"], r["n_b"]) == (1, 2)


def test_guard_and_plan(spark):
    df = _df(spark, [([1.0], "a")])
    with pytest.raises(ValueError):
        embedding_centroid_drift(df, "vec", "c", quant=0)
    plan = embedding_centroid_drift(df, "vec", "c")._jdf.queryExecution() \
        .executedPlan().toString()
    # the (cohort, dim) sum agg is map-side combined; no window
    assert "partial_sum" in plan, plan
    assert "Window" not in plan, plan
