"""kmv_similarity: deterministic bottom-k snapshot resemblance."""

import hashlib

import pytest

from pandasschema_spark.operators.sketch import kmv_similarity


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "t string")


def _h(v):
    return hashlib.md5(v.encode()).hexdigest()[:16]


def test_exact_jaccard_when_under_k(spark):
    a = _df(spark, ["x", "y", "z", "z"])  # dup collapses
    b = _df(spark, ["y", "z", "w"])
    row, = kmv_similarity(a, b, "t", k=256).collect()
    assert (row["n_kept_a"], row["n_kept_b"]) == (3, 3)
    assert row["n_union_kept"] == 4 and row["n_inter"] == 2
    assert row["jaccard_ppm"] == 2 * 1_000_000 // 4


def test_estimator_path_matches_python_replay(spark):
    vals_a = ["v{}".format(i) for i in range(60)]
    vals_b = ["v{}".format(i) for i in range(30, 90)]
    k = 16
    row, = kmv_similarity(_df(spark, vals_a), _df(spark, vals_b),
                          "t", k=k).collect()
    ka = set(sorted(_h(v) for v in set(vals_a))[:k])
    kb = set(sorted(_h(v) for v in set(vals_b))[:k])
    u = sorted(ka | kb)[:k]
    n_inter = sum(1 for h in u if h in ka and h in kb)
    assert (row["n_kept_a"], row["n_kept_b"]) == (k, k)
    assert row["n_union_kept"] == len(u)
    assert row["n_inter"] == n_inter
    assert row["jaccard_ppm"] == n_inter * 1_000_000 // len(u)


def test_empty_sides(spark):
    a = _df(spark, ["x"])
    empty = spark.createDataFrame([], "t string")
    row, = kmv_similarity(a, empty, "t", k=8).collect()
    assert (row["n_kept_b"], row["n_inter"], row["jaccard_ppm"]) == (0, 0, 0)
    row, = kmv_similarity(empty, empty, "t", k=8).collect()
    assert row["n_union_kept"] == 0 and row["jaccard_ppm"] is None


def test_normalize_text_merges_whitespace_variants(spark):
    a = _df(spark, ["Hello  World"])
    b = _df(spark, ["hello world "])
    row, = kmv_similarity(a, b, "t", k=8, normalize_text=True).collect()
    assert row["jaccard_ppm"] == 1_000_000
    row, = kmv_similarity(a, b, "t", k=8).collect()
    assert row["jaccard_ppm"] == 0


def test_guard(spark):
    a = _df(spark, ["x"])
    with pytest.raises(ValueError):
        kmv_similarity(a, a, "t", k=0)
