"""Distributed PCA: planted low-rank structure must be recovered."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.pca import apply_pca, train_pca


def _planted(spark, n=400, d=12, seed=3):
    """Data with variance concentrated on two planted orthogonal axes."""
    rng = np.random.default_rng(seed)
    a = np.zeros(d); a[0] = 1.0
    b = np.zeros(d); b[1] = 1.0
    rows = []
    for i in range(n):
        v = (rng.normal(0, 3.0) * a + rng.normal(0, 2.0) * b
             + rng.normal(0, 0.05, d))
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pca_recovers_planted_axes(spark):
    df = _planted(spark)
    m = train_pca(df, k=2)
    assert m.n == 400 and m.components.shape == (2, 12)
    # top two components align with the planted axes (up to sign, which
    # the convention fixes positive on the dominant loading)
    assert abs(m.components[0][0]) > 0.99
    assert abs(m.components[1][1]) > 0.99
    assert m.components[0][0] > 0 and m.components[1][1] > 0
    # variance ordering and dominance
    assert m.variances[0] > m.variances[1] > 0
    assert m.explained_ratio[:2].sum() > 0.99


def test_pca_partitioning_invariant(spark):
    df = _planted(spark)
    m1 = train_pca(df, k=3)
    m2 = train_pca(df.repartition(7), k=3)
    assert np.allclose(m1.components, m2.components, atol=1e-6)
    assert np.allclose(m1.variances, m2.variances, atol=1e-6)


def test_apply_pca_projects_and_whitens(spark):
    df = _planted(spark)
    m = train_pca(df, k=2)
    out = apply_pca(df, m, out_col="p").collect()
    assert len(out) == 400 and len(out[0]["p"]) == 2
    Y = np.array([r["p"] for r in out])
    # projected variances match the eigenvalues
    assert np.allclose(Y.var(axis=0), m.variances, rtol=0.05)
    Yw = np.array([r["p"] for r in
                   apply_pca(df, m, out_col="p", whiten=True).collect()])
    assert np.allclose(Yw.var(axis=0), 1.0, rtol=0.05)


def test_pca_empty_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        train_pca(df, k=2)


def test_pca_tree_reduce_matches_flat_collect(spark):
    """Above the partition threshold the gram partials go through one
    extra combine level; the model must match the flat path (~ulp float
    reassociation only) and still recover the planted axes."""
    df = _planted(spark).repartition(24)
    flat = train_pca(df, k=2, tree_reduce_above=1_000_000)
    tree = train_pca(df, k=2, tree_reduce_above=8)  # forces the combine level
    assert tree.n == flat.n == 400
    assert np.allclose(tree.components, flat.components, atol=1e-6)
    assert np.allclose(tree.variances, flat.variances, atol=1e-6)
    assert abs(tree.components[0][0]) > 0.99 and tree.components[0][0] > 0


def test_pca_poison_pill_null_and_ragged(spark):
    """One NULL or wrong-length embedding must not kill the fit; apply
    projects such rows to NULL instead of dropping or crashing."""
    import numpy as np
    from pyspark.sql import functions as F

    from pandasschema_spark.operators.pca import apply_pca, train_pca

    rows = ([(i, [float(i % 7), float(i % 3), 1.0]) for i in range(50)]
            + [(100, None), (101, [1.0]), (102, [1.0, 2.0, 3.0, 4.0])])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = train_pca(df, k=2)
    assert model.components.shape == (2, 3)
    out = {r["vec_id"]: r["pca"] for r in apply_pca(df, model).collect()}
    assert len(out) == 53
    assert out[100] is None and out[101] is None and out[102] is None
    assert out[0] is not None and len(out[0]) == 2
