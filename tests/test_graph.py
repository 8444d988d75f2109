"""connected_components / duplicate_clusters: the alternating-star CC
must agree with a driver-side union-find on arbitrary graphs."""

import random

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.graph import (
    connected_components,
    duplicate_clusters,
)


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to final roots, then label = min of component (the
    # union rule above keeps the min as root)
    return {x: find(x) for x in parent}


def _spark_labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kw)
    rows = out.collect()
    assert len(rows) == len({r["id"] for r in rows}), "duplicate id rows"
    return {r["id"]: r["cluster_id"] for r in rows}


def test_chain_collapses_to_one_cluster(spark):
    # A-B-C-D chain: naive pair-groupBy can't see A~D; closure must
    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    assert _spark_labels(spark, edges) == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        edges = [(a, b) for a, b in edges if a != b]
        assert _spark_labels(spark, edges) == _union_find_labels(edges)


def test_empty_and_self_loops(spark):
    df = spark.createDataFrame([(5, 5)], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_duplicate_clusters_keep_first(spark):
    edges = [(3, 1), (3, 2), (8, 9)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {(r["id"], r["keep_id"]) for r in duplicate_clusters(df).collect()}
    assert out == {(2, 1), (3, 1), (9, 8)}


def test_string_ids(spark):
    # ids only need a total order; dedup over string doc ids must work
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b")], "id_a string, id_b string")
    out = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a"}


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=0)
