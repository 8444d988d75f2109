"""label_agreement: embedding-neighborhood label-noise mining."""

import pytest

from pyspark.sql import functions as F

from pandasschema_spark.operators.similarity import label_agreement


def _emb(spark, rows):
    # rows: (vec_id, [floats], label)
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def _queries(df, ids):
    return (df.where(F.col("vec_id").isin(ids))
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec"), "label"))


def test_planted_mislabel_is_the_only_suspect(spark):
    # two tight clusters on orthogonal axes; vec 0 sits in cluster A
    # (x-axis) but carries cluster B's label -> its 3 neighbors all
    # vote label 1, own label 2 loses
    rows = [(0, [1.0, 0.01], 2)] + \
        [(i, [1.0, 0.01 * i], 1) for i in (1, 2, 3)] + \
        [(i, [0.01 * i, 1.0], 2) for i in (4, 5, 6)]
    df = _emb(spark, rows)
    out = {r["query_id"]: r for r in
           label_agreement(df, _queries(df, [0, 1, 4]), k=3).collect()}
    assert out[0]["suspect"] and out[0]["majority_label"] == 1
    assert out[0]["n_same"] == 0 and out[0]["n_neighbors"] == 3
    assert not out[1]["suspect"] and out[1]["n_same"] == 2
    assert not out[4]["suspect"] and out[4]["majority_label"] == 2


def test_vote_tie_breaks_to_smallest_label(spark):
    # query 0's 4 neighbors split 2-2 between labels 5 and 3 -> 3 wins
    rows = [(0, [1.0, 0.0], 5),
            (1, [1.0, 0.001], 5), (2, [1.0, 0.002], 5),
            (3, [1.0, 0.003], 3), (4, [1.0, 0.004], 3)]
    df = _emb(spark, rows)
    row, = label_agreement(df, _queries(df, [0]), k=4).collect()
    assert row["majority_label"] == 3
    assert row["suspect"] and row["n_same"] == 2


def test_fewer_corpus_rows_than_k(spark):
    rows = [(0, [1.0, 0.0], 1), (1, [0.9, 0.1], 1)]
    df = _emb(spark, rows)
    row, = label_agreement(df, _queries(df, [0]), k=10).collect()
    assert row["n_neighbors"] == 1  # self excluded, corpus exhausted
    assert row["n_same"] == 1 and not row["suspect"]


def test_guard_and_plan(spark):
    rows = [(i, [1.0, float(i)], i % 2) for i in range(6)]
    df = _emb(spark, rows)
    with pytest.raises(ValueError):
        label_agreement(df, _queries(df, [0]), k=0)
    plan = label_agreement(df, _queries(df, [0, 1]), k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    # the O(|Q| k) neighbor frame broadcasts against the corpus scan;
    # votes/majority are aggregates, never a data-scale window sort
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_string_labels_and_custom_column_names(spark):
    # regression: the tie-break must be generic over orderable label
    # types, and caller column names must flow through cosine_topk's
    # hardcoded output names
    rows = [(0, [1.0, 0.0], "dog"),
            (1, [1.0, 0.001], "cat"), (2, [1.0, 0.002], "cat"),
            (3, [1.0, 0.003], "bird"), (4, [1.0, 0.004], "bird")]
    df = spark.createDataFrame(
        rows, "doc_id long, emb array<float>, cls string")
    queries = (df.where(F.col("doc_id") == 0)
               .select(F.col("doc_id").alias("qid"),
                       F.col("emb").alias("qv"), "cls"))
    row, = label_agreement(
        df, queries, id_col="doc_id", vec_col="emb", label_col="cls",
        query_id_col="qid", query_vec_col="qv", k=4).collect()
    # 2-2 tie between 'cat' and 'bird' -> smallest string wins
    assert row["majority_label"] == "bird"
    assert row["own_label"] == "dog" and row["suspect"]
    assert row["n_same"] == 0 and row["n_neighbors"] == 4


def test_null_labeled_neighbors_do_not_vote(spark):
    """A NULL-labeled neighbor must neither inflate n_neighbors nor win
    the majority; a query whose neighbors are ALL unlabeled is absent."""
    from pyspark.sql import functions as F

    from pandasschema_spark.operators.similarity import label_agreement

    # query 0 at [1,0]: nearest are three NULL-labeled + one labeled 'b'
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0], None), (11, [0.99, 0.01], None),
         (12, [0.98, 0.02], None), (13, [0.9, 0.1], "b"),
         (20, [0.0, 1.0], None), (21, [0.01, 1.0], None),
         (22, [0.02, 1.0], None), (23, [0.03, 1.0], None)],
        "vec_id long, embedding array<double>, label string")
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0], "a"), (1, [0.0, 1.0], "a")],
        "query_id long, embedding array<double>, label string")
    out = {r["query_id"]: r for r in label_agreement(
        corpus, queries, k=4, query_id_col="query_id",
        vec_col="embedding", query_vec_col="embedding").collect()}
    assert set(out) == {0}                      # query 1: all votes unlabeled
    assert out[0]["majority_label"] == "b"
    assert out[0]["n_neighbors"] == 1           # labeled neighbors only
    assert bool(out[0]["suspect"]) is True
