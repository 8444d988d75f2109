"""sequence_pack unit tests: exact global token offsets via the bucketed
distributed prefix sum, chunk-span math, zero-token docs, and the plan
locks that keep the corpus out of a single-partition window."""

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.text import sequence_pack


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_offsets_exact_across_bucket_boundaries(spark):
    # 2/3/1/4/2 tokens, bucket_size=2 -> buckets {0,1},{2,3},{4}; the
    # bucketed two-level sum must equal the single-threaded prefix sum
    texts = ["a b", "a b c", "x", "a b c d", "y z"]
    got = _rows(sequence_pack(_mk(spark, texts), "text", "doc_id",
                              context_len=4, bucket_size=2))
    offs = [got[i]["tok_offset"] for i in range(5)]
    assert offs == [0, 2, 5, 6, 10]
    assert [got[i]["n_tokens"] for i in range(5)] == [2, 3, 1, 4, 2]
    # doc 3: tokens 6..9 -> chunks 1..2 (L=4); doc 4: tokens 10..11 -> chunk 2
    assert (got[3]["chunk_first"], got[3]["chunk_last"], got[3]["n_chunks"]) == (1, 2, 2)
    assert (got[4]["chunk_first"], got[4]["chunk_last"], got[4]["n_chunks"]) == (2, 2, 1)


def test_bucket_size_never_changes_the_answer(spark):
    texts = ["w " * (i % 5) for i in range(37)]
    df = _mk(spark, texts)
    a = _rows(sequence_pack(df, "text", "doc_id", context_len=3, bucket_size=1))
    b = _rows(sequence_pack(df, "text", "doc_id", context_len=3, bucket_size=7))
    c = _rows(sequence_pack(df, "text", "doc_id", context_len=3, bucket_size=1 << 20))
    assert a == b == c


def test_zero_token_docs_span_nothing(spark):
    got = _rows(sequence_pack(_mk(spark, ["a b", "", None, "   ", "c"]),
                              "text", "doc_id", context_len=2, bucket_size=2))
    for i in (1, 2, 3):  # empty, NULL, whitespace-only: zero width
        r = got[i]
        assert r["n_tokens"] == 0 and r["n_chunks"] == 0
        assert r["chunk_first"] is None and r["chunk_last"] is None
    # zero-token docs do not advance the stream
    assert got[4]["tok_offset"] == 2
    assert got[0]["n_chunks"] == 1 and got[0]["chunk_first"] == 0


def test_straddle_and_alignment(spark):
    # L=3: doc0 takes 0..2 (exactly chunk 0), doc1 takes 3..7 (chunks 1..2)
    got = _rows(sequence_pack(_mk(spark, ["a b c", "d e f g h"]),
                              "text", "doc_id", context_len=3))
    assert (got[0]["chunk_first"], got[0]["chunk_last"], got[0]["n_chunks"]) == (0, 0, 1)
    assert (got[1]["chunk_first"], got[1]["chunk_last"], got[1]["n_chunks"]) == (1, 2, 2)


def test_arg_guards(spark):
    df = _mk(spark, ["a"])
    with pytest.raises(ValueError):
        sequence_pack(df, "text", "doc_id", context_len=0)
    with pytest.raises(ValueError):
        sequence_pack(df, "text", "doc_id", context_len=4, bucket_size=0)


def test_plan_no_corpus_single_partition_window(spark):
    """The scale lock: the only SinglePartition exchange sits above a
    HashAggregate (the O(buckets) bucket-total frame), the corpus-side
    window partitions by the bucket column, and the bucket-prefix frame
    joins back as a broadcast — the corpus never funnels through one
    task and never sort-merge-joins."""
    import re

    df = _mk(spark, ["a b"] * 8)
    out = sequence_pack(df, "text", "doc_id", context_len=4, bucket_size=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly ONE SinglePartition exchange, and its child is the
    # bucket-total HashAggregate — O(buckets) rows, never the corpus
    singles = re.findall(r"Exchange SinglePartition[^\n]*\n[^\n]*", plan)
    assert len(singles) == 1, plan
    assert "HashAggregate" in singles[0], plan
    # the corpus-side running sum is windowspecdefinition(__b__, doc_id)
    assert re.search(r"windowspecdefinition\(__b__#\d+L, doc_id#\d+L ASC", plan), plan
    # the bucket-prefix frame joins back broadcast, never sort-merge
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # bucket totals combine map-side before their shuffle
    assert "partial_sum" in plan, plan
