"""doc_repetition: Gopher-style per-doc repetition stats, zero-shuffle."""

from pandasschema_spark.operators.text import doc_repetition


def _run(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    return {r["doc_id"]: r for r in
            doc_repetition(df, "text", "doc_id").collect()}


def test_counts_and_runs(spark):
    out = _run(spark, [
        "a a a b",            # top 'a'x3, run 3
        "a b a b a b",        # top 3, max run 1
        "x",                  # singleton
        "spam spam spam spam"  # fully degenerate
    ])
    r = out[0]
    assert (r["n_tokens"], r["n_types"], r["top_count"], r["max_run"]) == (4, 2, 3, 3)
    r = out[1]
    assert (r["n_tokens"], r["n_types"], r["top_count"], r["max_run"]) == (6, 2, 3, 1)
    r = out[2]
    assert (r["n_tokens"], r["n_types"], r["top_count"], r["max_run"]) == (1, 1, 1, 1)
    r = out[3]
    assert (r["n_tokens"], r["n_types"], r["top_count"], r["max_run"]) == (4, 1, 4, 4)


def test_normalization_matches_sql_form(spark):
    # mixed case + tabs/newlines collapse exactly like normalized_text_expr
    out = _run(spark, ["The\tTHE  the\nend"])
    r = out[0]
    assert (r["n_tokens"], r["n_types"], r["top_count"], r["max_run"]) == (4, 2, 3, 3)


def test_null_and_empty_emit_no_row(spark):
    out = _run(spark, [None, "", "   ", "ok ok"])
    assert set(out) == {3}
    assert out[3]["top_count"] == 2


def test_no_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = doc_repetition(df, "text", "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
