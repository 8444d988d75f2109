"""operators/text.py lang_confusion: declared-vs-detected language
confusion matrix, shared prediction rule with lang_id."""

import pytest

from pandasschema_spark.operators.text import lang_confusion, lang_id


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


CORPUS = [
    (0, "the cat and the dog is of to", "en"),       # en declared+detected
    (1, "the weather is nice and the food", "en"),
    (2, "the train is late and the bus", "de"),       # mislabeled: en text
    (3, "der zug ist und das auto ist", "de"),        # de correct
    (4, "le chat et la maison est les", "fr"),        # fr correct
    (5, "xqz pqr lmn", "fr"),                         # no markers -> und
    (6, "el gato y los perros es", None),             # NULL declared cohort
    (7, "the null cohort is of the", None),
]


def _cells(df):
    return {(r["lang"], r["lang_pred"]): (r["n_docs"], r["share_ppm"])
            for r in df.collect()}


def test_confusion_cells_and_cohort_shares(spark):
    got = _cells(lang_confusion(_mk(spark, CORPUS), "text", "lang"))
    assert got[("en", "en")] == (2, 1_000_000)
    assert got[("de", "en")] == (1, 500_000)    # the mislabel
    assert got[("de", "de")] == (1, 500_000)
    assert got[("fr", "fr")] == (1, 500_000)
    assert got[("fr", "und")] == (1, 500_000)
    # NULL declared lang is its own cohort (never dropped, never joined away)
    assert got[(None, "es")] == (1, 500_000)
    assert got[(None, "en")] == (1, 500_000)
    assert len(got) == 7


def test_shares_sum_to_at_most_denom_per_cohort(spark):
    out = lang_confusion(_mk(spark, CORPUS), "text", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["share_ppm"])
    for shares in by_lang.values():
        assert sum(shares) <= 1_000_000  # floor-div never overshoots


def test_prediction_rule_is_exactly_lang_id(spark):
    df = _mk(spark, CORPUS)
    preds = {r["doc_id"]: r["lang_pred"]
             for r in lang_id(df, "text", "doc_id").collect()}
    cells = _cells(lang_confusion(df, "text", "lang"))
    derived = {}
    for i, (_, _, lang) in enumerate(CORPUS):
        derived[(lang, preds[i])] = derived.get((lang, preds[i]), 0) + 1
    assert {k: v[0] for k, v in cells.items()} == derived


def test_arg_guard(spark):
    with pytest.raises(ValueError):
        lang_confusion(_mk(spark, CORPUS), "text", "lang", denom=0)
