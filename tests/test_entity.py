"""resolve_entities: blocking + bounded levenshtein + closure semantics."""

import pytest
from pyspark.sql import functions as F

from pandasschema_spark.operators.entity import (
    DEFAULT_MAX_BLOCK,
    normalized_name_expr,
    resolve_entities,
)


@pytest.fixture(scope="module")
def names(spark):
    rows = [
        (1, "Acme Corporation"),
        (2, "acme corporation"),      # normalizes equal to 1 -> dist 0
        (3, "Acme Corporatio"),       # deletion past the prefix -> dist 1
        (4, "Acme Corporatiot"),      # substitution past the prefix -> dist 1
        (5, "zAcme Corporation"),     # edit INSIDE the prefix -> other block
        (6, "Globex Industries"),     # unrelated singleton
        (7, "Initech LLC"),
        (8, "initech, llc"),          # punctuation collapses -> dist 0 vs 7
    ]
    return spark.createDataFrame(rows, "id long, name string")


def test_clusters_and_singletons(spark, names):
    got = {r["id"]: r["entity_id"]
           for r in resolve_entities(names, "name", "id").collect()}
    # every input row is assigned exactly once
    assert sorted(got) == [1, 2, 3, 4, 5, 6, 7, 8]
    # 1,2 identical post-normalization; 3,4 within 2 edits, same block
    assert got[1] == got[2] == got[3] == got[4] == 1
    # 5 is 1 edit away from 1 but its BLOCK differs: blocking recall
    # contract says it resolves to itself
    assert got[5] == 5
    assert got[6] == 6
    assert got[7] == got[8] == 7


def test_transitive_chain_closes(spark, names):
    # A~B at dist 2 and B~C at dist 2 with A~C at dist 4: closure must
    # still collapse all three (pairs alone would leave A,C separate)
    rows = [(10, "abcdefghijklmnop"),
            (11, "abcdefghijklmnzz"),
            (12, "abcdefghijklzzzz")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {r["id"]: r["entity_id"]
           for r in resolve_entities(df, "name", "id").collect()}
    assert got == {10: 10, 11: 10, 12: 10}


def test_hot_block_cap(spark):
    # 6 rows share one block; cap 5 drops the whole block -> all
    # singletons. cap None restores the pairs.
    rows = [(i, "prefixaa name{}".format(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, name string")
    capped = {r["id"]: r["entity_id"]
              for r in resolve_entities(df, "name", "id", max_block=5).collect()}
    assert capped == {i: i for i in range(6)}
    exact = {r["id"]: r["entity_id"]
             for r in resolve_entities(df, "name", "id", max_block=None).collect()}
    assert set(exact.values()) == {0}
    assert DEFAULT_MAX_BLOCK == 10_000


def test_normalization_expr(spark):
    df = spark.createDataFrame([("  Foo--Bar,  Inc. ",)], "s string")
    out = df.select(normalized_name_expr(F.col("s")).alias("n")).head()["n"]
    assert out == "foo bar inc"


def test_assign_entities_incremental(spark):
    from pandasschema_spark.operators.entity import assign_entities

    store = spark.createDataFrame(
        [("acme corporation", 1), ("acme corporatio", 1), ("globex industries", 6)],
        "name string, entity_id long")
    new = spark.createDataFrame(
        [(100, "Acme Corporatiot"),   # 2 edits from both acme rows -> 1
         (101, "Globex Industriez"),  # 1 edit -> 6
         (102, "zGlobex Industries"), # block moved -> self
         (103, "Hooli Inc")],         # no match -> self
        "id long, name string")
    got = {r["id"]: r["entity_id"]
           for r in assign_entities(new, store, "name", "id").collect()}
    assert got == {100: 1, 101: 6, 102: 102, 103: 103}


def test_assign_entities_min_of_conflicting_matches(spark):
    from pandasschema_spark.operators.entity import assign_entities

    # two store rows within 2 edits of the new name but carrying
    # DIFFERENT entities: assignment takes the minimum, deterministically
    store = spark.createDataFrame(
        [("datacorp alpha", 9), ("datacorp alphb", 4)],
        "name string, entity_id long")
    new = spark.createDataFrame([(200, "datacorp alphc")], "id long, name string")
    got = assign_entities(new, store, "name", "id").head()
    assert (got["id"], got["entity_id"]) == (200, 4)


def test_assign_entities_union_cap(spark):
    from pandasschema_spark.operators.entity import assign_entities

    # 3 store + 3 new rows share a block: each side alone is under a
    # cap of 5, the UNION is over it -> the block drops from BOTH sides
    store = spark.createDataFrame(
        [("prefixaa store{}".format(i), i) for i in range(3)],
        "name string, entity_id long")
    new = spark.createDataFrame(
        [(300 + i, "prefixaa store{}".format(i)) for i in range(3)],
        "id long, name string")
    capped = {r["id"]: r["entity_id"]
              for r in assign_entities(new, store, "name", "id", max_block=5).collect()}
    assert capped == {300: 300, 301: 301, 302: 302}
    exact = {r["id"]: r["entity_id"]
             for r in assign_entities(new, store, "name", "id", max_block=None).collect()}
    assert exact == {300: 0, 301: 0, 302: 0}  # all within 2 edits -> min entity


def test_non_integral_id_refused(spark):
    """String/uuid ids would cast('long') to NULL for every row and
    return a structurally valid but completely wrong resolution — the
    whole family refuses them up front (map to ordinals first)."""
    from pandasschema_spark.operators.entity import blocked_pairs, resolve_entities

    df = spark.createDataFrame(
        [("a3f9-0001", "acme corp"), ("a3f9-0002", "acme corp.")],
        "doc_id string, name string")
    with pytest.raises(ValueError, match="integral id"):
        resolve_entities(df, "name", "doc_id")
    with pytest.raises(ValueError, match="integral id"):
        blocked_pairs(df, "name", "doc_id")


def test_decimal_scale0_id_accepted(spark):
    """DECIMAL(p<=18, 0) ordinals (warehouse-migrated schemas) cast to
    long exactly — the integral-id guard accepts them; scaled decimals
    stay refused."""
    from decimal import Decimal
    from pandasschema_spark.operators.entity import resolve_entities

    df = spark.createDataFrame(
        [(Decimal(1), "zq9f8a7b corp"), (Decimal(2), "zq9f8a7b corp.")],
        "doc_id decimal(18,0), name string")
    ent = {r["id"]: r["entity_id"] for r in resolve_entities(df, "name", "doc_id").collect()}
    assert ent == {1: 1, 2: 1}
    scaled = spark.createDataFrame(
        [(Decimal("1.5"), "acme")], "doc_id decimal(18,1), name string")
    with pytest.raises(ValueError, match="integral id"):
        resolve_entities(scaled, "name", "doc_id")
