"""table_diff: keyed snapshot reconciliation (operators/diff.py)."""

import pytest

from pandasschema_spark.operators.diff import table_diff


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def snapshots(spark):
    left = spark.createDataFrame(
        [
            (1, "A", 10.0),   # unchanged
            (2, "B", 20.0),   # removed
            (3, "C", 30.0),   # payload changed
            (4, None, 40.0),  # NULL payload, unchanged
            (5, "E", 50.0),   # duplicated key: 2 copies left, 1 right
            (5, "E", 50.0),
            (None, "N", 1.0),  # NULL key, unchanged
        ],
        "k int, s string, v double",
    )
    right = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (3, "C", 31.0),
            (4, None, 40.0),
            (5, "E", 50.0),
            (6, "F", 60.0),   # added
            (None, "N", 1.0),
        ],
        "k int, s string, v double",
    )
    return left, right


def test_statuses(snapshots):
    left, right = snapshots
    out = _rows(table_diff(left, right, ["k"], ["s", "v"]))
    assert out == [
        (2, 1, 0, "removed"),
        (3, 1, 1, "changed"),
        (5, 2, 1, "changed"),
        (6, 0, 1, "added"),
    ]


def test_equal_tables_emit_nothing(spark, snapshots):
    left, _ = snapshots
    assert table_diff(left, left, ["k"], ["s", "v"]).count() == 0
    # order/partitioning independence: a shuffled copy still reads equal
    shuffled = left.repartition(7, "v")
    assert table_diff(left, shuffled, ["k"], ["s", "v"]).count() == 0


def test_null_key_matches_itself(snapshots):
    left, right = snapshots
    out = table_diff(left, right, ["k"], ["s", "v"])
    assert [r for r in out.collect() if r["k"] is None] == []
    # ...but a NULL-keyed payload change is reported
    changed = right.withColumn(
        "v", right["v"] + (right["k"].isNull()).cast("int")
    )
    nulls = [tuple(r) for r in table_diff(left, changed, ["k"], ["s", "v"]).collect()
             if r["k"] is None]
    assert nulls == [(None, 1, 1, "changed")]


def test_null_payload_sentinel_not_skipped(spark):
    # concat_ws skips NULLs; the \x01 sentinel must keep (NULL,'x') and
    # ('x',NULL) distinct
    left = spark.createDataFrame([(1, None, "x")], "k int, a string, b string")
    right = spark.createDataFrame([(1, "x", None)], "k int, a string, b string")
    out = _rows(table_diff(left, right, ["k"], ["a", "b"]))
    assert out == [(1, 1, 1, "changed")]


def test_composite_keys(spark):
    left = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], "k1 int, k2 int, p string")
    right = spark.createDataFrame([(1, 1, "a"), (1, 2, "c")], "k1 int, k2 int, p string")
    out = _rows(table_diff(left, right, ["k1", "k2"], ["p"]))
    assert out == [(1, 2, 1, 1, "changed")]


def test_guards(spark):
    df = spark.createDataFrame([(1, "a")], "k int, p string")
    with pytest.raises(ValueError):
        table_diff(df, df, [], ["p"])
    with pytest.raises(ValueError):
        table_diff(df, df, ["k"], [])


def test_single_exchange_plan(snapshots):
    # the union must reach ONE hash(keys) aggregate: payload digests ride
    # the exchange, raw payloads never do
    left, right = snapshots
    plan = table_diff(left, right, ["k"], ["s", "v"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # AQE pair for one logical exchange
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


class TestSchemaDiff:
    def test_drift_matrix(self, spark):
        from pandasschema_spark.operators.diff import schema_diff

        left = spark.createDataFrame([(1, "a", 2.0)], "k int, gone string, t double")
        right = spark.createDataFrame([(1, "b", 3)], "k int, new string, t int")
        out = sorted(tuple(r) for r in schema_diff(left, right).collect())
        assert out == [
            ("gone", "removed", "string", None),
            ("new", "added", None, "string"),
            ("t", "type_changed", "double", "int"),
        ]

    def test_identical_schemas_empty(self, spark):
        from pandasschema_spark.operators.diff import schema_diff

        df = spark.createDataFrame([(1,)], "k int")
        assert schema_diff(df, df).count() == 0

    def test_decimal_precision_counts(self, spark):
        from pandasschema_spark.operators.diff import schema_diff
        from pyspark.sql import functions as F

        base = spark.createDataFrame([(1,)], "k int")
        l = base.select(F.col("k").cast("decimal(10,2)").alias("d"))
        r = base.select(F.col("k").cast("decimal(12,2)").alias("d"))
        out = [tuple(x) for x in schema_diff(l, r).collect()]
        assert out == [("d", "type_changed", "decimal(10,2)", "decimal(12,2)")]


def test_payload_digest_is_boundary_unambiguous(spark):
    """('a\\x00b','c') vs ('a','b\\x00c') concat identically under a
    separator-joined rendering — the fixed-width per-component md5
    digest must see them as CHANGED; same for NULL vs any literal."""
    from pandasschema_spark.operators.diff import table_diff

    left = spark.createDataFrame(
        [(1, "a\x00b", "c"), (2, None, "z"), (3, "same", "same")],
        "k long, p string, q string")
    right = spark.createDataFrame(
        [(1, "a", "b\x00c"), (2, "-" * 32, "z"), (3, "same", "same")],
        "k long, p string, q string")
    out = {r["k"]: r["status"]
           for r in table_diff(left, right, ["k"], ["p", "q"]).collect()}
    assert out == {1: "changed", 2: "changed"}
