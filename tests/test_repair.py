"""Row-local auto-repair rules (operators/repair.py)."""

import pytest

from pandasschema_spark.operators.repair import RepairRule, repair, repair_summary


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "  ok  ", 5.0, "high", "12"),
            (2, "clean", -3.0, "LOW", "x9"),
            (3, None, 150.0, "Mid", None),
            (4, "pad ", 50.0, "weird", "007"),
        ],
        "id int, s string, v double, c string, d string",
    )


RULES = (
    RepairRule("s", "trim"),
    RepairRule("v", "clamp", lo=0.0, hi=100.0),
    RepairRule("c", "case_to_list", allowed=("Low", "Mid", "High")),
    RepairRule("d", "null_if_no_match", pattern="[0-9]+"),
)


def test_repaired_values(dirty):
    rows = {r["id"]: r for r in repair(dirty, RULES).collect()}
    assert (rows[1]["s"], rows[1]["v"], rows[1]["c"], rows[1]["d"]) == ("ok", 5.0, "High", "12")
    assert (rows[2]["v"], rows[2]["c"], rows[2]["d"]) == (0.0, "Low", None)
    assert (rows[3]["s"], rows[3]["v"], rows[3]["c"], rows[3]["d"]) == (None, 100.0, "Mid", None)
    assert (rows[4]["s"], rows[4]["c"], rows[4]["d"]) == ("pad", "weird", "007")


def test_summary_counts(dirty):
    out = {r["rule"]: r for r in repair_summary(dirty, RULES).collect()}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["s:trim"]["n_applied"] == 2
    assert out["v:clamp"]["n_applied"] == 2
    assert out["c:case_to_list"]["n_applied"] == 2  # LOW->Low, high->High; Mid already canonical
    assert out["d:null_if_no_match"]["n_applied"] == 1


def test_idempotent(dirty):
    once = repair(dirty, RULES)
    twice = {r["rule"]: r["n_applied"] for r in repair_summary(once, RULES).collect()}
    assert all(v == 0 for v in twice.values())


def test_staged_composition(spark):
    # trim then null_if_no_match on the SAME column: ' 12 ' survives
    # because the pattern sees the trimmed value
    df = spark.createDataFrame([(1, " 12 "), (2, " x ")], "id int, t string")
    rules = (
        RepairRule("t", "trim"),
        RepairRule("t", "null_if_no_match", pattern="[0-9]+"),
    )
    rows = {r["id"]: r["t"] for r in repair(df, rules).collect()}
    assert rows == {1: "12", 2: None}
    counts = {r["rule"]: r["n_applied"] for r in repair_summary(df, rules).collect()}
    assert counts == {"t:trim": 2, "t:null_if_no_match": 1}


def test_guards(spark):
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    with pytest.raises(ValueError):
        repair(df, [])
    with pytest.raises(ValueError):
        repair(df, [RepairRule("nope", "trim")])
    with pytest.raises(ValueError):
        repair(df, [RepairRule("s", "trim"), RepairRule("s", "trim")])
    with pytest.raises(ValueError):
        RepairRule("s", "clamp", lo=5.0, hi=1.0)
    with pytest.raises(ValueError):
        RepairRule("s", "case_to_list", allowed=("A", "a"))
    with pytest.raises(ValueError):
        RepairRule("s", "null_if_no_match")
    with pytest.raises(ValueError):
        RepairRule("s", "frobnicate")


def test_zero_shuffle_plans(dirty):
    rep = repair(dirty, RULES)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    summ = repair_summary(dirty, RULES)
    splan = summ._jdf.queryExecution().executedPlan().toString()
    # single global agg: partial + final, no hash-key shuffle
    assert "HashAggregate" in splan or "SortAggregate" in splan
    assert "CodegenFallback" not in plan


def test_repair_rules_are_type_preserving(spark):
    """clamp keeps the column's type (bare double literals widened int
    columns to double), refuses fractional bounds on integral columns
    and non-finite bounds; string-only rules refuse non-string columns."""
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, 500), (2, -3)], "id long, qty long")
    out = repair(df, [RepairRule("qty", "clamp", lo=0.0, hi=100.0)])
    assert isinstance(out.schema["qty"].dataType, T.LongType)
    assert {r["qty"] for r in out.collect()} == {100, 0}
    with pytest.raises(ValueError, match="integer bounds"):
        repair(df, [RepairRule("qty", "clamp", lo=0.5, hi=10.0)])
    with pytest.raises(ValueError, match="finite"):
        RepairRule("qty", "clamp", lo=float("nan"), hi=10.0)
    with pytest.raises(ValueError, match="repairs strings"):
        repair(df, [RepairRule("qty", "null_if_no_match", pattern="[0-9]+")])


def test_reconcile_null_header_amount_flags(spark):
    from pyspark.sql import functions as F

    from pandasschema_spark.operators.reconcile import reconcile_header_detail

    header = spark.createDataFrame(
        [(1, 100), (2, None), (3, 50)], "k long, amt long")
    detail = spark.createDataFrame(
        [(1, 100), (2, 70), (3, 50)], "k long, amt long")
    out = {r["key"]: r for r in reconcile_header_detail(
        header, "k", F.col("amt"), detail, "k", F.col("amt")).collect()}
    assert set(out) == {2}          # NULL stored total cannot reconcile
    assert out[2]["diff"] is None
