"""sources/ingest.py: the reference's CSV flow end-to-end on Spark —
read_csv_with_ordinal -> Schema.validate -> byte-identical golden
warnings (reference example/example.py -> example.txt)."""

import pytest

from pandasschema_spark import Column, Schema
from pandasschema_spark.sources.ingest import (
    read_csv_with_ordinal,
    read_jsonl_with_ordinal,
)
from pandasschema_spark.validation import (
    InListValidation,
    InRangeValidation,
    LeadingWhitespaceValidation,
    MatchesPatternValidation,
    TrailingWhitespaceValidation,
)

EXAMPLE_CSV = """Given Name,Family Name,Age,Sex,Customer ID
Gerald ,Hampton,82,Male,2582GABK
Yuuwa,Miyake,270,male,7951WVLW
Edyta,Majewska ,50,Female,775ANSID
"""

GOLDEN = [
    '{row: 0, column: "Given Name"}: "Gerald " contains trailing whitespace',
    '{row: 1, column: "Age"}: "270" was not in the range [0, 120)',
    '{row: 1, column: "Sex"}: "male" is not in the list of legal options (Male, Female, Other)',
    '{row: 2, column: "Family Name"}: "Majewska " contains trailing whitespace',
    '{row: 2, column: "Customer ID"}: "775ANSID" does not match the pattern "\\d{4}[A-Z]{4}"',
]


def _example_schema():
    return Schema([
        Column("Given Name", [LeadingWhitespaceValidation(), TrailingWhitespaceValidation()]),
        Column("Family Name", [LeadingWhitespaceValidation(), TrailingWhitespaceValidation()]),
        Column("Age", [InRangeValidation(0, 120)]),
        Column("Sex", [InListValidation(["Male", "Female", "Other"])]),
        Column("Customer ID", [MatchesPatternValidation(r"\d{4}[A-Z]{4}")]),
    ])


def test_csv_golden_end_to_end(spark, tmp_path):
    p = tmp_path / "people.csv"
    p.write_text(EXAMPLE_CSV)
    df = read_csv_with_ordinal(spark, str(p))
    assert "row_ord" in df.columns
    cols = [c for c in df.columns if c != "row_ord"]
    ws = _example_schema().validate(df, columns=cols, row_key="row_ord").collect_warnings()
    assert [str(w) for w in ws] == GOLDEN


def test_csv_ordinal_is_read_order(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("v\n" + "\n".join("r{}".format(i) for i in range(50)) + "\n")
    rows = read_csv_with_ordinal(spark, str(p)).orderBy("row_ord").collect()
    assert [r["v"] for r in rows] == ["r{}".format(i) for i in range(50)]
    assert [r["row_ord"] for r in rows] == list(range(50))


def test_jsonl_with_ordinal(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"age": 5}\n{"age": 200}\n{"age": 30}\n')
    df = read_jsonl_with_ordinal(spark, str(p))
    schema = Schema([Column("age", [InRangeValidation(0, 120)])])
    ws = schema.validate(df, columns=["age"], row_key="row_ord").collect_warnings()
    assert len(ws) == 1 and ws[0].row == 1 and ws[0].value == "200"


def test_multifile_csv_ordinal_is_filename_order(spark, tmp_path):
    """Spark orders scan splits by SIZE descending, not filename — the
    file-aware ordinal must still assign (file path asc, row-in-file)
    order, for equal AND unequal file sizes. Regression for the raw
    with_row_index behavior (largest-file-first ordinals)."""
    def write(fn, lo, hi):
        (tmp_path / fn).write_text(
            "i\n" + "".join("{}\n".format(j) for j in range(lo, hi)))

    write("a-000.csv", 0, 100)
    write("a-001.csv", 100, 400)   # bigger: Spark would scan it FIRST
    write("a-002.csv", 400, 450)
    rows = read_csv_with_ordinal(spark, str(tmp_path)).orderBy("row_ord").collect()
    assert [int(r["i"]) for r in rows] == list(range(450))
    assert [r["row_ord"] for r in rows] == list(range(450))


def test_multifile_csv_ordinal_split_files(spark, tmp_path):
    """A file large enough to split into multiple scan chunks keeps
    within-file byte order (stable length sort)."""
    n = 5000
    (tmp_path / "big.csv").write_text(
        "i\n" + "".join("{:08d}\n".format(j) for j in range(n)))
    small = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
        rows = read_csv_with_ordinal(spark, str(tmp_path)) \
            .orderBy("row_ord").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", small)
    assert [int(r["i"]) for r in rows] == list(range(n))
