"""jsonl_bad_records: dead-letter capture for JSONL ingestion."""

import os
import shutil

import pytest

from pandasschema_spark.sources.ingest import jsonl_bad_records

DIR = "/tmp/psf_jsonl_test"


@pytest.fixture(scope="module")
def rejects(spark):
    shutil.rmtree(DIR, ignore_errors=True)
    os.makedirs(DIR)
    lines = [
        '{"a": 1, "b": "x"}',      # 0 clean
        '{"a": 2',                  # 1 malformed (truncated)
        '{"b": "y"}',               # 2 missing a
        '{"a": null, "b": "z"}',    # 3 null a
        'not json at all',          # 4 malformed
        '{"a": "garbage", "b": "w"}',  # 5 type garbage -> whole record malformed
        '{"a": 3, "b": null}',      # 6 missing b
    ]
    with open(os.path.join(DIR, "part-000.jsonl"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    yield jsonl_bad_records(
        spark, DIR, "a INT, b STRING", required=("a", "b")
    ).collect()
    shutil.rmtree(DIR, ignore_errors=True)


def test_reject_set(rejects):
    got = sorted((r["row_ord"], r["reason"]) for r in rejects)
    assert got == [
        (1, "malformed"),
        (2, "missing:a"),
        (3, "missing:a"),
        (4, "malformed"),
        (5, "malformed"),
        (6, "missing:b"),
    ]


def test_line_payload_travels_with_reject(rejects):
    by_ord = {r["row_ord"]: r["line"] for r in rejects}
    assert by_ord[4] == "not json at all"


def test_clean_file_emits_nothing(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    assert jsonl_bad_records(spark, str(tmp_path), "a INT, b STRING",
                             required=("a", "b")).count() == 0
