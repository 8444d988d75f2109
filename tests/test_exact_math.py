"""functions.exact: the cross-engine floor-division bridge.

Spark's ``F.floor(decimal / decimal)`` rounds the scale-6 quotient
HALF_UP **before** floor — it is NOT DuckDB's ``//``. Measured:
floor(1333336e6 / 2000003) = 666667 in Spark vs 666666 everywhere else.
These tests pin the helper to true floor division and lint the operator
sources so the banned pattern cannot creep back.
"""

import pathlib
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from pandasschema_spark.functions.exact import floor_div, ppm

OPS = pathlib.Path(__file__).resolve().parents[1] / "pandasschema_spark"


def _fd(spark, num: int, den: int) -> int:
    r = (spark.range(1)
         .select(floor_div(F.lit(str(num)).cast("decimal(38,0)"),
                           F.lit(str(den)).cast("decimal(38,0)"))
                 .alias("q")).collect()[0])
    return r["q"]


def test_floor_div_boundary_matches_python_and_duckdb(spark):
    # the exact case where F.floor(dec/dec) diverges (frac = .9999995)
    num, den = 1333336 * 1_000_000, 2000003
    assert _fd(spark, num, den) == num // den == 666666
    assert duckdb.sql(
        "select 1333336::HUGEINT*1000000//2000003").fetchone()[0] == 666666
    # and prove the naive spark form really is wrong, so this test fails
    # loudly if a Spark upgrade silently fixes the semantics (at which
    # point the helper can retire)
    naive = (spark.range(1)
             .select(F.floor(F.lit(str(num)).cast("decimal(38,0)")
                             / F.lit(str(den)).cast("decimal(38,0)"))
                     .cast("long").alias("q")).collect()[0]["q"])
    assert naive == 666667, "Spark decimal division semantics changed"


@pytest.mark.parametrize("num,den", [
    (0, 7), (6, 7), (7, 7), (8, 7), (10**30, 10**12 + 7), (123, 1),
    ((1 << 62), 3),
])
def test_floor_div_grid(spark, num, den):
    assert _fd(spark, num, den) == num // den


def test_ppm_helper(spark):
    r = (spark.range(1)
         .select(ppm(F.lit(1).cast("decimal(38,0)"),
                     F.lit(3).cast("decimal(38,0)")).alias("p"))
         .collect()[0])
    assert r["p"] == 333333


def test_no_floor_of_decimal_division_in_operators():
    """Source lint: every remaining F.floor( in operators/ must be the
    documented quantize-first DOUBLE idiom (floor(x * 1e6) / isqrt /
    double histogram bucketing) — never a decimal/decimal quotient."""
    allowed = {
        # (file, substring that proves the double idiom)
        "drift.py": ('F.floor((F.col(column) - F.lit(lo)) / F.lit(width))',
                     'F.floor(F.col("__v__").cast("double")'),
        "similarity.py": ("F.floor(n2 * 1e6)",
                          'F.floor(F.col("__v__").cast("double")'),
        "sampling.py": ("F.floor(F.sqrt(x.cast(\"double\")))",),
    }
    for p in sorted((OPS / "operators").glob("*.py")):
        src = p.read_text()
        for m in re.finditer(r"F\.floor\(", src):
            line_start = src.rfind("\n", 0, m.start()) + 1
            ctx = src[line_start:m.end() + 120]
            if ctx.lstrip().startswith("#"):
                continue
            ok = any(a in src and a in src[m.start() - 40:m.end() + 160]
                     for a in allowed.get(p.name, ()))
            assert ok, (
                "unvetted F.floor in {}: {!r} — decimal/decimal quotients "
                "must ride functions.exact.floor_div".format(p.name, ctx[:100]))
