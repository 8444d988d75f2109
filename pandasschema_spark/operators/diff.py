"""Cross-run validation regression: diff two violation sets.

Engine extension (no reference analog — SURVEY.md §2.5). The CI question
a validation engine ultimately serves: after a pipeline change, which
violations are NEW and which RESOLVED versus the previous run? A raw
row-count comparison hides churn (1000 fixed + 1000 introduced reads as
"no change"); the keyed diff does not.

Scale shape: both sides reduce to their DISTINCT key projections first
(map-side combined), then two LEFT ANTI joins on the key columns —
shuffle carries violation KEYS, never messages/values. Keys compare
null-safely: a NULL in a key column (e.g. the frame-level row=-1
warnings) must match itself across runs, not read as forever-new AND
forever-resolved (plain equi-join NULL semantics would do exactly that).
"""

from __future__ import annotations

import functools
import typing

from pyspark.sql import DataFrame, functions as F


def violations_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: typing.Sequence[str] = ("row", "column", "check_id"),
) -> DataFrame:
    """(key_cols..., status) — one row per violation key present in only
    one run: status='new' (in ``new`` only: the regressions) or
    'resolved' (in ``old`` only: the fixes). Keys present in both runs
    are unchanged and not emitted."""
    keys = list(key_cols)
    o = old.select(*keys).distinct()
    n = new.select(*keys).distinct()

    def anti(left: DataFrame, right: DataFrame) -> DataFrame:
        r = right.select(*[F.col(k).alias("__r_" + k) for k in keys])
        cond = functools.reduce(
            lambda a, b: a & b,
            [left[k].eqNullSafe(F.col("__r_" + k)) for k in keys])
        return left.join(r, cond, "left_anti")

    newly = anti(n, o).withColumn("status", F.lit("new"))
    resolved = anti(o, n).withColumn("status", F.lit("resolved"))
    return newly.unionByName(resolved)
