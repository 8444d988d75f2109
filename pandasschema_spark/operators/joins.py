"""Skew-resistant joins: salted replication for medium dimensions.

Engine extension (no reference analog — SURVEY.md §2.5). The three join
regimes at 10^12 rows:

1. dim broadcastable        -> broadcast hash join (referential.py)
2. dim huge                 -> bloom screen + shuffle anti-join
                               (referential.py bloom_screen_violations)
3. dim medium + fact SKEWED -> THIS: a plain shuffle join sends every
   fact row with hot key K to ONE reducer; salting splits K's rows
   across ``salt_buckets`` reducers by extending the join key with a
   row-local salt and replicating the (small-enough) dim row once per
   bucket.

AQE's skew-join handles sort-merge skew when splits are detectable at
runtime; explicit salting is the deterministic, planner-independent
form — and the only one that also fixes the downstream
aggregate-on-the-same-key stage, since the salt can be kept through it
(partial agg per (key, salt), final per key).

The salt must be row-local and spread WITHIN each key; it need NOT be
deterministic across runs for correctness (any assignment yields the
same join result). Default: ``monotonically_increasing_id() mod
salt_buckets`` — O(1) per row regardless of row width (hashing every
fact column would push each row's full payload bytes through the hash
just to pick a bucket). Pass ``salt_cols`` for a content-derived salt
when run-to-run stable task placement matters more.
"""

from __future__ import annotations

import typing

from pyspark.sql import DataFrame, functions as F

DEFAULT_SALT_BUCKETS = 16


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
    salt_cols: typing.Optional[typing.Sequence[str]] = None,
) -> DataFrame:
    """``fact.join(dim, on, how)`` with the fact side's hot keys spread
    over ``salt_buckets`` reducers. ``on`` must be a single equi-join
    column present in both frames (the common fact->dim case);
    ``how`` in ('inner', 'left'): semantics where dim-side multiplicity
    passes through replication unchanged.

    Cost model: dim shuffles salt_buckets-fold (pick salt_buckets ~
    hot-key-rows / target-rows-per-task, small — 16-64), fact shuffles
    once; versus the unsalted plan where the hottest key's entire row
    set lands on one task. The join result is EXACTLY the plain join —
    the oracle-gated query proves it."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    fact_cols = [c for c in fact.columns]
    dim_cols = [c for c in dim.columns if c != on]
    if salt_cols is not None:
        salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]),
                      F.lit(salt_buckets))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    f = fact.withColumn("__salt__", salt)
    d = dim.withColumn(
        "__salt__",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    joined = f.join(d, [on, "__salt__"], how)
    return joined.select(*fact_cols, *dim_cols)
