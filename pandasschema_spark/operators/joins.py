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

The salt must be row-local and spread WITHIN each key — and it MUST be
deterministic per row, because it feeds a shuffle join key: a
nondeterministic salt (monotonically_increasing_id, rand) re-evaluates
differently when a map task is retried after a shuffle-fetch failure,
so reducers holding old-attempt output plus reducers that refetch can
lose or duplicate fact rows (the SPARK-23207 failure class). Default:
``pmod(hash(*all fact columns), salt_buckets)`` — content-derived, so
any retry reassigns every row to the same bucket. Pass ``salt_cols``
(e.g. a stable row-id column) to bound the hash cost on wide rows:
hashing a multi-MB binary payload column just to pick a bucket is the
one real cost of the safe default. Rows that are full duplicates share
a bucket under the default; an adversarial corpus of billions of
IDENTICAL hot-key rows would still skew — a stable row id via
``salt_cols`` is the fix there too.
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
    cols = list(salt_cols) if salt_cols is not None else list(fact.columns)
    salt = F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(salt_buckets))
    f = fact.withColumn("__salt__", salt)
    d = dim.withColumn(
        "__salt__",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    joined = f.join(d, [on, "__salt__"], how)
    return joined.select(*fact_cols, *dim_cols)
