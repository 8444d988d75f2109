"""Deterministic content-hash sampling and train/val/test splits.

Engine extension (no reference analog — SURVEY.md §2.5). Training-data
pipelines need samples that are (a) reproducible across runs and
engines, (b) stable under repartitioning and appends, and (c) cheap at
10^12 rows. ``df.sample()`` gives none of these (seeded per-partition
RNG: the sample changes whenever partitioning does). Hashing the ROW
KEY gives all three: a row's split membership is a pure function of its
id, so late-arriving data lands in the same splits and two engines
agree row-for-row (the DuckDB oracle reproduces the exact sample).

Mechanism: bucket = md5-derived 32-bit integer of the id (same
conv(substr(md5)) primitive the dedup stack uses) modulo ``denom``.
A row is in-sample iff bucket < frac*denom. Zero shuffles — the filter
is a row-local codegen projection that fuses into the scan, so a 1%
sample of 100 TB reads as a pushed-down scan + filter, and downstream
ops see ordinary DataFrames.
"""

from __future__ import annotations

import math
import typing

from pyspark.sql import Column, DataFrame, Window, functions as F

DEFAULT_DENOM = 1_000_000


def hash_bucket_expr(key: Column, denom: int = DEFAULT_DENOM,
                     salt: str = "") -> Column:
    """Uniform integer in [0, denom): first 8 md5 hex chars of
    (salt || key) parsed base-16, mod denom. Engine-portable — DuckDB:
    CAST(concat('0x', substr(md5(salt || key), 1, 8)) AS BIGINT) % denom."""
    h = F.md5(F.encode(F.concat(F.lit(salt), key.cast("string")), "UTF-8"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % denom)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    *,
    salt: str = "",
    denom: int = DEFAULT_DENOM,
) -> DataFrame:
    """Rows whose hash bucket falls below ``fraction`` — reproducible,
    repartition-proof, append-stable. ``salt`` decorrelates independent
    samples over the same keys. The threshold rounds HALF-UP (never
    truncates, never banker's-rounds): float fractions like 0.29 are
    sub-integer BELOW their decimal value (0.29*1e6 = 289999.99..., so
    int() would shave a bucket off), while Python round()'s half-to-even
    would turn an exactly-representable half-bucket fraction (0.0000005
    with denom=1e6) into an EMPTY sample instead of one bucket.

    NULL ids are never sampled — even at fraction 1.0 — because a NULL
    key has no stable identity to hash (the head_per_group contract;
    the NULL bucket is NULL and NULL < thr filters SQL-false). The same
    rule holds for stratified_sample and weighted_sample."""
    return df.where(
        hash_bucket_expr(F.col(id_col), denom, salt)
        < math.floor(fraction * denom + 0.5))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: typing.Dict[typing.Any, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
    denom: int = DEFAULT_DENOM,
) -> DataFrame:
    """Per-stratum deterministic sampling: each row keeps/drops by the
    SAME md5-bucket rule as ``deterministic_sample`` but against its
    stratum's fraction (strata not listed get ``default_fraction``).
    The workhorse for rebalancing skewed training mixes (downsample the
    dominant language, keep all of the rare one) while staying
    reproducible, repartition-proof and append-stable. Still a
    row-local codegen filter fused into the scan — zero shuffles; the
    per-stratum threshold is a CASE over ``fractions`` (broadcast that
    map via a join instead if it has millions of entries)."""
    bucket = hash_bucket_expr(F.col(id_col), denom, salt)
    thr = F.lit(math.floor(default_fraction * denom + 0.5))
    for value, frac in fractions.items():
        thr = F.when(F.col(strata_col) == value,
                     F.lit(math.floor(frac * denom + 0.5))).otherwise(thr)
    return df.where(bucket < thr)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_ppm,
    *,
    salt: str = "",
    denom: int = DEFAULT_DENOM,
) -> DataFrame:
    """Per-row deterministic importance sampling: keep a row iff its
    hash bucket falls below the row's OWN keep-probability
    ``weight_ppm`` (an integer column/expression in parts-per-denom,
    clamped to [0, denom]) — the quality-weighted mixture sampler a
    training-data pipeline uses to keep high-scoring documents at full
    rate and downsample the tail, generalizing ``stratified_sample``
    from per-stratum constants to a per-row weight.

    Same guarantees as the rest of the family: reproducible across
    runs/engines, repartition-proof, append-stable (membership is a
    pure function of id and weight), and a zero-shuffle row-local
    codegen filter fused into the scan. Expected kept fraction is
    ``avg(weight_ppm)/denom`` but each row's inclusion is individually
    deterministic — rerunning never flips a row. NULL weights drop the
    row (an unscored row has no defensible keep rate; coalesce
    upstream to choose one)."""
    w = F.col(weight_ppm) if isinstance(weight_ppm, str) else weight_ppm
    # explicit NULL guard: Spark's least/greatest SKIP nulls (they pick
    # the least non-null), so a bare clamp would keep NULL-weight rows
    # at full rate instead of dropping them
    thr = F.when(w.isNull(), F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(denom), w.cast("long"))))
    return df.where(
        hash_bucket_expr(F.col(id_col), denom, salt) < thr)


def assign_splits(
    df: DataFrame,
    id_col: str,
    splits: typing.Dict[str, float],
    *,
    salt: str = "",
    denom: int = DEFAULT_DENOM,
    split_col: str = "split",
) -> DataFrame:
    """Add a split label ('train'/'val'/'test'/...) from contiguous hash
    ranges; fractions must sum to <= 1 (remainder labeled NULL so a
    holdout is explicit, not silent). Dict insertion order fixes the
    range layout, so the assignment is stable for a given spec.

    Range widths ROUND HALF-UP rather than truncate — int(0.29*denom)
    loses a bucket to float representation and would silently NULL-label
    keys even when fractions sum to exactly 1 (and round()'s half-to-even
    would zero out an exact half-bucket fraction). Fractions that do not
    quantize to 1/denom multiples can still leave a <=len(splits)-bucket
    rounding residue labeled NULL (e.g. three 1/3 splits over 1e6
    buckets leave buckets 999999+)."""
    if any(f < 0 for f in splits.values()):
        # a negative fraction walks `hi` backwards, silently overlapping
        # earlier ranges (and fools the sum check) — fail fast
        raise ValueError("split fractions must be non-negative: {}".format(splits))
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError("split fractions sum to {} > 1".format(total))
    bucket = hash_bucket_expr(F.col(id_col), denom, salt)
    expr = F.lit(None).cast("string")
    hi = 0
    cases = []
    for name, frac in splits.items():
        lo, hi = hi, hi + math.floor(frac * denom + 0.5)
        cases.append((lo, hi, name))
    for lo, hi_b, name in reversed(cases):
        expr = F.when((bucket >= lo) & (bucket < hi_b), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def _md5_order_key(id_col: str) -> Column:
    """The deterministic rank key head_per_group AND quota_sample order
    by (md5 of the id's string rendering) — one definition, so the two
    samplers and their DuckDB oracle replays can never desynchronize
    (the window_fingerprints / _banded_sigs shared-rule convention)."""
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def head_per_group(
    df: DataFrame,
    group_cols: typing.Sequence[str],
    k: int,
    id_col: str,
) -> DataFrame:
    """Deterministic k examples per group: the rows whose
    ``md5(id)`` sorts first within each group — "show me 3 documents
    per language" for eyeballing, goldens, and per-class few-shot
    pools. Same-input stability is the point: unlike ``df.sample`` or
    a rand() order, the selection is a pure function of the data, so
    reruns, retries and both engines agree row-for-row.

    Returns the input columns plus ``rk`` (1-based rank within the
    group). The md5 order key decorrelates the pick from ingestion
    order and from the id's own ordering; ties are impossible (md5 of
    distinct ids). NULL ids sort deterministically too (md5 of NULL is
    NULL -> nulls first in both engines... excluded instead: a NULL id
    row is dropped, document ids are required).

    Scale shape: one exchange on the group key + per-group sort. A hot
    group sorts in one task; when group row counts are unbounded,
    pre-filter row-locally with an md5 threshold sized from approximate
    group counts (keep ~16k candidates per group), then rank exactly —
    the two-phase form keeps the sort bounded without changing the
    selected set."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(*group_cols).orderBy(_md5_order_key(id_col))
    return (df.where(F.col(id_col).isNotNull())
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .withColumn("rk", F.col("rk").cast("long")))


def _isqrt_expr(x: Column) -> Column:
    """Exact integer sqrt of a nonnegative BIGINT column, in-plan.

    floor(sqrt(double)) is within +/-1 of the true isqrt for any int64
    (IEEE-754 sqrt is correctly rounded; the double conversion of x
    costs at most 1 ulp), so one symmetric adjustment — subtract 1 while
    s^2 > x, add 1 while (s+1)^2 <= x — lands exactly, in BOTH engines,
    regardless of which way either rounds. The squaring compares run in
    decimal(38,0): s ~ 3e9 near int64 max, s^2 ~ 9.2e18 sits on the
    int64 edge."""
    s = F.floor(F.sqrt(x.cast("double"))).cast("long")
    d = s.cast("decimal(38,0)")
    s = s - F.when(d * d > x.cast("decimal(38,0)"), F.lit(1)).otherwise(0)
    d = s.cast("decimal(38,0)")
    s = s + F.when((d + 1) * (d + 1) <= x.cast("decimal(38,0)"), F.lit(1)).otherwise(0)
    return s.cast("long")


def temperature_weights(
    df: DataFrame,
    col,
    *,
    sqrt_steps: int = 1,
    denom: int = 1_000_000,
) -> DataFrame:
    """Temperature-resampled cohort weights — the multilingual-LLM
    "sample languages at T" policy (weight ∝ count^(1/T), T = 2^steps)
    in exact integers: per value of ``col``, (value, n_rows, raw_ppm,
    weight, weight_ppm) where ``weight = floor(n_rows^(1/2^steps))``
    via repeated exact isqrt (floor(sqrt(floor(sqrt(x)))) IS
    floor(x^(1/4)) — the floor-composition identity) and the ppm pair
    shows the flattening: raw_ppm is the natural share, weight_ppm the
    share after resampling. Feeds ``weighted_sample`` / quota planners
    directly; the irrational general-alpha form is deliberately out of
    scope (the repo's rational-statistics rule — p^(1/T) for other T
    does not cross engines bit-exactly).

    Scale shape: one map-side-combined count agg to O(values) rows;
    isqrt, totals (a broadcast single-row agg, the class_balance
    pattern) and both ppm divisions are arithmetic over that aggregate
    frame. NULLs excluded from counts and totals (SQL aggregate
    semantics). ppm outputs bounded <= 1e6, int64-safe at any scale.
    """
    if sqrt_steps < 1:
        raise ValueError("sqrt_steps must be >= 1")
    if denom < 1:
        raise ValueError("denom must be >= 1")
    v = F.col(col) if isinstance(col, str) else col
    counts = (df.select(v.alias("value")).where(F.col("value").isNotNull())
              .groupBy("value").agg(F.count(F.lit(1)).alias("n_rows")))
    w = F.col("n_rows")
    for _ in range(sqrt_steps):
        w = _isqrt_expr(w)
    weighted = counts.select("value", "n_rows", w.alias("weight"))
    # totals via whole-frame window sums, NOT a crossJoin(broadcast(agg)):
    # the agg form embeds the counts subtree twice, and because callers
    # compose this frame onward (apportion_budget -> quota_sample), each
    # duplication MULTIPLIES downstream — pipeline_quota_sample's plan
    # carried 17 scans of the events parquet before this change. The
    # window runs on the O(values) aggregate (bounded cohort table), the
    # same scale argument as apportion_budget's unpartitioned row_number.
    w_all = Window.partitionBy()
    totaled = weighted.withColumn(
        "__tn__", F.sum(F.col("n_rows").cast("decimal(38,0)")).over(w_all)
    ).withColumn(
        "__tw__", F.sum(F.col("weight").cast("decimal(38,0)")).over(w_all))

    def ppm(num: str, tot: str) -> str:
        # decimal(38) multiply + even-division floor split: the int64
        # form (n_rows * denom) overflows past 2^63/denom rows — under
        # default ANSI that is a query-killing ARITHMETIC_OVERFLOW, with
        # ANSI off a silent negative wrap. Result is <= denom, long-safe.
        bw = "CAST({} AS decimal(38,0)) * {}".format(num, int(denom))
        return ("CAST(({bw} - pmod({bw}, {t})) / {t} AS long)"
                .format(bw=bw, t=tot))

    return (totaled
            .select(
                "value",
                "n_rows",
                F.expr(ppm("n_rows", "__tn__")).alias("raw_ppm"),
                "weight",
                F.expr(ppm("weight", "__tw__")).alias("weight_ppm"),
            ))


def apportion_budget(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment — the data-mixing
    step between ``temperature_weights`` and a training run: split an
    integer token/row ``budget`` across cohorts EXACTLY proportionally
    to integer weights, with ``sum(quota) == budget`` guaranteed (the
    property floor-division alone breaks: floors under-allocate by up
    to n_cohorts-1, and "just round" over- or under-shoots). Per
    cohort: quota = floor(budget * w / W) plus one extra for the L
    cohorts with the largest remainders, L = budget - sum(floors),
    ties broken by value ascending (deterministic, the ids-decide-ties
    house rule; a zero remainder never receives — L < n_cohorts by
    construction). Output (value, weight, quota, quota_ppm) with
    quota_ppm = floor(quota * 1e6 / budget).

    Input contract: ONE row per cohort (the ``temperature_weights``
    output shape), non-negative weights, total weight > 0 — this
    operates on an already-aggregated frame, never the corpus.

    Exactness: budget * weight runs in decimal(38,0); the floor
    quotient is (bw - pmod(bw, W)) / W — multiplication and pmod are
    exact on decimals and the division divides EVENLY, so no rounding
    step ever sees a near-boundary quotient (the floor(a/b)-on-scaled-
    decimals trap the time-bucket rule documents); verified across the
    int64 edge against DuckDB HUGEINT // in tests. Envelope: budget and
    every quota fit int64 (the literal and the output column are
    BIGINT — guarded), and budget * W < 10^38 keeps the intermediate
    exact in decimal(38,0).

    Scale shape: O(cohorts) rows throughout — total weight, leftover
    count and the row_number rank all ride ONE unpartitioned window
    (single-partition exchange shared by all three), deliberate and
    safe because the frame is the COHORT table (languages, sources,
    event types), never row-scale data; the corpus-sized work happened
    upstream in whatever built the weights. Whole-frame windows rather
    than crossJoin(broadcast(agg)) so the input subtree is planned
    ONCE — composed pipelines (temperature -> apportion -> quota)
    otherwise replay the corpus aggregation per total.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if budget > (1 << 63) - 1:
        # F.lit cannot encode past int64 (NumberFormatException deep in
        # py4j) and the quota output column is BIGINT — refuse up front
        raise ValueError("budget must fit int64 (got {})".format(budget))
    # Eager weight-domain guard (cheap by contract: the input is the
    # O(cohorts) aggregate frame, never the corpus). Without it an
    # all-zero total makes pmod(bw, 0) / the decimal division yield
    # NULL quotas SILENTLY, and a negative weight corrupts the
    # largest-remainder ordering — fail fast instead.
    # The guard MUST see the weights through the SAME decimal(38,0)
    # cast the computation uses (cast('long') truncates -0.5 to 0 and
    # would wave a fractional negative through), and NULL weights must
    # fail here too (min/sum skip NULLs — the silent-NULL-quota hole
    # this guard exists to close).
    chk = df.agg(
        F.min(F.col(weight_col).cast("decimal(38,0)")).alias("__wmin__"),
        F.sum(F.col(weight_col).cast("decimal(38,0)")).alias("__wsum__"),
        F.count(F.lit(1)).alias("__n__"),
        F.count(F.col(weight_col)).alias("__nw__"),
    ).collect()[0]
    if chk["__n__"] != chk["__nw__"]:
        raise ValueError("apportion_budget: weights must be non-NULL")
    if chk["__wmin__"] is not None and chk["__wmin__"] < 0:
        raise ValueError("apportion_budget: weights must be non-negative")
    if chk["__wsum__"] is None or chk["__wsum__"] <= 0:
        raise ValueError("apportion_budget: total weight must be > 0")
    w = F.col(weight_col).cast("decimal(38,0)")
    b = F.lit(int(budget)).cast("decimal(38,0)")
    # both totals (W, leftover L) via whole-frame window sums instead of
    # crossJoin(broadcast(agg)): the agg form embeds the input subtree
    # once per total, and this frame is usually itself an aggregation of
    # a corpus (temperature_weights) — the duplications multiplied into
    # 17 parquet scans in pipeline_quota_sample's plan. The frame is the
    # O(cohorts) table by contract, same scale argument as the
    # unpartitioned row_number below; all three windows share one
    # single-partition exchange.
    w_all = Window.partitionBy()
    base_frame = df.select(
        F.col(value_col).alias("value"),
        F.col(weight_col).cast("long").alias("weight"),
        (b * w).alias("__bw__"))
    q = (base_frame.withColumn(
            "__w__", F.sum(F.col("weight").cast("decimal(38,0)")).over(w_all))
         .select(
             "value", "weight",
             F.expr("CAST((__bw__ - pmod(__bw__, __w__)) / __w__ "
                    "AS decimal(38,0))").alias("__base__"),
             F.expr("pmod(__bw__, __w__)").alias("__rem__")))
    rk = F.row_number().over(
        Window.orderBy(F.col("__rem__").desc(), F.col("value").asc()))
    return (q.withColumn("__l__", F.lit(int(budget)).cast("decimal(38,0)")
                                  - F.sum("__base__").over(w_all))
            .withColumn("__rk__", rk)
            .select(
                "value", "weight",
                (F.col("__base__")
                 + F.when(F.col("__rk__") <= F.col("__l__"), F.lit(1))
                    .otherwise(F.lit(0))).cast("long").alias("quota"))
            .withColumn(
                "quota_ppm",
                # quota*1e6 can pass int64 (budget up to int64 max): the
                # same exact decimal split as the base quotient
                F.expr(
                    "CAST((CAST(quota AS decimal(38,0)) * 1000000"
                    " - pmod(CAST(quota AS decimal(38,0)) * 1000000, {b}))"
                    " / {b} AS long)".format(b=int(budget)))
                if budget > 0 else F.lit(0).cast("long")))


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    quotas: DataFrame,
    *,
    value_col: str = "value",
    quota_col: str = "quota",
) -> DataFrame:
    """Exact per-cohort quota sampling — the selection stage after
    ``apportion_budget``: within each cohort, keep the ``quota`` rows
    whose md5(id) sorts first (the ``head_per_group`` order key, so
    reruns, retries and both engines pick row-for-row the same set;
    fractional md5-bucket sampling hits a quota only in expectation —
    this hits it exactly, short only when the cohort is smaller than
    its quota). ``quotas`` is the O(cohorts) (value, quota) frame;
    cohorts absent from it — including the NULL cohort, which
    temperature_weights never emits — are unsampled by contract.
    Returns the input columns plus ``rk``.

    Scale shape: the O(cohorts) quota frame broadcasts; one exchange
    on the group key + per-group sort (the head_per_group shape, same
    hot-group note: pre-filter with an md5 threshold sized from
    approximate counts when cohorts are unbounded, then rank exactly
    — two-phase keeps the sort bounded without changing the set).
    """
    q = F.broadcast(quotas.select(
        F.col(value_col).alias(group_col),
        F.col(quota_col).alias("__q__")))
    w = Window.partitionBy(group_col).orderBy(_md5_order_key(id_col))
    return (df.where(F.col(id_col).isNotNull())
            .join(q, group_col)
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= F.col("__q__"))
            .drop("__q__")
            .withColumn("rk", F.col("rk").cast("long")))
