"""Declarative row-local auto-repair (the fix-side complement of quarantine).

Engine extension (no reference analog — SURVEY.md §2.5). PandasSchema
stops at reporting violations; a 100 TB ingest pipeline also needs the
boring-but-safe fixes applied in bulk: strip stray whitespace, clamp
out-of-range numerics, canonicalize case against a closed list, null out
values that cannot parse. Each rule is a pure row-local expression, so
the entire repair pass is ONE codegen projection fused into the scan —
zero shuffle, no UDF — and the audit summary (how many cells each rule
touched) is ONE map-side-combined aggregate row over the same staged
expressions. Repairs are idempotent by construction: re-running a rule
on its own output applies zero changes (pytest-locked).

Deliberately NOT here: cross-row repairs (dedup keeps, imputation from
group statistics) — those are their own operators with their own shuffle
shapes (keep_latest, winsorized_sum_by); mixing them into a row-local
pass would hide an exchange behind a "fix" flag.
"""

from __future__ import annotations

import dataclasses
import typing

from pyspark.sql import Column as SparkColumn, DataFrame, functions as F

_KINDS = ("trim", "clamp", "case_to_list", "null_if_no_match")


@dataclasses.dataclass(frozen=True)
class RepairRule:
    """One row-local fix on one column.

    kind:
      - ``trim``: strip leading+trailing spaces (Spark ``trim`` and
        DuckDB ``trim`` agree on the space-only default).
      - ``clamp``: pull numerics into ``[lo, hi]`` (both inclusive —
        unlike InRangeValidation's half-open *detection* interval, a
        repair needs a representable target value).
      - ``case_to_list``: rewrite a value whose lowercase form matches a
        closed-list entry's lowercase form to that entry's canonical
        casing (case-insensitive collisions in the list raise).
      - ``null_if_no_match``: null out non-null values not fully
        matching ``pattern`` (anchored; Java-regex/RE2 intersection —
        same contract as the coercion profile).
    NULL input is never "repaired" by any rule (nothing to fix;
    missing-ness is the notnull check's finding, not repair's).
    """

    column: str
    kind: str
    lo: typing.Optional[float] = None
    hi: typing.Optional[float] = None
    allowed: typing.Optional[typing.Tuple[str, ...]] = None
    pattern: typing.Optional[str] = None

    def __post_init__(self) -> None:
        if self.kind not in _KINDS:
            raise ValueError("unknown repair kind: {!r}".format(self.kind))
        if self.kind == "clamp":
            import math

            if self.lo is None or self.hi is None or self.lo > self.hi:
                raise ValueError("clamp needs lo <= hi")
            if not (math.isfinite(self.lo) and math.isfinite(self.hi)):
                # a NaN bound passes lo > hi (NaN compares False) and then
                # greatest/least return NaN for EVERY row (Spark orders
                # NaN above all values) — the 'safe fix' destroys the column
                raise ValueError("clamp bounds must be finite")
        if self.kind == "case_to_list":
            if not self.allowed:
                raise ValueError("case_to_list needs a non-empty allowed list")
            lowers = [str(a).lower() for a in self.allowed]
            if len(set(lowers)) != len(lowers):
                raise ValueError("case_to_list allowed entries collide case-insensitively")
        if self.kind == "null_if_no_match" and not self.pattern:
            raise ValueError("null_if_no_match needs a pattern")

    @property
    def name(self) -> str:
        return "{}:{}".format(self.column, self.kind)


def _fix_expr(rule: RepairRule, c: SparkColumn, dtype=None) -> SparkColumn:
    """The repaired value of input expression ``c`` under ``rule``.
    ``dtype`` (the column's Spark type, when known) keeps clamp
    TYPE-PRESERVING: bare double literals would coerce an int/float
    column to double and silently change the output schema."""
    if rule.kind == "trim":
        return F.when(c.isNull(), c).otherwise(F.trim(c))
    if rule.kind == "clamp":
        lo, hi = F.lit(rule.lo), F.lit(rule.hi)
        if dtype is not None:
            lo = lo.cast(dtype)
            hi = hi.cast(dtype)
        return F.when(c.isNull(), c).otherwise(
            F.greatest(F.least(c, hi), lo)
        )
    if rule.kind == "case_to_list":
        fixed = c
        for a in rule.allowed:
            fixed = F.when(
                c.isNotNull() & (F.lower(c) == F.lit(str(a).lower())), F.lit(str(a))
            ).otherwise(fixed)
        return fixed
    # null_if_no_match
    return F.when(
        c.isNotNull() & ~c.rlike("^(?:{})$".format(rule.pattern)),
        F.lit(None).cast("string"),
    ).otherwise(c)


def _applied_pred(rule: RepairRule, c: SparkColumn, fixed: SparkColumn) -> SparkColumn:
    """True where the rule changes the stored value of ``c``."""
    if rule.kind == "null_if_no_match":
        return c.isNotNull() & fixed.isNull()
    return c.isNotNull() & (c != fixed)


def _check_rules(df: DataFrame, rules: typing.Sequence[RepairRule]) -> None:
    if not rules:
        raise ValueError("rules must be non-empty")
    seen: typing.Set[str] = set()
    for r in rules:
        if r.name in seen:
            raise ValueError("duplicate rule {!r}".format(r.name))
        seen.add(r.name)
        if r.column not in df.columns:
            raise ValueError("no such column: {!r}".format(r.column))
        dt = df.schema[r.column].dataType
        from pyspark.sql import types as T

        if r.kind == "clamp":
            integral = isinstance(dt, (T.ByteType, T.ShortType,
                                       T.IntegerType, T.LongType))
            if integral and not (
                    float(r.lo).is_integer() and float(r.hi).is_integer()):
                raise ValueError(
                    "clamp on integral column {!r} needs integer bounds "
                    "(got lo={}, hi={}) — fractional bounds would widen "
                    "the column to double".format(r.column, r.lo, r.hi))
        if r.kind in ("trim", "case_to_list", "null_if_no_match") and not isinstance(
                dt, T.StringType):
            raise ValueError(
                "{} repairs strings; column {!r} is {} — an implicit cast "
                "would silently change the output schema".format(
                    r.kind, r.column, dt.simpleString()))


def _staged(
    rules: typing.Sequence[RepairRule],
    dtypes: typing.Optional[typing.Dict[str, object]] = None,
) -> typing.List[typing.Tuple[RepairRule, SparkColumn, SparkColumn]]:
    """(rule, input_expr, fixed_expr) per rule, where rule i's input is
    the previous rule's output on the same column (spec order — a
    trim-then-clamp spec composes the way a human reads it)."""
    current: typing.Dict[str, SparkColumn] = {}
    out = []
    for r in rules:
        c = current.get(r.column, F.col(r.column))
        fixed = _fix_expr(r, c, (dtypes or {}).get(r.column))
        current[r.column] = fixed
        out.append((r, c, fixed))
    return out


def repair(df: DataFrame, rules: typing.Sequence[RepairRule]) -> DataFrame:
    """The repaired frame: every rule applied in one row-local
    projection; untouched columns pass through unchanged."""
    _check_rules(df, rules)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    final: typing.Dict[str, SparkColumn] = {}
    for r, _c, fixed in _staged(rules, dtypes):
        final[r.column] = fixed
    return df.select(
        *[final[c].alias(c) if c in final else F.col(c) for c in df.columns]
    )


def repair_summary(df: DataFrame, rules: typing.Sequence[RepairRule]) -> DataFrame:
    """(rule, column, n_rows, n_applied) per rule — the audit row a
    repair run must publish. ONE map-side-combined agg row over the same
    staged expressions :func:`repair` applies, long form via a row-local
    struct explode; O(rules) output."""
    _check_rules(df, rules)
    stages = _staged(rules, {f.name: f.dataType for f in df.schema.fields})
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (r, c, fixed) in enumerate(stages):
        aggs.append(
            F.sum(F.when(_applied_pred(r, c, fixed), 1).otherwise(0)).alias(
                "__a{}".format(i)
            )
        )
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.lit(r.column).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            F.coalesce(F.col("__a{}".format(i)), F.lit(0))
            .cast("long")
            .alias("n_applied"),
        )
        for i, (r, _c, _f) in enumerate(stages)
    ]
    return row.select(F.explode(F.array(*structs)).alias("v")).select(
        "v.rule", "v.column", "v.n_rows", "v.n_applied"
    )
