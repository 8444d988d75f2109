"""Order-sensitive distinctness (keep='first') at shuffle scale.

Semantics: reference ``IsDistinctValidation``
(/root/reference/pandas_schema/validation.py:351-364) =
``~series.duplicated(keep='first')`` — the first occurrence *in row order*
passes, all later occurrences fail; NaNs compare equal to each other.

Spark plan (the north star's clip_id uniqueness via hash-agg):

  stage 1  groupBy(value) -> partial+final (count, min(row_idx))
              [Spark's map-side combine pre-collapses a hot key to ONE
               partial row per map task before the shuffle — the same
               reducer-share bound an explicit (value, salt) two-phase
               aggregation bought, without shuffling the projection
               twice (for mostly-unique keys the salted stage-1 output
               was ~as large as its input)]
  filter count > 1                                    [duplicate keys only]
  broadcast join-back on value (null-safe)            [duplicates are rare;
                 falls back to shuffle join when broadcast=False]
  filter row_idx != global_min_row_idx                -> violations

A window (`row_number over partitionBy(value) orderBy(row_idx)`) expresses
the same thing but funnels every row of a hot key through one task; the
map-side-combined aggregation keeps partials bounded. The window form lives
only in tests as the semantic oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from ..plans.compiler import VIOLATION_SCHEMA, value_repr
from ..validation import is_numeric_spark_type


def duplicate_keys(df: DataFrame, value_col: str, row_col: str, salt_buckets: int = 64) -> DataFrame:
    """ONE map-side-combined aggregation -> (value, cnt, min_row) for
    cnt > 1. Spark's partial (map-side) hash aggregation already bounds
    any reducer's share of a hot key to one pre-combined row per map
    task — exactly the guarantee the earlier explicit (value, salt)
    two-phase form bought, which for the common mostly-unique key
    column meant shuffling the whole (value, ordinal) projection TWICE
    (stage-1 output ~= input rows when values are unique). One
    aggregation halves the shuffle and drops an exchange (and its AQE
    stage barrier) from every uniqueness check. ``salt_buckets`` is
    retained for API stability; partial aggregation makes an explicit
    salt redundant at every scale (a hot value pre-collapses to one
    partial row per mapper before it ever crosses the wire)."""
    del salt_buckets  # see docstring: subsumed by map-side partial agg
    base = df.select(F.col(value_col).alias("__v__"), F.col(row_col).cast("long").alias("__r__"))
    return (
        base.groupBy("__v__")
        .agg(F.count(F.lit(1)).alias("__c__"), F.min("__r__").alias("__m__"))
        .where(F.col("__c__") > 1)
    )


def distinct_violations(
    df: DataFrame,
    value_col: str,
    row_col: str,
    *,
    warn_col: str,
    message: str,
    check_id: str,
    seq: int,
    salt_buckets: int = 64,
    broadcast_dupes: bool = True,
    allow_empty: bool = False,
    verify_row_key: bool = False,
) -> DataFrame:
    """Violation rows (VIOLATION_SCHEMA) for non-first duplicates.

    CONTRACT: ``row_col`` must be unique at least among equal values —
    keep-first is keyed on min(row), so two duplicate rows sharing the
    same ordinal BOTH read as "first" and the pair is silently
    under-reported (CLAUDE.md's LINEITEM_ROW warning is exactly this
    hazard). ``verify_row_key=True`` adds a lazy guard branch that
    RAISES when any duplicate value has a tied keeper ordinal, at the
    cost of a second pruned-scan pass over the broadcast join (off by
    default: the keeper join itself assumes duplicates are rare, and a
    sound row key makes the guard a no-op)."""
    spark_type = df.schema[value_col].dataType
    dupes = duplicate_keys(df, value_col, row_col, salt_buckets)
    if broadcast_dupes:
        dupes = F.broadcast(dupes)
    base = df.select(F.col(value_col).alias("__v__"), F.col(row_col).cast("long").alias("__r__"))
    joined_all = base.join(dupes, base["__v__"].eqNullSafe(dupes["__v__"]), "inner")
    guard = None
    if verify_row_key:
        ties = (joined_all.where(F.col("__r__") == F.col("__m__"))
                .groupBy(base["__v__"].alias("__tv__"))
                .agg(F.count(F.lit(1)).alias("__kc__"))
                .where(F.col("__kc__") > 1))
        guard = ties.select(
            F.raise_error(F.concat(
                F.lit("distinct_violations: row key {!r} collides among "
                      "duplicate values (value=".format(row_col)),
                F.coalesce(F.col("__tv__").cast("string"), F.lit("NULL")),
                F.lit(", "), F.col("__kc__").cast("string"),
                F.lit(" rows tie at the keeper ordinal) — keep-first "
                      "is ill-defined; use a unique row key"),
            )).cast("long").alias("row"),
            F.lit(warn_col).alias("column"),
            F.lit(None).cast("string").alias("value"),
            F.lit(message).alias("message"),
            F.lit(check_id).alias("check_id"),
            F.lit(seq).cast("int").alias("seq"),
        )
    joined = joined_all.where(F.col("__r__") != F.col("__m__"))
    v = base["__v__"]
    if allow_empty:
        if is_numeric_spark_type(spark_type):
            joined = joined.where(v.isNotNull())
        else:
            joined = joined.where(v.isNotNull() & (F.length(v.cast("string")) > 0))
    out = joined.select(
        F.col("__r__").alias("row"),
        F.lit(warn_col).alias("column"),
        value_repr(v, spark_type).alias("value"),
        F.lit(message).alias("message"),
        F.lit(check_id).alias("check_id"),
        F.lit(seq).cast("int").alias("seq"),
    )
    if guard is not None:
        out = out.unionByName(guard)
    return out


def _payload_hash(cols) -> F.Column:
    """md5 of the column tuple with NULLs made explicit: concat_ws SKIPS
    nulls (('a', NULL) would collide with ('a',)), so each column is
    coalesced to a \\x01 sentinel first and joined on \\x00."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols]
    return F.md5(F.concat_ws("\x00", *parts))


def id_conflicts(
    df: DataFrame,
    id_col: str,
    label_cols,
    *,
    meta_cols=(),
    broadcast_dupes: bool = True,
) -> DataFrame:
    """Key-collision triage: for every id occurring more than once, count
    the DISTINCT label payloads and metadata payloads colliding under it
    — separating harmless re-ingest (``n_labels == 1``: same content
    arrived twice) from label conflicts (``n_labels > 1``: one clip_id
    carrying two different transcripts — training poison that the
    row-level uniqueness check flags but cannot characterize).

    Output ``(id, n_rows, n_labels[, n_meta])``, all BIGINT.

    Scale shape: phase 1 is the ONLY full-table shuffle — a map-side-
    combined per-id count (the same narrow hash-agg the uniqueness check
    runs), filtered to ids with >1 row, which at any sane collision rate
    is a tiny frame. Phase 2 broadcast-joins that id set back so only
    colliding rows are rehashed; phase 3 counts distinct payloads over
    the tiny conflict set with two-phase (id, hash) -> id aggregation —
    never a multi-column count_distinct (whose Expand multiplies partial
    state by rows x (n+1), the E82 rule). NULL payload values count as a
    distinct value (the \\x01 sentinel — SQL count(distinct) would skip
    them); rows with a NULL id are excluded (they are the notnull
    check's finding)."""
    label_cols = list(label_cols)
    meta_cols = list(meta_cols)
    if not label_cols:
        raise ValueError("label_cols must name at least one column")
    dups = (df.where(F.col(id_col).isNotNull())
              .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_rows"))
              .where(F.col("n_rows") > 1))
    if broadcast_dupes:
        dups = F.broadcast(dups)
    rows = df.join(dups, id_col, "inner")
    rows = rows.select(id_col, "n_rows",
                       _payload_hash(label_cols).alias("__lh__"),
                       *([_payload_hash(meta_cols).alias("__mh__")]
                         if meta_cols else []))
    labels = (rows.groupBy(id_col, "__lh__").agg(F.count(F.lit(1)))
                  .groupBy(id_col)
                  .agg(F.count(F.lit(1)).alias("n_labels")))
    out = (rows.select(id_col, "n_rows").distinct()
               .join(labels, id_col))
    if meta_cols:
        meta = (rows.groupBy(id_col, "__mh__").agg(F.count(F.lit(1)))
                    .groupBy(id_col)
                    .agg(F.count(F.lit(1)).alias("n_meta")))
        out = out.join(meta, id_col)
    return out


def distinct_violations_window_oracle(df: DataFrame, value_col: str, row_col: str) -> DataFrame:
    """Small-scale semantic spec (tests only): row_number over a window.
    NOT for production — a hot key serializes through one task."""
    from pyspark.sql import Window

    w = Window.partitionBy(value_col).orderBy(row_col)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") > 1)
        .select(F.col(row_col).cast("long").alias("row"), F.col(value_col))
    )
