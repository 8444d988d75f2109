"""Validation check library — the engine's operator set.

Semantics-parity targets (reference = /root/reference/pandas_schema):
every class here reproduces the element-wise pass/fail semantics of the
same-named reference class (validation.py:149-419) but compiles to a Spark
boolean ``Column`` — a native Catalyst expression when provably equivalent
for the input Spark type, else a vectorized Arrow ``pandas_udf`` that runs
the pandas formula on whole batches (never per-row Python at the Spark
layer).

Compilation contract
--------------------
``compile_predicate(col, spark_type) -> Column`` returns the *pass*
predicate as a null-free boolean Column (nulls coalesced to False at each
leaf, mirroring pandas masks which are NA-free after coercion). The schema
compiler inverts it, applies the ``allow_empty`` exemption
(reference validation.py:86-95) and emits violation structs.

``pandas_validate(series) -> bool Series`` is the same check expressed as
the reference's pandas formula — used inside the Arrow fallback and as the
local oracle in parity tests.
"""

from __future__ import annotations

import datetime
import math
import operator
import re
import typing

import numpy as np
import pandas as pd
from pyspark.sql import Column as SparkColumn
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .errors import PanSchArgumentError
from .validation_warning import ValidationWarning

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_NUMERIC_SPARK_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def is_numeric_spark_type(dt: T.DataType) -> bool:
    """Mirrors pandas.api.types.is_numeric_dtype for the allow_empty branch
    (reference validation.py:89): numeric + boolean dtypes take the
    null-based emptiness test; everything else the string-length test."""
    return isinstance(dt, _NUMERIC_SPARK_TYPES + (T.BooleanType,))


def _leaf(pred: SparkColumn) -> SparkColumn:
    """Null-coalesce a leaf pass-predicate to False.

    pandas leaf masks are NA-free (coercions yield False, reference
    validation.py:214, 388); Spark three-valued logic would propagate null
    through combinators, so normalize at each leaf before ~ & | compose.
    """
    return F.coalesce(pred, F.lit(False))


_JAVA_UNSAFE_RE = re.compile(
    r"\(\?P|\(\?#|\(\?\(|\\A|\\Z|\\G"   # named groups / comments / conditionals / divergent anchors
    r"|\\[wWbB]"                         # \w,\b: Python=unicode-alnum, Java even with (?U) includes
                                         # combining marks Python excludes — fuzz-caught divergence
    r"|\[\[:"                            # POSIX classes: Java syntax, Python parses as nested literals
)

#: Java flag making \d \s \p classes unicode-aware like Python's re
JAVA_UNICODE_FLAG = "(?U)"


def _java_regex_safe(pattern: str) -> bool:
    """Conservative gate: True only for patterns whose Python-re and
    (?U)-flagged Java-regex semantics coincide (no named groups, comments,
    conditionals, divergent anchors, word-boundary/word-class shorthands,
    or POSIX classes). Anything else takes the pandas fallback path.
    Equivalence is stress-tested in tests/test_regex_equivalence.py."""
    return not _JAVA_UNSAFE_RE.search(pattern)


def _pandas_udf_predicate(fn, col: SparkColumn) -> SparkColumn:
    """Wrap a Series->bool-Series pandas function as an Arrow-vectorized UDF
    pass predicate. One UDF invocation per Arrow batch — no per-row Python
    at the Spark layer (input_hint requirement)."""

    def _wrapped(s: pd.Series) -> pd.Series:
        if s.dtype == object:
            # Arrow surfaces SQL NULL as None; the reference's pandas world
            # (CSV-loaded frames) holds np.nan, whose str() is 'nan'
            # (validation.py:316 astype(str) semantics). Normalize so the
            # reference formulas see exactly what they'd see in pandas.
            na = s.isna()
            if na.any():
                s = s.copy()
                s[na] = np.nan
        out = fn(s)
        # normalize to nullable boolean for Arrow; NA -> null -> coalesced False
        return out.astype("boolean")

    udf = F.pandas_udf(_wrapped, T.BooleanType())
    return udf(col)


# ---------------------------------------------------------------------------
# base classes
# ---------------------------------------------------------------------------

class _BaseValidation:
    """Anything that can produce ValidationWarnings for a column.

    Reference: validation.py:15-28. Frame-level checks (IsDtypeValidation)
    subclass this directly and run driver-side with zero Spark jobs.
    """

    #: True when the check needs global state (a shuffle) rather than a
    #: row-local predicate — routed to pandasschema_spark.operators.*
    is_global: bool = False
    #: True for frame-level (driver-side, no per-row output) checks
    is_frame_level: bool = False


class _SeriesValidation(_BaseValidation):
    """A check defined by an element-wise boolean mask.

    Reference: validation.py:31-110. ``mode`` selects the compilation
    strategy: 'auto' (native Catalyst expr when provably equivalent for the
    input type, else Arrow pandas_udf), 'native' (force expr), 'pandas'
    (force Arrow UDF — exact reference semantics in all corner cases).
    """

    def __init__(self, message: str = None, mode: str = "auto"):
        self._custom_message = message
        if mode not in ("auto", "native", "pandas"):
            raise PanSchArgumentError("mode must be auto|native|pandas, got {!r}".format(mode))
        self.mode = mode

    # -- messages ----------------------------------------------------------
    @property
    def message(self) -> str:
        return self._custom_message or self.default_message

    @property
    def default_message(self) -> str:
        raise NotImplementedError

    # -- semantics ---------------------------------------------------------
    def pandas_validate(self, series: pd.Series) -> pd.Series:
        """Reference pandas formula; element True == pass."""
        raise NotImplementedError

    # alias matching the reference API (validation.py:54) so ported tests read naturally
    def validate(self, series: pd.Series) -> pd.Series:
        return self.pandas_validate(series)

    def spark_predicate(self, col: SparkColumn, spark_type: T.DataType):
        """Native pass-predicate, or None when no provably-equivalent
        Catalyst expression exists for this input type."""
        return None

    def compile_predicate(self, col: SparkColumn, spark_type: T.DataType) -> SparkColumn:
        if self.mode != "pandas":
            native = self.spark_predicate(col, spark_type)
            if native is not None:
                return _leaf(native)
            if self.mode == "native":
                raise PanSchArgumentError(
                    "{} has no native Spark expression for input type {}".format(
                        type(self).__name__, spark_type.simpleString()))
        return _pandas_udf_predicate(self.pandas_validate, col)

    # -- boolean algebra (reference validation.py:61-77) -------------------
    def __invert__(self):
        return _InverseValidation(self)

    def __or__(self, other: "_SeriesValidation"):
        return _CombinedValidation(self, other, operator.or_)

    def __and__(self, other: "_SeriesValidation"):
        return _CombinedValidation(self, other, operator.and_)

    # -- local (driver-side pandas) warning materialization ----------------
    def get_errors(self, series: pd.Series, column=None) -> typing.List[ValidationWarning]:
        """Eager pandas-side materialization, byte-compatible with reference
        validation.py:79-110. Used for parity tests and tiny frames; the
        Spark path goes through schema.Schema.validate instead."""
        from pandas.api.types import is_numeric_dtype

        simple = ~self.pandas_validate(series)
        allow_empty = bool(getattr(column, "allow_empty", False))
        if allow_empty:
            if isinstance(series.dtype, pd.CategoricalDtype) or is_numeric_dtype(series):
                mask = ~series.isnull() & simple
            else:
                mask = (series.str.len() > 0) & simple
        else:
            mask = simple
        mask = mask.fillna(False) if mask.dtype == object else mask
        errors = []
        for i in series.index[mask.astype(bool)]:
            errors.append(ValidationWarning(
                message=self.message, value=series[i], row=i, column=series.name))
        return errors


# ---------------------------------------------------------------------------
# combinators (reference validation.py:113-146)
# ---------------------------------------------------------------------------

class _InverseValidation(_SeriesValidation):
    """Element-wise NOT; message = wrapped message + ' <negated>'
    (reference validation.py:113-127)."""

    def __init__(self, validation: _SeriesValidation):
        self.negated = validation
        super().__init__()

    @property
    def is_global(self):
        # a wrapped global check (IsDistinct/InTable) stays global: the
        # schema compiler must route the whole combinator through the
        # whole-table plan — evaluating it per Arrow batch would make
        # answers depend on batch boundaries
        return getattr(self.negated, "is_global", False)

    @property
    def default_message(self):
        return self.negated.message + " <negated>"

    def pandas_validate(self, series):
        return ~self.negated.pandas_validate(series)

    def compile_predicate(self, col, spark_type):
        return ~self.negated.compile_predicate(col, spark_type)


class _CombinedValidation(_SeriesValidation):
    """Element-wise AND/OR of two checks; the combined pair emits ONE
    warning per failing row. Message interpolates the operator function's
    repr — a reference byte-compat quirk (validation.py:144-146)."""

    def __init__(self, validation_a, validation_b, op):
        self.operator = op
        self.v_a = validation_a
        self.v_b = validation_b
        super().__init__()

    @property
    def is_global(self):
        # global if EITHER side is (see _InverseValidation.is_global)
        return (getattr(self.v_a, "is_global", False)
                or getattr(self.v_b, "is_global", False))

    @property
    def default_message(self):
        return "({}) {} ({})".format(self.v_a.message, self.operator, self.v_b.message)

    def pandas_validate(self, series):
        return self.operator(self.v_a.pandas_validate(series), self.v_b.pandas_validate(series))

    def compile_predicate(self, col, spark_type):
        a = self.v_a.compile_predicate(col, spark_type)
        b = self.v_b.compile_predicate(col, spark_type)
        return (a | b) if self.operator is operator.or_ else (a & b)


# ---------------------------------------------------------------------------
# user-function checks (reference validation.py:149-191, 240-293)
# ---------------------------------------------------------------------------

class CustomSeriesValidation(_SeriesValidation):
    """User fn: pd.Series -> bool Series. The reference's Series contract
    (validation.py:149-169) IS the pandas-UDF contract: the same fn runs
    unchanged on Arrow batches."""

    def __init__(self, validation: typing.Callable[[pd.Series], pd.Series], message: str, **kw):
        self._validation = validation
        super().__init__(message=message, **kw)

    @property
    def default_message(self):
        return self._custom_message

    def pandas_validate(self, series):
        return self._validation(series)


class CustomElementValidation(_SeriesValidation):
    """User fn: scalar -> truthy; applied via series.apply *inside* the
    Arrow batch (reference validation.py:172-191)."""

    def __init__(self, validation: typing.Callable, message: str, **kw):
        self._validation = validation
        super().__init__(message=message, **kw)

    @property
    def default_message(self):
        return self._custom_message

    def pandas_validate(self, series):
        return series.apply(self._validation)


class CanCallValidation(_SeriesValidation):
    """Pass iff func(x) does not raise (reference validation.py:240-268)."""

    def __init__(self, func: typing.Callable, **kw):
        if not callable(func):
            raise PanSchArgumentError(
                'The object "{}" passed to CanCallValidation is not callable!'.format(func))
        self.callable = func
        super().__init__(**kw)

    @property
    def default_message(self):
        return "raised an exception when the callable {} was called on it".format(self.callable)

    def can_call(self, var) -> bool:
        try:
            self.callable(var)
            return True
        except Exception:
            return False

    def pandas_validate(self, series):
        return series.apply(self.can_call)


class CanConvertValidation(CanCallValidation):
    """Pass iff type_(x) succeeds (reference validation.py:271-293).
    e.g. int('1.0') fails, int('10') passes."""

    def __init__(self, _type: type, **kw):
        if not isinstance(_type, type):
            raise PanSchArgumentError("{} is not a valid type".format(_type))
        super().__init__(_type, **kw)

    @property
    def default_message(self):
        return "cannot be converted to type {}".format(self.callable)

    def spark_predicate(self, col, spark_type):
        # Fast native approximations for the common constructors. Only
        # enabled under mode='native' (explicit opt-in): CPython's int()
        # grammar has corners (unicode digits/whitespace) a Java regex
        # can't reproduce exactly, so 'auto' keeps the Arrow-UDF exact path.
        if self.mode != "native":
            return None
        if self.callable is int and isinstance(spark_type, T.StringType):
            return F.trim(col).rlike(r"^[+-]?[0-9]+(_[0-9]+)*$")
        if self.callable is int and is_numeric_spark_type(spark_type):
            # int(float) succeeds except NaN/inf; ints always succeed
            if isinstance(spark_type, (T.FloatType, T.DoubleType)):
                return col.isNotNull() & ~F.isnan(col) & (col != F.lit(float("inf"))) & (col != F.lit(float("-inf")))
            return col.isNotNull()
        if self.callable is str:
            return F.lit(True)
        return None


class DateFormatValidation(_SeriesValidation):
    """Pass iff datetime.strptime(str(x), fmt) succeeds — *semantic* date
    validity, not shape (reference validation.py:393-419; '11112233' fails
    '%Y%m%d' because month 22 is invalid). strptime directives differ from
    Spark datetime patterns, so the exact path is always the Arrow UDF; a
    fast native variant is opt-in via spark_format= when the caller has
    verified equivalence for their format."""

    def __init__(self, date_format: str, spark_format: str = None, **kw):
        self.date_format = date_format
        self.spark_format = spark_format
        super().__init__(**kw)

    @property
    def default_message(self):
        return 'does not match the date format string "{}"'.format(self.date_format)

    def valid_date(self, val) -> bool:
        try:
            datetime.datetime.strptime(val, self.date_format)
            return True
        except Exception:
            return False

    def pandas_validate(self, series):
        return series.astype(str).apply(self.valid_date)

    def spark_predicate(self, col, spark_type):
        if self.spark_format is None:
            return None
        return F.try_to_timestamp(col.cast("string"), F.lit(self.spark_format)).isNotNull()


# ---------------------------------------------------------------------------
# expression checks (reference validation.py:194-214, 296-390)
# ---------------------------------------------------------------------------

class InRangeValidation(_SeriesValidation):
    """pd.to_numeric(series, errors='coerce') then (s >= min) & (s < max):
    min inclusive, max exclusive; non-numeric text coerces to NaN -> fails
    (reference validation.py:194-214). Native path for numeric Spark types
    is exactly equivalent (null -> fail); string input takes the pandas
    path by default because pd.to_numeric's grammar differs from Spark's
    cast ('0x1f', '1_0', locale corner cases)."""

    def __init__(self, min: float = -math.inf, max: float = math.inf, **kw):
        self.min = min
        self.max = max
        super().__init__(**kw)

    @property
    def default_message(self):
        return "was not in the range [{}, {})".format(self.min, self.max)

    def pandas_validate(self, series):
        s = pd.to_numeric(series, errors="coerce")
        return (s >= self.min) & (s < self.max)

    def spark_predicate(self, col, spark_type):
        # The pandas formula fails NaN on BOTH sides (NaN >= m and
        # NaN < M are both False), but Spark orders NaN GREATER than
        # every double — with max=inf the short-circuited lit(True)
        # never sees the column and NaN (or, with both bounds infinite,
        # even NULL) would pass. Pin both explicitly: NULL fails (the
        # _leaf coalesce needs the column to appear in the predicate)
        # and NaN fails on float-family inputs.
        if is_numeric_spark_type(spark_type) and not isinstance(spark_type, T.BooleanType):
            c = col.cast("double") if isinstance(spark_type, T.DecimalType) else col
            pred = F.lit(True) if self.min == -math.inf else (c >= F.lit(self.min))
            pred2 = F.lit(True) if self.max == math.inf else (c < F.lit(self.max))
            ok = pred & pred2 & col.isNotNull()
            if isinstance(spark_type, (T.FloatType, T.DoubleType, T.DecimalType)):
                ok = ok & ~F.isnan(c)
            return ok
        if self.mode == "native" and isinstance(spark_type, T.StringType):
            c = F.try_cast(F.trim(col), "double")
            return (c >= F.lit(self.min)) & (c < F.lit(self.max)) & ~F.isnan(
                F.coalesce(c, F.lit(0.0)))
        return None


class InListValidation(_SeriesValidation):
    """series.isin(options); case-insensitive variant lowercases both sides
    (reference validation.py:367-390). pandas isin matches by value AND
    type ('1' not in [1]); the native path is therefore gated on the option
    types matching the Spark column type family, avoiding Spark's implicit
    cross-type casts in IN."""

    def __init__(self, options: typing.Iterable, case_sensitive: bool = True, **kw):
        self.case_sensitive = case_sensitive
        self.options = list(options)
        super().__init__(**kw)

    @property
    def default_message(self):
        values = ", ".join(str(v) for v in self.options)
        return "is not in the list of legal options ({})".format(values)

    def pandas_validate(self, series):
        if self.case_sensitive:
            return series.isin(self.options)
        return series.str.lower().isin([s.lower() for s in self.options])

    def spark_predicate(self, col, spark_type):
        opts = self.options
        str_col = isinstance(spark_type, T.StringType)
        num_col = is_numeric_spark_type(spark_type) and not isinstance(spark_type, T.BooleanType)
        if not self.case_sensitive:
            if str_col and all(isinstance(o, str) for o in opts):
                return F.lower(col).isin([o.lower() for o in opts])
            return None
        if str_col and all(isinstance(o, str) for o in opts):
            return col.isin(opts)
        if num_col and all(isinstance(o, (int, float)) and not isinstance(o, bool) for o in opts):
            return col.isin(opts)
        return None


def _edit_distance(a: str, b: str) -> int:
    """Classic Levenshtein DP — the pandas-path twin of Spark's JVM
    levenshtein, for FuzzyInListValidation's reference formula."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


class FuzzyInListValidation(_SeriesValidation):
    """Typo-tolerant membership: passes when the value sits within
    ``max_dist`` edits of ANY allowed option — the real-world InList
    for human-keyed fields (engine extension, no reference analog;
    SURVEY.md §2.5). Null values fail, like InListValidation.

    Native path (string columns, string options): an OR-chain of
    Spark's BOUNDED ``levenshtein(col, lit(option), max_dist) >= 0`` —
    row-local, whole-stage codegen, zero shuffle, O(len(options)) per
    row. The options list is a small human dictionary by contract; for
    matching against a LARGE dictionary use operators/entity.py
    (blocking + the same bounded verify) instead of a validation.
    """

    def __init__(self, options: typing.Iterable, max_dist: int = 1,
                 case_sensitive: bool = True, **kw):
        self.options = list(options)
        self.max_dist = int(max_dist)
        self.case_sensitive = case_sensitive
        if not self.options:
            raise PanSchArgumentError("FuzzyInListValidation needs at least one option")
        if self.max_dist < 0:
            raise PanSchArgumentError("max_dist must be >= 0")
        super().__init__(**kw)

    @property
    def default_message(self):
        values = ", ".join(str(v) for v in self.options)
        return "is not within {} edits of the list of legal options ({})".format(
            self.max_dist, values)

    def _norm(self, s: str) -> str:
        return s if self.case_sensitive else s.lower()

    def pandas_validate(self, series):
        opts = [self._norm(str(o)) for o in self.options]

        def ok(v):
            if pd.isna(v):
                return False
            s = self._norm(str(v))
            return any(abs(len(s) - len(o)) <= self.max_dist
                       and _edit_distance(s, o) <= self.max_dist for o in opts)

        return series.map(ok)

    def spark_predicate(self, col, spark_type):
        if not (isinstance(spark_type, T.StringType)
                and all(isinstance(o, str) for o in self.options)):
            return None
        c = col if self.case_sensitive else F.lower(col)
        hits = [
            F.levenshtein(c, F.lit(self._norm(o)), self.max_dist) >= 0
            for o in self.options
        ]
        any_hit = hits[0]
        for h in hits[1:]:
            any_hit = any_hit | h
        # NULL never matches (levenshtein(NULL, x) is NULL): pin to False
        return F.when(col.isNull(), F.lit(False)).otherwise(any_hit)


class MatchesPatternValidation(_SeriesValidation):
    """series.astype(str).str.contains(pattern, **options) — substring
    regex *search*, not fullmatch (reference validation.py:296-316).
    astype(str) first: nulls become the literal 'nan' (preserved via
    coalesce in the native path). Native path only for string columns,
    plain string patterns with Java-compatible syntax and no options;
    everything else (compiled patterns with flags, case=/regex= options,
    non-string columns) runs the pandas formula on Arrow batches."""

    def __init__(self, pattern, options={}, **kw):
        self.pattern = pattern
        self.options = options
        super().__init__(**kw)

    @property
    def default_message(self):
        return 'does not match the pattern "{}"'.format(self.pattern)

    def pandas_validate(self, series):
        return series.astype(str).str.contains(self.pattern, **self.options)

    def spark_predicate(self, col, spark_type):
        if (isinstance(spark_type, T.StringType) and isinstance(self.pattern, str)
                and not self.options and _java_regex_safe(self.pattern)):
            # (?U): Java's \d \s are ASCII-only by default; Python's are
            # unicode-aware. UNICODE_CHARACTER_CLASS aligns them.
            return F.coalesce(col, F.lit("nan")).rlike(JAVA_UNICODE_FLAG + self.pattern)
        return None


class TrailingWhitespaceValidation(_SeriesValidation):
    """~astype(str).str.contains(r'\\s+$') (reference validation.py:319-332)."""

    @property
    def default_message(self):
        return "contains trailing whitespace"

    def pandas_validate(self, series):
        return ~series.astype(str).str.contains(r"\s+$")

    def spark_predicate(self, col, spark_type):
        if isinstance(spark_type, T.StringType):
            return ~F.coalesce(col, F.lit("nan")).rlike(r"(?U)\s+$")
        return None


class LeadingWhitespaceValidation(_SeriesValidation):
    """~astype(str).str.contains(r'^\\s+') (reference validation.py:335-348)."""

    @property
    def default_message(self):
        return "contains leading whitespace"

    def pandas_validate(self, series):
        return ~series.astype(str).str.contains(r"^\s+")

    def spark_predicate(self, col, spark_type):
        if isinstance(spark_type, T.StringType):
            return ~F.coalesce(col, F.lit("nan")).rlike(r"(?U)^\s+")
        return None


class NotNullValidation(_SeriesValidation):
    """Engine extension: explicit non-null check (north star: "transcript
    regex/non-null checks"). Needed because MatchesPatternValidation
    inherits the reference's astype(str) quirk where null becomes 'nan' and
    can *pass* a pattern; this check catches nulls directly. Pure native
    predicate — codegen, no UDF."""

    @property
    def default_message(self):
        return "is null"

    def pandas_validate(self, series):
        return series.notna()

    def spark_predicate(self, col, spark_type):
        return col.isNotNull()


class CrossColumnExprValidation(_SeriesValidation):
    """Engine extension: cross-column check expressed as a NATIVE Catalyst
    boolean expression — the codegen fast path for multi-column invariants
    that need no Python at all (e.g. ``length(bytes) == 2*(sr_hz*dur_ms
    div 1000)`` for PCM byte-length consistency, or ``ship <= receipt``
    date ordering). Unlike CustomRowValidation there is no Arrow transfer:
    the predicate fuses into the same whole-stage-codegen'd projection as
    every other row-local check, so adding one costs ~nothing at 10^12
    rows.

    ``expr_fn(df) -> Column`` builds the pass predicate from the live
    DataFrame (so implementations can reference several columns);
    ``pandas_fn`` (optional) is the same invariant as a pandas
    frame -> bool Series formula, used by parity tests as the local
    oracle.
    """

    is_multi_column = True

    def __init__(self, input_columns: typing.List[str],
                 expr_fn: typing.Callable[[typing.Any], SparkColumn],
                 message: str,
                 pandas_fn: typing.Optional[
                     typing.Callable[[pd.DataFrame], pd.Series]] = None,
                 **kw):
        self.input_columns = list(input_columns)
        self._expr_fn = expr_fn
        self._pandas_fn = pandas_fn
        super().__init__(message=message, **kw)

    @property
    def default_message(self):
        return self._custom_message

    def pandas_validate(self, series):
        raise PanSchArgumentError(
            "CrossColumnExprValidation needs multiple columns; use compile_row_predicate")

    def pandas_validate_frame(self, frame: pd.DataFrame) -> pd.Series:
        if self._pandas_fn is None:
            raise PanSchArgumentError(
                "no pandas_fn supplied for CrossColumnExprValidation")
        return self._pandas_fn(frame)

    def compile_row_predicate(self, df) -> SparkColumn:
        return _leaf(self._expr_fn(df))


class ConditionalValidation(_SeriesValidation):
    """Engine extension: an if-then rule — rows satisfying ``when_fn``
    must pass ``then_validation`` on ``then_column``; all other rows
    (including rows where the condition is NULL) pass vacuously. The
    config-language form every real rulebook needs ("if codec='flac'
    then sr_hz >= 16000") without forking a filtered frame per rule:
    the compiled predicate is ``NOT when OR then`` fused into the same
    row-local codegen projection as every other check — one scan total
    no matter how many conditional rules the schema carries.

    ``when_fn(df) -> Column`` builds the condition from the live frame
    (any columns); ``then_validation`` is any single-column validation
    (its own native/pandas compilation strategy is reused unchanged).
    ``when_pandas_fn`` (optional) is the condition as a pandas
    frame -> bool Series formula for parity tests. Serializable via the
    ``conditional`` spec form (serialize.conditional_check) when built
    from SQL text."""

    is_multi_column = True

    def __init__(self, input_columns: typing.List[str],
                 when_fn: typing.Callable[[typing.Any], SparkColumn],
                 then_validation: "_SeriesValidation",
                 then_column: str,
                 message: str = None,
                 when_pandas_fn: typing.Optional[
                     typing.Callable[[pd.DataFrame], pd.Series]] = None,
                 **kw):
        if not isinstance(then_validation, _SeriesValidation):
            raise PanSchArgumentError(
                "then_validation must be a series validation, got {!r}"
                .format(type(then_validation).__name__))
        if getattr(then_validation, "is_multi_column", False):
            raise PanSchArgumentError(
                "then_validation must be a single-column check; nest the "
                "condition into a CrossColumnExprValidation instead")
        if getattr(then_validation, "is_global", False):
            # a global then-branch (IsDistinct/InTable, possibly wrapped)
            # cannot ride the fused row-local projection; silently
            # compiling it per Arrow batch would give batch-dependent
            # answers — refuse loudly
            raise PanSchArgumentError(
                "then_validation must be row-local; {} needs whole-table "
                "state — filter the frame and run it as a separate "
                "schema column instead".format(
                    type(then_validation).__name__))
        if then_column not in input_columns:
            raise PanSchArgumentError(
                "then_column {!r} must appear in input_columns".format(
                    then_column))
        self.input_columns = list(input_columns)
        self._when_fn = when_fn
        self.then_validation = then_validation
        self.then_column = then_column
        self._when_pandas_fn = when_pandas_fn
        super().__init__(message=message, **kw)

    @property
    def default_message(self):
        return "{} (conditional)".format(self.then_validation.message)

    def pandas_validate(self, series):
        raise PanSchArgumentError(
            "ConditionalValidation needs multiple columns; use "
            "compile_row_predicate")

    def pandas_validate_frame(self, frame: pd.DataFrame) -> pd.Series:
        if self._when_pandas_fn is None:
            raise PanSchArgumentError(
                "no when_pandas_fn supplied for ConditionalValidation")
        cond = self._when_pandas_fn(frame).fillna(False).astype(bool)
        inner = self.then_validation.pandas_validate(
            frame[self.then_column]).astype(bool)
        return ~cond | inner

    def compile_row_predicate(self, df) -> SparkColumn:
        cond = _leaf(self._when_fn(df))          # NULL condition -> pass
        spark_type = df.schema[self.then_column].dataType
        inner = self.then_validation.compile_predicate(
            df[self.then_column], spark_type)    # already _leaf-coalesced
        return ~cond | inner


class CustomRowValidation(_SeriesValidation):
    """Engine extension: cross-column check (north star "cross-column
    checks"). ``fn`` receives a pd.DataFrame batch holding
    ``input_columns`` (Arrow-transferred struct) and returns a boolean
    Series; anchored on one column for warning attribution. Compiled as a
    single vectorized pandas_udf over a struct — still one scan, no join.
    """

    is_multi_column = True

    def __init__(self, input_columns: typing.List[str],
                 fn: typing.Callable[[pd.DataFrame], pd.Series],
                 message: str, **kw):
        self.input_columns = list(input_columns)
        self._fn = fn
        super().__init__(message=message, **kw)

    @property
    def default_message(self):
        return self._custom_message

    def pandas_validate(self, series):
        raise PanSchArgumentError("CustomRowValidation needs multiple columns; use compile_row_predicate")

    def pandas_validate_frame(self, frame: pd.DataFrame) -> pd.Series:
        return self._fn(frame)

    def compile_row_predicate(self, df) -> SparkColumn:
        # the wrapped pandas_udf is pure code (no per-frame state): build
        # it once per validation instance — re-registering a UDF is ~10
        # py4j roundtrips of driver-serial plan-build time per validate()
        # call, which the bench pays on every timed pass
        udf = getattr(self, "_compiled_udf", None)
        if udf is None:
            fn = self._fn

            def _wrapped(batch: pd.DataFrame) -> pd.Series:
                return fn(batch).astype("boolean")

            udf = self._compiled_udf = F.pandas_udf(_wrapped, T.BooleanType())
        return _leaf(udf(F.struct(*[df[c] for c in self.input_columns])))


# ---------------------------------------------------------------------------
# global (shuffle-requiring) checks
# ---------------------------------------------------------------------------

class IsDistinctValidation(_SeriesValidation):
    """~series.duplicated(keep='first'): first occurrence (in row order)
    passes, later duplicates fail (reference validation.py:351-364).

    Row-order-sensitive => needs a stable row ordinal and global state, so
    the Spark plan is NOT a row-local predicate: the schema compiler routes
    this to operators.distinct.distinct_violations — ONE map-side-combined
    hash aggregation per value (count + min row ordinal; Spark's partial
    aggregation pre-collapses hot keys per map task, see
    operators/distinct.py) followed by a broadcast join-back of the (rare)
    duplicate keys. ``salt_buckets`` is retained for API stability (the
    partial agg subsumes explicit salting); ``broadcast_dupes=False``
    switches the join-back to a shuffle join — pass it when the duplicate
    KEY set itself is too large to broadcast (there is no automatic
    size-based fallback).
    """

    is_global = True

    def __init__(self, salt_buckets: int = 64, broadcast_dupes: bool = True, **kw):
        self.salt_buckets = salt_buckets
        self.broadcast_dupes = broadcast_dupes
        super().__init__(**kw)

    @property
    def default_message(self):
        return "contains values that are not unique"

    def pandas_validate(self, series):
        return ~series.duplicated(keep="first")


class InTableValidation(_SeriesValidation):
    """Engine extension (no reference analog — SURVEY.md §2.4): referential
    integrity against a dimension table. Pass iff the value exists in
    ``dim_df[dim_col]``. Planned as a broadcast LEFT ANTI join emitting
    violations (the north star's codec-dimension check).

    ``inline_max_rows`` (opt-in, default off): when the caller KNOWS the
    dimension is a tiny enum (a codec/status/country table), pass its
    upper bound and the distinct dim values are collected ONCE at
    construction and compiled as a row-local IN predicate that fuses into
    the single-scan violations projection — removing the whole
    anti-join branch (its pruned re-scan, the dim distinct agg, and the
    broadcast-build stage) from every validate() plan. Falls back to the
    anti-join plan silently when the dim turns out bigger. Semantics are
    identical bit-for-bit: a NULL value fails either way (never equal to
    any dim value), NULL dim values match nothing, and an empty dim
    fails every row. Do NOT set it for unbounded dims — the construction
    pays one driver collect of up to ``inline_max_rows + 1`` rows."""

    is_global = True

    def __init__(self, dim_df, dim_col: str, broadcast: bool = True,
                 inline_max_rows: int = 0, **kw):
        self.dim_df = dim_df
        self.dim_col = dim_col
        self.broadcast = broadcast
        self._inline_values = None
        super().__init__(**kw)
        if inline_max_rows:
            rows = (dim_df.select(dim_col).distinct()
                    .limit(int(inline_max_rows) + 1).collect())
            if len(rows) <= inline_max_rows:
                # NULL dim values can never equal anything — drop them so
                # isin() keeps pure two-valued semantics under _leaf
                self._inline_values = [r[dim_col] for r in rows
                                       if r[dim_col] is not None]
                self.is_global = False  # instance shadows the class attr

    def spark_predicate(self, col: SparkColumn, spark_type: T.DataType):
        if self._inline_values is None:
            return None  # global anti-join plan (the default route)
        if not self._inline_values:
            # empty dim: nothing can match — every row is a violation,
            # exactly like the LEFT ANTI against an empty build side
            return F.lit(False)
        return col.isin(self._inline_values)

    @property
    def default_message(self):
        return "is not present in the reference table column {}".format(self.dim_col)

    #: pandas-fallback ceiling: above this many distinct dimension values
    #: the driver-side collect would OOM; the default broadcast-anti-join
    #: plan has no such limit (the dim stays distributed/broadcast).
    PANDAS_FALLBACK_MAX_DISTINCT = 1_000_000

    def pandas_validate(self, series):
        cap = self.PANDAS_FALLBACK_MAX_DISTINCT
        rows = (self.dim_df.select(self.dim_col).distinct()
                .limit(cap + 1).collect())
        if len(rows) > cap:
            from .errors import PanSchArgumentError
            raise PanSchArgumentError(
                "InTableValidation pandas fallback refused: dimension column "
                "{!r} has more than {:,} distinct values — collecting it to "
                "the driver would OOM. Use the default plan (mode='auto': "
                "broadcast LEFT ANTI join) which never collects the dimension."
                .format(self.dim_col, cap))
        return series.isin([r[self.dim_col] for r in rows])


# ---------------------------------------------------------------------------
# frame-level check (reference validation.py:217-237)
# ---------------------------------------------------------------------------

_SPARK_TO_NUMPY = {
    T.ByteType: np.int8, T.ShortType: np.int16, T.IntegerType: np.int32,
    T.LongType: np.int64, T.FloatType: np.float32, T.DoubleType: np.float64,
    T.BooleanType: np.bool_, T.StringType: np.object_,
    T.TimestampType: np.datetime64, T.DateType: np.datetime64,
    T.BinaryType: np.object_,
}


def spark_type_to_numpy(dt: T.DataType):
    for k, v in _SPARK_TO_NUMPY.items():
        if isinstance(dt, k):
            return np.dtype(v)
    return np.dtype(np.object_)


class IsDtypeValidation(_BaseValidation):
    """Frame-level dtype check: <=1 warning, no row/value, evaluated on the
    driver against the Spark schema with zero jobs (reference
    validation.py:217-237 checks np.issubdtype(series.dtype, expected); we
    map the Spark type to its numpy equivalent and run the same
    issubdtype lattice, so int32 passes a required np.number etc.)."""

    is_frame_level = True

    def __init__(self, dtype: np.dtype, message: str = None):
        # engine extension: the reference ctor rejects message= (its
        # _BaseValidation has no kwargs), but the serializer's round-trip
        # guarantee needs somewhere to carry one
        self.dtype = dtype
        self._custom_message = message

    @property
    def message(self):
        # default-message fallback like every other check (the column-
        # specific wording still comes from get_errors_for_type)
        return self._custom_message or (
            "has a dtype which is not a subclass of the required type "
            "{}".format(self.dtype))

    def get_errors_for_type(self, name: str, spark_type: T.DataType):
        actual = spark_type_to_numpy(spark_type)
        if not np.issubdtype(actual, self.dtype):
            return [ValidationWarning(
                self._custom_message or
                "The column {} has a dtype of {} which is not a subclass of the required type {}".format(
                    name, actual, self.dtype))]
        return []

    # pandas-side parity path (reference signature)
    def get_errors(self, series: pd.Series, column=None):
        if not np.issubdtype(series.dtype, self.dtype):
            return [ValidationWarning(
                self._custom_message or
                "The column {} has a dtype of {} which is not a subclass of the required type {}".format(
                    column.name if column else "", series.dtype, self.dtype))]
        return []
