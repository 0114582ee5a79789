"""Reusable column-expression builders (the engine's scalar-function library).

Re-expresses the reference's scalar surface (SURVEY.md §2.8) as composable
Column builders: normalization (trim/upper, empty→null), surrogate keys
(md5 of pipe-joined coalesced parts — reference `gold/dim_policy.py:15-22` /
`macros/generate_surrogate_key.sql:5-12`), CASE-tier builders
(`dim_property.sql:31-45`), date-spine calendar attributes (`dim_date.sql:5-43`),
plus decimal-exact aggregation helpers used throughout the query set.

Everything here is a built-in-expression Column (JVM-side, whole-stage
codegen); there are zero row-at-a-time Python UDFs in the engine core.

Numeric policy (why ``dsum``/``davg`` exist): double summation is
order-dependent, and at cluster scale partial-aggregate ordering is
nondeterministic. Money-like aggregates therefore cast to DECIMAL before SUM
(exact integer arithmetic, order-independent) and cast the final result back
to DOUBLE. This matches the reference's Silver-layer DECIMAL(12,2) casting
discipline (`silver/clean_policies.py:63-65`) and makes results reproducible
bit-for-bit across engines and cluster sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Expression-level let binding
# ---------------------------------------------------------------------------

def bind(col: Column, f) -> Column:
    """Evaluate ``col`` exactly ONCE per row and pass the bound value to
    ``f`` (a lambda-variable Column function), i.e. an expression-level
    ``let``.

    Why this exists: a higher-order function evaluates its CHILD arrays
    once, but any subexpression CAPTURED inside its lambda re-evaluates
    on every element — and HOFs run interpreted (no codegen, no
    common-subexpression elimination), so
    ``transform(sequence(1, n), i -> f(slice(toks, i, k)))`` recomputes
    ``toks`` (a full split+regex over the document) for every index:
    O(tokens x doc_bytes) per row, a quadratic blowup that a multi-MB
    document turns into minutes of CPU for ONE row. Wrapping the
    expensive expression as the child of a single-element ``transform``
    makes it a bound lambda variable instead:
    ``transform(array(toks), t -> f(t))[0]`` — structural, independent
    of optimizer heuristics like CollapseProject's inlining rules.
    """
    return F.transform(F.array(col), f).getItem(0)


# ---------------------------------------------------------------------------
# Timestamp output contract
# ---------------------------------------------------------------------------

def utc_ntz(df):
    """Cast every top-level TIMESTAMP (LTZ) output column to TIMESTAMP_NTZ,
    fixing the engine's output contract: timestamps leave a query as UTC
    wall-clock values, invariant under the HOST timezone.

    Why this exists: PySpark ``collect()`` converts an LTZ timestamp to a
    Python datetime through the driver process's LOCAL timezone
    (``datetime.fromtimestamp``) — the session-TZ pin in ``tables.load``
    does not reach that path — while the DuckDB oracle returns naive UTC
    wall-clock values regardless of host TZ. Under a non-UTC host every
    timestamp-returning oracle query would therefore hash-mismatch.
    NTZ collects without local conversion, and the LTZ→NTZ cast renders
    through the session TZ (pinned UTC), so under a UTC host the values
    are bit-identical to the uncast form — proven by the replica staying
    98/98 — and under any other host TZ they no longer shift
    (tests/test_tz_invariance.py pins both directions).

    Applied at the query-WRAPPER level only: internal operators keep LTZ
    (``unix_micros`` and friends reject NTZ), streaming paths are
    untouched, and the cast is expression-level (no plan-metric change).
    """
    from pyspark.sql.types import StructField, TimestampType

    ltz = [f.name for f in df.schema.fields
           if isinstance(f, StructField)
           and isinstance(f.dataType, TimestampType)]
    for name in ltz:
        df = df.withColumn(name, F.col(name).cast("timestamp_ntz"))
    return df


# ---------------------------------------------------------------------------
# String normalization
# ---------------------------------------------------------------------------

def norm_str(col: str | Column) -> Column:
    """UPPER(TRIM(col)) — the reference's enum/status normalizer."""
    return F.upper(F.trim(col))


def empty_to_null(col: str | Column) -> Column:
    """Empty-string → NULL (Redshift-implicit behavior the reference makes
    explicit for open-claim dates, `silver/clean_claims.py:37-42`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", None).otherwise(c)


def full_name(first: str | Column, last: str | Column) -> Column:
    """concat_ws variant: skips NULLs (differs from SQL `||` which nullifies;
    the reference ships both — we follow its PySpark twin)."""
    return F.concat_ws(" ", F.trim(first), F.trim(last))


# ---------------------------------------------------------------------------
# Surrogate keys
# ---------------------------------------------------------------------------

_NULL_SENTINEL = "_null_"


def surrogate_key(*cols: str | Column) -> Column:
    """md5 of pipe-joined, null-coalesced string parts.

    Parity with the reference's dbt macro `generate_surrogate_key.sql:5-12`
    and its PySpark twin `gold/dim_policy.py:15-22`.
    """
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"),
                   F.lit(_NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


# ---------------------------------------------------------------------------
# CASE builders
# ---------------------------------------------------------------------------

def tier_case(col: str | Column, tiers: Sequence[tuple[Sequence[str], str]],
              default: str = "UNKNOWN") -> Column:
    """Membership-tier CASE: first matching IN-list wins.

    Pattern of the reference's construction/flood/wind risk tiers
    (`dim_property.sql:31-45`).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for values, label in tiers:
        branch = c.isin(list(values))
        expr = F.when(branch, label) if expr is None else expr.when(branch, label)
    assert expr is not None
    return expr.otherwise(default)


def lookup_case(col: str | Column, mapping: dict[str, str],
                default: str | None = None) -> Column:
    """Simple CASE code→name lookup (`dim_coverage.sql:15-36`)."""
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for k, v in mapping.items():
        branch = c == k
        expr = F.when(branch, v) if expr is None else expr.when(branch, v)
    assert expr is not None
    return expr.otherwise(default)


# ---------------------------------------------------------------------------
# Decimal-exact aggregation (order-independent money math)
# ---------------------------------------------------------------------------

def dsum(col: str | Column, scale: int = 2, precision: int = 24) -> Column:
    """SUM over DECIMAL-cast input, result as DOUBLE.

    Exact (order-independent) for money-like columns; final DOUBLE keeps the
    output schema engine-neutral.

    Corrupt-input policy (pinned in test_functions.py, Spark 4.1 ANSI on):
    NaN/±Infinity inputs cast to NULL and are silently EXCLUDED from the
    sum, while finite values overflowing the decimal width fail the job
    loudly. A DuckDB oracle errors on non-finite decimal casts instead,
    so NaN-bearing data turns the hash gate red rather than silently
    diverging. Where silent NaN exclusion is unacceptable, gate the input
    with ``quality.expression_check(isnan(c) | ~isfinite(c))`` first.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2, precision: int = 24) -> Column:
    """Order-independent mean: exact decimal SUM (as double) / COUNT.

    The denominator counts the CAST column, not the raw one: non-finite
    doubles cast to NULL (the policy pinned in
    `test_dsum_corrupt_input_policy`) and drop out of the numerator, so
    counting raw non-null values would bias the mean low whenever a
    NaN/Inf slips in. On finite data the two counts are identical (the
    DuckDB oracle twin keeps COUNT(col): it errors loudly on a
    non-finite cast before any comparison)."""
    c = F.col(col) if isinstance(col, str) else col
    dec = c.cast(f"decimal({precision},{scale})")
    return F.sum(dec).cast("double") / F.count(dec)


def d2d_sql(decimal_expr: str) -> str:
    """DECIMAL→DOUBLE for oracle strings, correctly rounded.

    DuckDB's direct DECIMAL→DOUBLE cast is off by 1 ulp on some values
    (measured on sf0.5 pricing sums: 2 of 6 groups differ from Python's
    and Spark's correctly-rounded conversions), which flips value-hash
    gates once aggregate magnitudes reach ~1e10. Routing through VARCHAR
    — exact decimal digits, then DuckDB's correctly-rounded string→double
    parser — matches Spark's BigDecimal.doubleValue() bit-for-bit."""
    return f"CAST(CAST(({decimal_expr}) AS VARCHAR) AS DOUBLE)"


def dsum_sql(col_expr: str, scale: int = 2, precision: int = 24) -> str:
    """DuckDB/ANSI twin of :func:`dsum` for oracle strings."""
    return d2d_sql(f"SUM(CAST({col_expr} AS DECIMAL({precision},{scale})))")


def davg_sql(col_expr: str, scale: int = 2, precision: int = 24) -> str:
    """DuckDB/ANSI twin of :func:`davg` for oracle strings."""
    return f"{dsum_sql(col_expr, scale, precision)} / COUNT({col_expr})"


def count_if(cond: Column) -> Column:
    """Conditional count (`int_premium_summary.sql:19` pattern)."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def sum_if(cond: Column, col: str | Column, scale: int = 2) -> Column:
    """Conditional decimal-exact SUM — SUM(CASE WHEN cond THEN col ELSE 0 END)
    (`int_premium_summary.sql:14-16` / `gold/dim_policy.py:29-34`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(
        F.when(cond, c).otherwise(F.lit(0)).cast(f"decimal(24,{scale})")
    ).cast("double")


# ---------------------------------------------------------------------------
# Calendar / date helpers (dim_date surface)
# ---------------------------------------------------------------------------

HURRICANE_MONTHS = (6, 11)   # Jun–Nov  (`dim_date.sql:28-39`)
TORNADO_MONTHS = (3, 5)      # Mar–May
WINTER_MONTHS = (12, 1, 2)   # Dec–Feb


def calendar_columns(date_col: str | Column) -> dict[str, Column]:
    """All dim_date attributes from a DATE column (`dim_date.sql:16-43`).

    Note the reference's Redshift EXTRACT(DOW) is 0=Sunday while Spark
    ``dayofweek`` is 1=Sunday; we standardize on Spark's 1-based convention
    and document the offset (SURVEY §2.8).
    """
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    m = F.month(d)
    return {
        "year": F.year(d),
        "quarter": F.quarter(d),
        "month": m,
        "day_of_month": F.dayofmonth(d),
        "day_of_week": F.dayofweek(d),          # 1 = Sunday
        "day_of_year": F.dayofyear(d),
        "year_month": F.date_format(d, "yyyy-MM"),
        "month_name": F.date_format(d, "MMMM"),
        "day_name": F.date_format(d, "EEEE"),
        "is_weekend": F.dayofweek(d).isin([1, 7]),
        "is_hurricane_season": m.between(*HURRICANE_MONTHS),
        "is_tornado_season": m.between(*TORNADO_MONTHS),
        "is_winter_season": m.isin(list(WINTER_MONTHS)),
    }
