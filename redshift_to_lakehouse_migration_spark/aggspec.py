"""Shared partial/recombine encoding for decomposable aggregates.

Two operators split one logical aggregation into two physical stages and
therefore need aggregates that survive re-aggregation:

- ``rollup.py`` — hypertable-style continuous aggregates: raw → partials
  at a fine time grain, coarser grains re-rolled from partials (avg kept
  as ``name__s``/``name__c`` pairs so rollups CHAIN hour → day → month).
- ``skew.py`` — salted two-stage groupBy: partials on (keys, salt),
  recombined on keys (avg finalized immediately — nothing chains).

Both carried an identical private copy of this encoding through round 5
(measured and behavior-pinned there); this module is the single shared
definition (VERDICT r5 directive #4). The encoding:

  partial stage:   sum/count/min/max apply directly; avg becomes the
                   pair ``{name}__s`` (sum) + ``{name}__c`` (count).
  recombine stage: sum and count re-SUM (a count of counts is a sum);
                   min/max re-apply; avg either stays a pair
                   (``finalize_avg=False``, chainable) or finalizes to
                   ``sum(__s)/sum(__c)`` (``finalize_avg=True``).

Only these five functions decompose this way — holistic aggregates
(median, percentile, distinct counts) need the raw rows, and both
callers reject them up front via :func:`check_decomposable` with their
own operator-specific error text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# name -> (source col | "*" | Column, fn)
AggSpec = dict[str, tuple[str, str]]

DECOMPOSABLE = ("sum", "count", "min", "max", "avg")


def check_decomposable(aggs: AggSpec, reason: str) -> None:
    """Reject holistic aggregates; ``reason`` is the caller's
    operator-specific explanation appended to the error."""
    for name, (_, fn) in aggs.items():
        if fn not in DECOMPOSABLE:
            raise ValueError(f"{name}: {fn!r} {reason}")


def _src_col(src: str | Column) -> Column | None:
    if isinstance(src, Column):
        return src
    return None if src == "*" else F.col(src)


def partial_columns(aggs: AggSpec) -> dict[str, Column]:
    """First-stage aggregate expressions, keyed by output column name."""
    cols: dict[str, Column] = {}
    for name, (src, fn) in aggs.items():
        c = _src_col(src)
        if fn == "count":
            cols[name] = F.count("*") if c is None else F.count(c)
        elif fn == "avg":
            cols[f"{name}__s"] = F.sum(c)
            cols[f"{name}__c"] = F.count(c)
        else:
            cols[name] = getattr(F, fn)(c)
    return cols


def _native_avg_type(sum_type: T.DataType) -> T.DataType | None:
    """The result type Spark's native ``avg`` would produce, derived from
    the PARTIAL SUM's type. Only DECIMAL needs help: ``sum(decimal(p,s))``
    is ``decimal(p+10, s)`` and ``avg`` is ``decimal(p+4, s+4)``, but the
    raw ``sum/count`` quotient lands on ``decimal(38, max(6,...))``-style
    division types — numerically equal, schema-divergent (trailing-zero
    string forms would flip an oracle value hash). Non-decimal quotients
    (long/long, double/long) already land on double, matching native avg.
    If the sum precision hit the 38 cap the reconstruction is
    approximate in PRECISION only — scale (the value-visible part) stays
    exact."""
    if isinstance(sum_type, T.DecimalType):
        p_src = sum_type.precision - 10
        return T.DecimalType(min(38, p_src + 4), min(38, sum_type.scale + 4))
    return None


def recombine_columns(aggs: AggSpec, finalize_avg: bool,
                      partial_schema: T.StructType | None = None,
                      ) -> list[Column]:
    """Second-stage aggregate expressions over first-stage output.

    ``finalize_avg=False`` keeps avg as the partial pair (output schema
    == input schema, so stages chain); ``True`` emits the final mean.
    Pass ``partial_schema`` (the first-stage output schema) to make
    DECIMAL behavior exact: finalized means land on the type native
    ``avg`` would produce, and re-summed DECIMAL partials are cast BACK
    to their input type — Spark widens sum-of-decimal +10 precision per
    hop, which would otherwise break the schema-stable chaining promise
    (hour→day→month drifts 22,2→32,2→38,2) and defeat the finalize
    reconstruction. The cast-back can only overflow if a group's true
    total exceeds the first sum's +10 headroom (>10^10 partial rows per
    group), where ANSI mode fails loud instead of silently widening."""

    def _resum(col_name: str) -> Column:
        c = F.sum(col_name)
        if partial_schema is not None:
            t = partial_schema[col_name].dataType
            if isinstance(t, T.DecimalType):
                c = c.cast(t)
        return c

    cols: list[Column] = []
    for name, (_, fn) in aggs.items():
        if fn in ("sum", "count"):
            cols.append(_resum(name).alias(name))
        elif fn == "avg":
            if finalize_avg:
                q = F.sum(f"{name}__s") / F.sum(f"{name}__c")
                if partial_schema is not None:
                    t = _native_avg_type(partial_schema[f"{name}__s"].dataType)
                    if t is not None:
                        q = q.cast(t)
                cols.append(q.alias(name))
            else:
                cols.append(_resum(f"{name}__s").alias(f"{name}__s"))
                cols.append(F.sum(f"{name}__c").alias(f"{name}__c"))
        else:
            cols.append(getattr(F, fn)(name).alias(name))
    return cols


def finalize_avg_pairs(df: DataFrame, aggs: AggSpec) -> DataFrame:
    """Resolve avg partial pairs into the final mean column (read-time),
    cast to native-avg dtype for DECIMAL inputs (see _native_avg_type)."""
    for name, (_, fn) in aggs.items():
        if fn == "avg":
            q = F.col(f"{name}__s") / F.col(f"{name}__c")
            t = _native_avg_type(df.schema[f"{name}__s"].dataType)
            if t is not None:
                q = q.cast(t)
            df = (df.withColumn(name, q)
                  .drop(f"{name}__s", f"{name}__c"))
    return df
