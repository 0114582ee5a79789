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


def recombine_columns(aggs: AggSpec, finalize_avg: bool) -> list[Column]:
    """Second-stage aggregate expressions over first-stage output.

    ``finalize_avg=False`` keeps avg as the partial pair (output schema
    == input schema, so stages chain); ``True`` emits the final mean."""
    cols: list[Column] = []
    for name, (_, fn) in aggs.items():
        if fn in ("sum", "count"):
            cols.append(F.sum(name).alias(name))
        elif fn == "avg":
            if finalize_avg:
                cols.append(
                    (F.sum(f"{name}__s") / F.sum(f"{name}__c")).alias(name))
            else:
                cols.append(F.sum(f"{name}__s").alias(f"{name}__s"))
                cols.append(F.sum(f"{name}__c").alias(f"{name}__c"))
        else:
            cols.append(getattr(F, fn)(name).alias(name))
    return cols


def finalize_avg_pairs(df: DataFrame, aggs: AggSpec) -> DataFrame:
    """Resolve avg partial pairs into the final mean column (read-time)."""
    for name, (_, fn) in aggs.items():
        if fn == "avg":
            df = (df.withColumn(
                name, F.col(f"{name}__s") / F.col(f"{name}__c"))
                .drop(f"{name}__s", f"{name}__c"))
    return df
