"""Hypertable-style time rollups: hierarchical continuous aggregates.

The pattern behind TimescaleDB continuous aggregates / Druid rollup
segments: aggregate raw events ONCE into fine-grained partials (say
hourly), then derive every coarser grain (day, month) by re-aggregating
the partials — never re-scanning raw data. At 100 TB/day the raw scan is
the dominant cost; partials are ~10⁴–10⁶× smaller, so daily/monthly
refreshes become trivial jobs, and late data only dirties the partials of
the hours it lands in.

Only decomposable aggregates survive re-aggregation (sum/count/min/max;
avg carried as sum+count and finalized at read time). The
oracle-checked ``events_daily_from_hourly`` query proves partials →
coarse ≡ direct GROUP BY on raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggspec import (
    AggSpec,
    check_decomposable,
    finalize_avg_pairs,
    partial_columns,
    recombine_columns,
)

_GRAINS = ("minute", "hour", "day", "week", "month", "quarter", "year")

__all__ = ["AggSpec", "time_rollup", "reroll", "finalize"]


def _check(aggs: AggSpec) -> None:
    check_decomposable(
        aggs, "does not survive re-aggregation "
              "(holistic aggs need the raw data)")


def time_rollup(df: DataFrame, ts_col: str, grain: str,
                keys: list[str], aggs: AggSpec) -> DataFrame:
    """Raw rows → partials at ``grain``. Output: ``bucket_ts``, keys, one
    column per agg (avg becomes ``name__s``/``name__c`` partial pairs)."""
    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {_GRAINS}: {grain}")
    _check(aggs)
    cols = partial_columns(aggs)
    return (df.groupBy(F.date_trunc(grain, F.col(ts_col))
                       .alias("bucket_ts"), *keys)
            .agg(*[c.alias(n) for n, c in cols.items()]))


def reroll(partials: DataFrame, grain: str, keys: list[str],
           aggs: AggSpec, from_grain: str | None = None) -> DataFrame:
    """Partials at a finer grain → partials at coarser ``grain``. Never
    touches raw data; input and output schemas are identical, so rollups
    chain (hour → day → month).

    Pass ``from_grain`` (the partials' grain) to validate the path:
    the target must be strictly coarser, and every source bucket must
    nest wholly inside one target bucket — ``week`` partials do NOT
    re-roll to month/quarter/year (a week straddles their boundaries;
    date_trunc would silently credit the whole straddling week to the
    earlier bucket). Without ``from_grain`` the caller asserts the path
    is valid."""
    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {_GRAINS}: {grain}")
    if from_grain is not None:
        if from_grain not in _GRAINS:
            raise ValueError(
                f"from_grain must be one of {_GRAINS}: {from_grain}")
        if _GRAINS.index(grain) <= _GRAINS.index(from_grain):
            raise ValueError(
                f"target grain {grain!r} is not coarser than {from_grain!r}")
        if from_grain == "week":
            raise ValueError(
                "week partials do not nest into coarser calendar grains "
                "(a week straddles month/quarter/year boundaries) — "
                "re-roll from day or finer instead")
    _check(aggs)
    # finalize_avg=False: output schema == input schema, so rollups
    # chain; the schema makes that hold for DECIMALs too (cast-back of
    # the widened re-sum, see aggspec.recombine_columns)
    cols = recombine_columns(aggs, finalize_avg=False,
                             partial_schema=partials.schema)
    return (partials.groupBy(F.date_trunc(grain, F.col("bucket_ts"))
                             .alias("bucket_ts"), *keys)
            .agg(*cols))


def finalize(partials: DataFrame, aggs: AggSpec) -> DataFrame:
    """Resolve avg partial pairs into the final mean column (read-time)."""
    return finalize_avg_pairs(partials, aggs)
