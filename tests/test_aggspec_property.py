"""Property-based equivalence of the shared two-stage aggregate encoding
(aggspec.py) against Spark's direct groupBy, over randomized data.

The fixed-case tests in test_skew/test_rollup pin NULL measures, decimal
dtypes, and all-NULL groups individually; hypothesis explores the cross
product — NULL keys, NULL-riddled measure columns, hot keys, singleton
groups, empty groups-after-filter — and asserts the strongest contract
both call sites rely on:

- `salted_groupby` (finalize_avg=True) returns the SAME ROWS and the
  SAME DTYPES as the direct one-stage groupBy, for every decomposable
  aggregate over int and decimal columns;
- `time_rollup` → `reroll` → `finalize` (the chaining form,
  finalize_avg=False) matches the direct coarse-grain groupBy the same
  way.

Measures are ints and decimals only: double sums are order-dependent in
floating point, so exact equality there would test partitioning luck,
not the encoding (the engine's own queries cast to decimal before
salted/rolled sums for exactly this reason — events.py:232,361).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.rollup import (
    finalize, reroll, time_rollup,
)
from redshift_to_lakehouse_migration_spark.skew import salted_groupby

# (key, int-measure, decimal-measure) with NULLs everywhere; small key
# domain so hypothesis reliably produces collisions, singletons, and
# all-NULL groups
row_st = st.tuples(
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
    st.one_of(st.none(), st.integers(-1000, 1000)),
    st.one_of(st.none(),
              st.decimals(min_value=-99999, max_value=99999, places=2)),
)
rows_st = st.lists(row_st, min_size=1, max_size=30)

SCHEMA = "k string, iv long, dv decimal(12,2)"


def _sorted(df):
    return sorted(map(tuple, df.collect()),
                  key=lambda t: tuple((v is None, str(v)) for v in t))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_st, n_salts=st.sampled_from([1, 2, 7]))
def test_salted_groupby_equals_direct_groupby(spark, rows, n_salts):
    df = spark.createDataFrame(rows, SCHEMA)
    salted = salted_groupby(
        df, ["k"], n_salts,
        n=("*", "count"),
        iv_n=("iv", "count"),
        iv_sum=("iv", "sum"),
        iv_min=("iv", "min"),
        iv_max=("iv", "max"),
        iv_avg=("iv", "avg"),
        dv_sum=("dv", "sum"),
        dv_avg=("dv", "avg"),
    ).select("k", "n", "iv_n", "iv_sum", "iv_min", "iv_max",
             "iv_avg", "dv_sum", "dv_avg")
    direct = df.groupBy("k").agg(
        F.count("*").alias("n"),
        F.count("iv").alias("iv_n"),
        F.sum("iv").alias("iv_sum"),
        F.min("iv").alias("iv_min"),
        F.max("iv").alias("iv_max"),
        F.avg("iv").alias("iv_avg"),
        F.sum("dv").alias("dv_sum"),
        F.avg("dv").alias("dv_avg"),
    )
    assert salted.dtypes == direct.dtypes
    assert _sorted(salted) == _sorted(direct)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=rows_st, hours=st.lists(st.integers(0, 71), min_size=1,
                                    max_size=30))
def test_rollup_chain_equals_direct_daily(spark, rows, hours):
    # pair each row with a random hour offset over a 3-day span so the
    # hour→day re-roll actually merges partials
    base = datetime(2024, 3, 1)
    data = [(k, iv, dv, base + timedelta(hours=h))
            for (k, iv, dv), h in zip(rows, hours * (
                len(rows) // len(hours) + 1))]
    df = spark.createDataFrame(data, SCHEMA + ", ts timestamp")
    spec = {
        "n": ("*", "count"),
        "iv_sum": ("iv", "sum"),
        "iv_min": ("iv", "min"),
        "iv_max": ("iv", "max"),
        "dv_sum": ("dv", "sum"),
        "dv_avg": ("dv", "avg"),
    }
    hourly = time_rollup(df, "ts", "hour", ["k"], spec)
    daily = finalize(reroll(hourly, "day", ["k"], spec, from_grain="hour"),
                     spec).select(
        "bucket_ts", "k", "n", "iv_sum", "iv_min", "iv_max",
        "dv_sum", "dv_avg")
    direct = df.groupBy(
        F.date_trunc("day", "ts").alias("bucket_ts"), "k").agg(
        F.count("*").alias("n"),
        F.sum("iv").alias("iv_sum"),
        F.min("iv").alias("iv_min"),
        F.max("iv").alias("iv_max"),
        F.sum("dv").alias("dv_sum"),
        F.avg("dv").alias("dv_avg"),
    )
    assert daily.dtypes == direct.dtypes
    assert _sorted(daily) == _sorted(direct)


def test_decimal_values_survive_roundtrip(spark):
    """Decimal.quantize sanity for the strategy itself: the SCHEMA's
    decimal(12,2) holds every generated value exactly, so the property
    tests compare true equality, not cast artifacts."""
    vals = [Decimal("-99999.00"), Decimal("99999.00"), Decimal("0.01")]
    df = spark.createDataFrame([(v,) for v in vals], "dv decimal(12,2)")
    assert sorted(r.dv for r in df.collect()) == sorted(vals)
