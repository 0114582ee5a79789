"""Continuous-aggregate rollup: partials re-aggregated through a grain
chain (hour → day → month) must equal the direct aggregate on raw rows,
including the avg carried as sum/count partials."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.rollup import (
    finalize, reroll, time_rollup,
)

SPEC = {
    "n": ("*", "count"),
    "total": ("v", "sum"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
    "mean": ("v", "avg"),
}


@pytest.fixture(scope="module")
def raw(spark):
    rows = [(f"2024-0{1 + i % 2}-{1 + i % 9:02d} {i % 24:02d}:{i % 60:02d}:00",
             "a" if i % 3 else "b", float(i)) for i in range(500)]
    return spark.createDataFrame(rows, "ts_s string, k string, v double") \
        .select(F.to_timestamp("ts_s").alias("ts"), "k", "v")


def test_chained_rollup_matches_direct(spark, raw):
    hourly = time_rollup(raw, "ts", "hour", ["k"], SPEC)
    daily = reroll(hourly, "day", ["k"], SPEC)
    monthly = finalize(reroll(daily, "month", ["k"], SPEC), SPEC)

    direct = (raw.groupBy(F.date_trunc("month", "ts").alias("bucket_ts"), "k")
              .agg(F.count("*").alias("n"), F.sum("v").alias("total"),
                   F.min("v").alias("lo"), F.max("v").alias("hi"),
                   F.avg("v").alias("mean")))
    got = {(r.bucket_ts, r.k): r for r in monthly.collect()}
    want = {(r.bucket_ts, r.k): r for r in direct.collect()}
    assert set(got) == set(want) and len(got) >= 4
    for key in want:
        assert got[key].n == want[key].n, key
        assert abs(got[key].total - want[key].total) < 1e-9
        assert got[key].lo == want[key].lo and got[key].hi == want[key].hi
        assert abs(got[key].mean - want[key].mean) < 1e-9


def test_rollup_rejects_holistic(spark, raw):
    with pytest.raises(ValueError, match="re-aggregation"):
        time_rollup(raw, "ts", "hour", ["k"], {"p50": ("v", "median")})


def test_partials_are_small(spark, raw):
    """The whole point: partials shrink the data; day partials ≤ hour."""
    hourly = time_rollup(raw, "ts", "hour", ["k"], SPEC)
    daily = reroll(hourly, "day", ["k"], SPEC)
    n_raw, n_hour, n_day = raw.count(), hourly.count(), daily.count()
    assert n_hour < n_raw and n_day <= n_hour


def test_reroll_rejects_misaligned_grain_paths(spark):
    """from_grain validation: week partials straddle month/quarter/year
    boundaries (silent misattribution), and a coarse→fine path is not a
    re-roll at all."""
    import pytest

    from redshift_to_lakehouse_migration_spark.rollup import reroll

    partials = spark.createDataFrame(
        [("2024-01-01 00:00:00", "a", 1)],
        "bucket_ts string, k string, n long") \
        .selectExpr("cast(bucket_ts as timestamp) bucket_ts", "k", "n")
    spec = {"n": ("n", "sum")}
    with pytest.raises(ValueError, match="week partials do not nest"):
        reroll(partials, "month", ["k"], spec, from_grain="week")
    with pytest.raises(ValueError, match="not coarser"):
        reroll(partials, "hour", ["k"], spec, from_grain="day")
    # valid nested path still works
    assert reroll(partials, "day", ["k"], spec,
                  from_grain="hour").count() == 1


def test_rollup_chain_null_measures_match_direct(spark):
    """NULL measures must survive the partial → reroll → finalize chain
    with direct-groupBy semantics: an all-NULL (day, key) bucket yields
    NULL sum/avg after re-rolling from hourly partials, never 0."""
    from pyspark.sql import functions as F
    rows = [
        ("2024-03-01 10:15:00", "k1", None), ("2024-03-01 11:00:00", "k1", 4.0),
        ("2024-03-01 09:30:00", "k2", None), ("2024-03-01 18:00:00", "k2", None),
        ("2024-03-02 00:00:01", "k1", 2.0),
    ]
    raw = spark.createDataFrame(rows, "ts_s string, k string, v double") \
        .select(F.col("ts_s").cast("timestamp").alias("ts"), "k", "v")
    spec = {"n": ("*", "count"), "nv": ("v", "count"),
            "s": ("v", "sum"), "m": ("v", "avg")}
    hourly = time_rollup(raw, "ts", "hour", ["k"], spec)
    daily = finalize(reroll(hourly, "day", ["k"], spec, from_grain="hour"),
                     spec)
    direct = raw.groupBy(F.date_trunc("day", "ts").alias("bucket_ts"), "k") \
        .agg(F.count("*").alias("n"), F.count("v").alias("nv"),
             F.sum("v").alias("s"), F.avg("v").alias("m"))
    assert sorted(map(tuple, daily.collect())) == \
        sorted(map(tuple, direct.collect()))
    k2 = [r for r in daily.collect() if r["k"] == "k2"][0]
    assert k2["s"] is None and k2["m"] is None and k2["nv"] == 0


def test_finalize_decimal_avg_dtype_matches_direct(spark):
    """Same dtype pin for the rollup chain: finalize() must emit DECIMAL
    means on native-avg dtype, reconstructed from the partial sum."""
    from pyspark.sql import functions as F
    rows = [("2024-03-01 10:15:00", "k1", "1.23"),
            ("2024-03-01 11:45:00", "k1", "2.47")]
    raw = spark.createDataFrame(rows, "ts_s string, k string, v_s string") \
        .select(F.col("ts_s").cast("timestamp").alias("ts"), "k",
                F.col("v_s").cast("decimal(12,2)").alias("v"))
    spec = {"m": ("v", "avg")}
    daily = finalize(
        reroll(time_rollup(raw, "ts", "hour", ["k"], spec),
               "day", ["k"], spec, from_grain="hour"), spec)
    direct = raw.groupBy(F.date_trunc("day", "ts").alias("bucket_ts"), "k") \
        .agg(F.avg("v").alias("m"))
    assert daily.schema["m"].dataType == direct.schema["m"].dataType
    assert sorted(map(tuple, daily.collect())) == \
        sorted(map(tuple, direct.collect()))
