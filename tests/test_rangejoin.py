"""Binned range-join semantics: exclusive lower / inclusive upper bounds,
bucket-boundary values, key confinement, and the fixed 2x left-side
explosion (never data-dependent growth)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.rangejoin import range_join_binned


def _ts(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    for c in df.columns:
        if c.endswith("_s"):
            df = df.withColumn(c[:-2], F.timestamp_seconds(F.col(c))) \
                   .drop(c)
    return df


@pytest.fixture(scope="module")
def pair(spark):
    left = _ts(spark, [("u1", 1, 1000.0), ("u2", 2, 1000.0)],
               "u string, lid long, lts_s double")
    right = _ts(spark, [
        ("u1", 10, 1000.0),    # gap 0      → excluded (lower exclusive)
        ("u1", 11, 1000.5),    # gap 0.5    → in
        ("u1", 12, 1060.0),    # gap 60     → in (upper inclusive)
        ("u1", 13, 1060.1),    # gap 60.1   → out
        ("u1", 14, 999.0),     # before     → out
        ("u2", 15, 1030.0),    # other key  → in for u2 only
    ], "u string, rid long, rts_s double")
    return left, right


def test_bounds_and_key_confinement(spark, pair):
    left, right = pair
    out = range_join_binned(left, right, ["u"], "lts", "rts",
                            lower=0.0, upper=60.0)
    got = {(r.u, r.lid, r.rid) for r in out.collect()}
    assert got == {("u1", 1, 11), ("u1", 1, 12), ("u2", 2, 15)}


def test_bucket_boundary_match_survives(spark):
    # right row exactly at a bucket edge and at the left row's upper bound
    left = _ts(spark, [("u", 1, 0.0)], "u string, lid long, lts_s double")
    right = _ts(spark, [("u", 2, 60.0)], "u string, rid long, rts_s double")
    out = range_join_binned(left, right, ["u"], "lts", "rts", 0.0, 60.0)
    assert [r.rid for r in out.collect()] == [2]


def test_rejects_empty_interval(spark, pair):
    left, right = pair
    with pytest.raises(ValueError, match="upper > lower"):
        range_join_binned(left, right, ["u"], "lts", "rts", 60.0, 60.0)


def test_submicrosecond_window_rejected(spark):
    """A window that rounds to zero microseconds must raise, not divide
    by zero into silent empty output."""
    import pytest

    from redshift_to_lakehouse_migration_spark.rangejoin import (
        range_join_binned,
    )

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00")], "k string, ts string") \
        .selectExpr("k", "cast(ts as timestamp) ts")
    with pytest.raises(ValueError, match="at least 1 microsecond"):
        range_join_binned(df, df, ["k"], "ts", "ts", 0.0, 4e-7)
