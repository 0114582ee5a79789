"""Skew-mitigation tests: salted two-stage aggregation and salted join
must be semantics-identical to their direct forms, and the salt must
actually scatter hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.skew import (
    add_salt, salted_groupby, salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 90% of rows share key "HOT"
    rows = [("HOT" if i % 10 else f"k{i}", float(i), i) for i in range(1000)]
    return spark.createDataFrame(rows, "k string, v double, n long")


def test_salted_groupby_matches_direct(spark, skewed):
    salted = salted_groupby(
        skewed, ["k"], 16,
        cnt=("*", "count"), total=("n", "sum"),
        lo=("v", "min"), hi=("v", "max"), mean=("v", "avg"))
    direct = skewed.groupBy("k").agg(
        F.count("*").alias("cnt"), F.sum("n").alias("total"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.avg("v").alias("mean"))
    s = {r.k: r for r in salted.collect()}
    d = {r.k: r for r in direct.collect()}
    assert set(s) == set(d)
    for k in d:
        assert s[k].cnt == d[k].cnt and s[k].total == d[k].total
        assert s[k].lo == d[k].lo and s[k].hi == d[k].hi
        assert abs(s[k].mean - d[k].mean) < 1e-9


def test_salt_scatters_hot_key(spark, skewed):
    n_buckets = (add_salt(skewed, 16).filter("k = 'HOT'")
                 .select("__salt").distinct().count())
    assert n_buckets >= 8          # 900 rows over 16 salts must spread


def test_salt_scatters_byte_identical_rows(spark):
    # the mass-duplicate degeneracy: rows identical in EVERY column (at-
    # least-once redelivery, boilerplate spam) hash to ONE salt under a
    # pure content hash — the whole hot group lands on one reducer and
    # the two-stage plan silently degrades to the unsalted cost. The
    # partition-id term in the default salt must split copies that span
    # input partitions.
    dup = (spark.createDataFrame([("HOT", 1.0)] * 2000, "k string, v double")
           .repartition(16))
    n_buckets = add_salt(dup, 16).select("__salt").distinct().count()
    assert n_buckets >= 8

    # and the two-stage aggregate over the degenerate input still matches
    # the direct groupBy exactly
    salted = salted_groupby(dup, ["k"], 16,
                            cnt=("*", "count"), total=("v", "sum"))
    row = salted.collect()[0]
    assert row.k == "HOT" and row.cnt == 2000 and row.total == 2000.0


def test_salt_explicit_salt_from_stays_content_only(spark):
    # explicit salt_from opts OUT of partition-id mixing: salt values must
    # be a pure function of the named columns (stable across
    # repartitionings of the same rows)
    df = spark.createDataFrame(
        [(f"k{i}", i) for i in range(100)], "k string, n long")
    a = {(r["k"], r["__salt"]) for r in
         add_salt(df.repartition(4), 8, salt_from=["k"]).collect()}
    b = {(r["k"], r["__salt"]) for r in
         add_salt(df.repartition(13), 8, salt_from=["k"]).collect()}
    assert a == b


def test_salted_groupby_rejects_holistic(spark, skewed):
    with pytest.raises(ValueError, match="not decomposable"):
        salted_groupby(skewed, ["k"], 4, med=("v", "median"))


def test_salted_join_matches_direct(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot label")] + [(f"k{i}", f"l{i}") for i in range(1, 20)],
        "k string, label string")
    salted = salted_join(skewed, dim, ["k"], n_salts=8, how="inner")
    direct = skewed.join(dim, "k", "inner")
    assert salted.count() == direct.count()
    assert salted.columns == direct.columns
    s = salted.groupBy("k").count().collect()
    d = dict((r.k, r["count"]) for r in direct.groupBy("k").count().collect())
    assert {r.k: r["count"] for r in s} == d


def test_salted_groupby_null_measures_match_direct(spark):
    """NULL measures through the two-stage decomposition (aggspec.py)
    must match the direct groupBy exactly: per-stage sum/min/max skip
    NULLs, count(col) skips them while count(*) does not, and an
    all-NULL group must yield NULL sums/mins/avgs — not 0."""
    rows = [
        ("a", None, None), ("a", 2.0, 5), ("a", None, 7),
        ("b", None, None), ("b", None, None),      # all-NULL group
        ("c", 1.5, 1),
    ] * 50                                          # spread across salts
    df = spark.createDataFrame(rows, "k string, v double, n long")
    salted = salted_groupby(
        df, ["k"], 8,
        rows_all=("*", "count"), vals=("v", "count"), total=("n", "sum"),
        lo=("v", "min"), hi=("v", "max"), mean=("v", "avg"))
    direct = df.groupBy("k").agg(
        F.count("*").alias("rows_all"), F.count("v").alias("vals"),
        F.sum("n").alias("total"), F.min("v").alias("lo"),
        F.max("v").alias("hi"), F.avg("v").alias("mean"))
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, direct.collect()))
    b = {r["k"]: r for r in salted.collect()}["b"]
    assert b["total"] is None and b["mean"] is None and b["vals"] == 0


def test_salted_groupby_decimal_avg_dtype_matches_direct(spark):
    """DECIMAL means through the pair decomposition must land on the
    dtype native avg produces — the raw sum/count quotient's wider
    division type is numerically equal but its trailing-zero string
    form would flip an oracle value hash (aggspec._native_avg_type)."""
    df = spark.createDataFrame(
        [("a", "1.23"), ("a", "2.47"), ("b", "9.99")],
        "k string, v_s string").select(
        "k", F.col("v_s").cast("decimal(12,2)").alias("v"))
    direct = df.groupBy("k").agg(F.avg("v").alias("mean"))
    salted = salted_groupby(df, ["k"], 4, mean=("v", "avg"))
    assert salted.schema["mean"].dataType == direct.schema["mean"].dataType
    assert sorted(map(tuple, salted.collect())) == \
        sorted(map(tuple, direct.collect()))
