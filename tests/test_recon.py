"""Reconciliation harness tests (reference mechanism 4, golden-output
parallel-run: `migration_validation/reconciliation.py:39-155`)."""

from __future__ import annotations

from redshift_to_lakehouse_migration_spark import recon


def _pair(spark, drift=0.0, drop_row=False):
    rows = [("A", 10.0, 1), ("B", 20.0, 2), ("C", 30.0, 3)]
    legacy = spark.createDataFrame(rows, "k string, amount double, n int")
    trows = [(k, v + (drift if k == "A" else 0), n) for k, v, n in rows]
    if drop_row:
        trows = trows[:-1]
    target = spark.createDataFrame(trows, "k string, amount double, n int")
    return legacy, target


def test_row_counts_exact(spark):
    legacy, target = _pair(spark, drop_row=True)
    assert not recon.compare_row_counts(legacy, target).passed
    legacy2, target2 = _pair(spark)
    assert recon.compare_row_counts(legacy2, target2).passed


def test_aggregates_tolerance(spark):
    legacy, target = _pair(spark, drift=0.001)  # 0.001/60 ≈ 1.7e-5 < 1e-4
    res = {r.check: r for r in recon.compare_aggregates(legacy, target)}
    assert res["aggregate_sum_amount"].passed
    legacy2, target2 = _pair(spark, drift=1.0)  # 1/60 ≈ 1.7e-2 > 1e-4
    res2 = {r.check: r for r in recon.compare_aggregates(legacy2, target2)}
    assert not res2["aggregate_sum_amount"].passed
    assert res2["aggregate_sum_n"].passed


def test_distributions_and_full_suite(spark):
    legacy, target = _pair(spark, drop_row=True)
    assert not recon.compare_distributions(legacy, target, "k").passed
    legacy2, target2 = _pair(spark)
    results = recon.reconcile(legacy2, target2, distribution_columns=["k"])
    assert all(r.passed for r in results)


def test_distribution_null_bucket_matches(spark):
    """NULL is a real histogram bucket (silver nullifies some columns):
    identical NULL counts on both sides must reconcile — the null-unsafe
    join form reported them as 2 mismatched buckets."""
    from redshift_to_lakehouse_migration_spark.recon import (
        compare_distributions,
    )
    legacy = spark.createDataFrame(
        [("A",), ("A",), (None,), (None,), (None,)], "status string")
    target = spark.createDataFrame(
        [("A",), ("A",), (None,), (None,), (None,)], "status string")
    r = compare_distributions(legacy, target, "status")
    assert r.passed, r.details
    # and a genuinely different NULL count still fails
    worse = spark.createDataFrame([("A",), ("A",), (None,)], "status string")
    assert not compare_distributions(legacy, worse, "status").passed
