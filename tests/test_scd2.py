"""Pure-Spark SCD2 tests: close-on-change, insert-new, no-op on unchanged,
same-batch multi-update dedup (richer than the reference — SURVEY §7.3 #4)."""

from __future__ import annotations

from redshift_to_lakehouse_migration_spark import scd2


def _dim(spark):
    snap = spark.createDataFrame(
        [("P1", "ACTIVE", 100.0, "2024-01-01"),
         ("P2", "ACTIVE", 200.0, "2024-01-01")],
        "policy_id string, status string, premium double, updated_at string")
    return scd2.init_scd2(snap, "2024-01-01")


def test_close_and_insert_on_change(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [("P1", "CANCELLED", 100.0, "2024-02-01"),   # changed → new version
         ("P2", "ACTIVE", 200.0, "2024-02-01"),      # unchanged → no-op
         ("P3", "ACTIVE", 300.0, "2024-02-01")],     # brand new
        "policy_id string, status string, premium double, updated_at string")
    out = scd2.scd2_merge(dim, updates, ["policy_id"],
                          ["status", "premium"], "2024-02-01",
                          order_col="updated_at")
    rows = {(r.policy_id, r.is_current): r for r in out.collect()}
    assert len(rows) == 4
    closed = rows[("P1", False)]
    assert str(closed.effective_end_date) == "2024-02-01"
    assert closed.status == "ACTIVE"
    new = rows[("P1", True)]
    assert new.status == "CANCELLED"
    assert new.effective_end_date is None
    p2 = rows[("P2", True)]
    assert str(p2.effective_start_date) == "2024-01-01"  # untouched
    assert rows[("P3", True)].premium == 300.0


def test_same_batch_multiple_updates_dedup_to_latest(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [("P1", "SUSPENDED", 100.0, "2024-02-01"),
         ("P1", "CANCELLED", 100.0, "2024-02-15")],  # later wins
        "policy_id string, status string, premium double, updated_at string")
    out = scd2.scd2_merge(dim, updates, ["policy_id"],
                          ["status", "premium"], "2024-02-15",
                          order_col="updated_at")
    current = [r for r in out.collect()
               if r.policy_id == "P1" and r.is_current]
    assert len(current) == 1
    assert current[0].status == "CANCELLED"


def test_idempotent_when_no_changes(spark):
    dim = _dim(spark)
    updates = spark.createDataFrame(
        [("P1", "ACTIVE", 100.0, "2024-03-01")],
        "policy_id string, status string, premium double, updated_at string")
    out = scd2.scd2_merge(dim, updates, ["policy_id"],
                          ["status", "premium"], "2024-03-01",
                          order_col="updated_at")
    assert out.count() == 2
    assert out.filter("is_current").count() == 2


def test_scd2_from_history(spark):
    events = spark.createDataFrame(
        [("P1", "A", "2024-01-01"), ("P1", "B", "2024-02-01"),
         ("P2", "A", "2024-01-15")],
        "policy_id string, status string, updated_at string")
    out = scd2.scd2_from_history(events, ["policy_id"], "updated_at")
    p1 = {r.status: r for r in out.collect() if r.policy_id == "P1"}
    assert str(p1["A"].effective_end_date) == "2024-02-01"
    assert not p1["A"].is_current
    assert p1["B"].is_current and p1["B"].effective_end_date is None


def test_scd2_merge_null_business_key_closes_and_versions(spark):
    """NULL-valued business keys are real key values: the change-detection
    join was already null-safe, but the routing semi/anti joins were not —
    a changed NULL-key row used to stay current forever while a second
    current row was inserted."""
    from pyspark.sql import functions as F

    from redshift_to_lakehouse_migration_spark.scd2 import (
        init_scd2, scd2_merge,
    )

    dim = init_scd2(spark.createDataFrame(
        [(None, "OLD"), ("K1", "A")], "k string, v string"), "2024-01-01")
    updates = spark.createDataFrame([(None, "NEW")], "k string, v string")
    out = scd2_merge(dim, updates, ["k"], ["v"], "2024-06-01").cache()

    null_rows = out.filter(F.col("k").isNull()).orderBy("is_current")
    got = [(r.v, r.is_current, str(r.effective_end_date))
           for r in null_rows.collect()]
    assert got == [("OLD", False, "2024-06-01"),
                   ("NEW", True, "None")]
    # exactly ONE current row per key (incl. the NULL key)
    per_key = (out.filter("is_current")
               .groupBy("k").count().filter("count > 1").count())
    assert per_key == 0
    # untouched key passes through
    assert out.filter("k = 'K1' AND is_current").count() == 1
