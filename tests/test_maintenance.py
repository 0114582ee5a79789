"""Maintenance ops: compaction reduces file count without changing data;
bucketed tables join WITHOUT a shuffle exchange (the co-located join that
replaces Redshift DISTKEY at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.maintenance import (
    compact_parquet, write_bucketed,
)
from redshift_to_lakehouse_migration_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_compaction_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    orders = load(spark, SF, "orders")
    orders.repartition(64).write.parquet(path)          # breed small files
    before_files = len(spark.read.parquet(path).inputFiles())
    checksum = spark.read.parquet(path).agg(
        F.sum("o_orderkey"), F.count("*")).collect()[0]

    compact_parquet(spark, path, target_mb=256)

    after = spark.read.parquet(path)
    assert len(after.inputFiles()) < before_files
    assert after.agg(F.sum("o_orderkey"),
                     F.count("*")).collect()[0] == checksum


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load(spark, SF, "orders")
        lineitem = load(spark, SF, "lineitem")
        write_bucketed(orders, "b_orders", "o_orderkey", 8,
                       sort_col="o_orderkey")
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", "o_orderkey", 8, sort_col="o_orderkey")

        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan   # co-located
        # same join on raw parquet DOES shuffle — the bucketing is the win
        raw = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey")
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in raw_plan
        assert joined.count() == raw.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
