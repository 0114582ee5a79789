"""Measure the bucketed fact_claims rebuild against the plain one at scale
(VERDICT r9 #5): `build_fact_claims_bucketed` is plan-asserted exchange-free
on policy_id at test scale, but the 100-TB claim is ECONOMIC — the bucket
write pays the claims⋈policies shuffle ONCE, and every later gold rebuild
reads co-located buckets instead of re-shuffling both sides. This probe
makes that show up as measured wall time: synthesize silver-shaped inputs
at the r9 gold-probe scale (2M policies / 4M claims / 2M properties) and a
2x point, materialize them to parquet, then time N plain rebuilds vs the
one-time bucket write + N bucketed rebuilds.

Inputs are synthesized Spark-side (spark.range + column expressions, no
driver-side row building) with the exact column set `build_fact_claims`
consumes (`medallion/gold.py:188-238`); the reference's rebuild-the-gold-
layer-per-batch orchestration is `databricks.yml`'s job DAG.

Usage: python tools/bucketed_gold_probe.py [n_policies] [n_rebuilds]
Prints one JSON line; paste the numbers into SCALE.md's bucketed-path row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def synth_silver(spark, n_policies: int, n_claims: int, n_props: int):
    from pyspark.sql import functions as F

    policies = spark.range(n_policies).select(
        F.concat(F.lit("POL"), F.col("id")).alias("policy_id"),
        F.concat(F.lit("PRP"), (F.col("id") % n_props)).alias("property_id"),
        F.element_at(F.array(*[F.lit(c) for c in
                               ("HO3", "HO5", "DP3", "HO4", "HO6")]),
                     (F.col("id") % 5 + 1).cast("int"))
         .alias("coverage_type_code"),
        (F.rand(1) * 2000 + 500).cast("decimal(12,2)")
         .alias("annual_premium"),
        (F.rand(2) * 5000).cast("decimal(12,2)").alias("deductible"),
        (F.rand(3) * 500000 + 50000).cast("decimal(12,2)")
         .alias("coverage_limit"),
        F.concat(F.lit("AG"), (F.col("id") % 997)).alias("agent_id"),
    )
    claims = spark.range(n_claims).select(
        F.concat(F.lit("CLM"), F.col("id")).alias("claim_id"),
        F.concat(F.lit("POL"), (F.col("id") % n_policies))
         .alias("policy_id"),
        F.date_add(F.lit("2023-01-01").cast("date"),
                   (F.col("id") % 365).cast("int")).alias("claim_date"),
        F.date_add(F.lit("2023-01-05").cast("date"),
                   (F.col("id") % 365).cast("int")).alias("reported_date"),
        F.when(F.col("id") % 3 == 0,
               F.date_add(F.lit("2023-02-01").cast("date"),
                          (F.col("id") % 365).cast("int")))
         .alias("closed_date"),
        F.element_at(F.array(*[F.lit(c) for c in
                               ("WATER", "WIND", "FIRE", "THEFT")]),
                     (F.col("id") % 4 + 1).cast("int")).alias("claim_type"),
        F.element_at(F.array(*[F.lit(c) for c in
                               ("OPEN", "APPROVED", "CLOSED", "DENIED")]),
                     (F.col("id") % 4 + 1).cast("int"))
         .alias("claim_status"),
        F.element_at(F.array(*[F.lit(c) for c in
                               ("storm", "leak", "arson", "unknown")]),
                     (F.col("id") % 4 + 1).cast("int"))
         .alias("cause_of_loss"),
        (F.rand(4) * 90000).cast("decimal(12,2)").alias("claim_amount"),
        F.when(F.col("id") % 5 != 0, (F.rand(5) * 80000)
               .cast("decimal(12,2)")).alias("approved_amount"),
        (F.rand(6) * 5000).cast("decimal(12,2)")
         .alias("deductible_applied"),
    )
    properties = spark.range(n_props).select(
        F.concat(F.lit("PRP"), F.col("id")).alias("property_id"),
        F.element_at(F.array(*[F.lit(c) for c in
                               ("FL", "TX", "CA", "NY", "WA")]),
                     (F.col("id") % 5 + 1).cast("int")).alias("state"),
        F.concat(F.lit("County"), (F.col("id") % 200)).alias("county"),
        F.element_at(F.array(*[F.lit(c) for c in
                               ("FRAME", "MASONRY", "FIRE_RESISTIVE")]),
                     (F.col("id") % 3 + 1).cast("int"))
         .alias("construction_type"),
        F.element_at(F.array(*[F.lit(c) for c in ("X", "AE", "VE")]),
                     (F.col("id") % 3 + 1).cast("int")).alias("flood_zone"),
    )
    return claims, policies, properties


def main() -> None:
    import shutil
    import tempfile

    from redshift_to_lakehouse_migration_spark.medallion.gold import (
        build_fact_claims, build_fact_claims_bucketed)
    from redshift_to_lakehouse_migration_spark.session import get_spark

    n_policies = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_rebuilds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_claims, n_props = n_policies * 2, n_policies

    spark = get_spark("bucketed_gold_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    tmp = tempfile.mkdtemp(prefix="bucketed_gold_probe_")
    out: dict = {"n_policies": n_policies, "n_claims": n_claims,
                 "n_rebuilds": n_rebuilds}
    prefix = "probe_fcb_"
    try:
        c, p, pr = synth_silver(spark, n_policies, n_claims, n_props)
        c.write.parquet(f"{tmp}/claims")
        p.write.parquet(f"{tmp}/policies")
        pr.write.parquet(f"{tmp}/properties")
        claims = spark.read.parquet(f"{tmp}/claims")
        policies = spark.read.parquet(f"{tmp}/policies")
        properties = spark.read.parquet(f"{tmp}/properties")

        def run_noop(df) -> float:
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 2)

        # ---- plain path: every rebuild re-shuffles claims⋈policies
        run_noop(build_fact_claims(claims, policies, properties))  # warm
        out["plain_rebuild_s"] = [
            run_noop(build_fact_claims(claims, policies, properties))
            for _ in range(n_rebuilds)]
        plan = (build_fact_claims(claims, policies, properties)
                ._jdf.queryExecution().executedPlan().toString())
        out["plain_policy_exchanges"] = plan.count(
            "Exchange hashpartitioning(policy_id")
        out["plain_joins"] = (f"BHJ={plan.count('BroadcastHashJoin')} "
                              f"SMJ={plan.count('SortMergeJoin')}")

        # ---- bucketed path: pay the shuffle once in the bucket write
        t0 = time.perf_counter()
        fc = build_fact_claims_bucketed(spark, claims, policies, properties,
                                        n_buckets=32, table_prefix=prefix)
        out["bucket_write_s"] = round(time.perf_counter() - t0, 2)
        run_noop(fc)  # warm
        bc = spark.table(f"{prefix}claims")
        bp = spark.table(f"{prefix}policies")
        out["bucketed_rebuild_s"] = [
            run_noop(build_fact_claims(bc, bp, properties))
            for _ in range(n_rebuilds)]
        plan = (build_fact_claims(bc, bp, properties)
                ._jdf.queryExecution().executedPlan().toString())
        out["bucketed_policy_exchanges"] = plan.count(
            "Exchange hashpartitioning(policy_id")
        out["bucketed_joins"] = (f"BHJ={plan.count('BroadcastHashJoin')} "
                                 f"SMJ={plan.count('SortMergeJoin')}")

        from statistics import median
        med = median(out["plain_rebuild_s"])
        medb = median(out["bucketed_rebuild_s"])
        out["plain_median_s"], out["bucketed_median_s"] = med, medb
        out["rebuild_speedup"] = round(med / medb, 2) if medb else None
        # rebuild count at which the one-time bucket write has paid for
        # itself (the economics a nightly gold refresh actually runs on)
        gain = med - medb
        out["breakeven_rebuilds"] = (
            round(out["bucket_write_s"] / gain, 1) if gain > 0 else None)
        print(json.dumps(out))
    finally:
        for t in (f"{prefix}claims", f"{prefix}policies"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
