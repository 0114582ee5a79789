"""Benchmark harness: runs the engine's registered queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query executes fully via the no-op sink (count() would let Spark skip
column materialization; noop forces the whole plan) after a shared-session
warmup query to amortize JVM startup out of per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redshift_to_lakehouse_migration_spark.queries import QUERIES
from redshift_to_lakehouse_migration_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # JVM/codegen/FileSystem warmup — not timed (standard bench practice:
    # the first parquet scan pays one-time Hadoop FS + codegen init that
    # would otherwise land on whichever query sorts first)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from redshift_to_lakehouse_migration_spark.tables import load
    load(spark, sf_dir, "lineitem").selectExpr("count(*)").collect()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # End-to-end medallion pipeline (BASELINE.md bench plan): generate the
    # reference's default scale (10k policies, seed 42 —
    # sample_data/generate_sample_data.py:274) and run bronze→silver→gold
    # through the DAG runner, publishing bronze + partitioned fact_claims.
    import shutil
    import tempfile

    from redshift_to_lakehouse_migration_spark import datagen
    from redshift_to_lakehouse_migration_spark.medallion.flow import (
        build_medallion_pipeline,
    )

    tmp = tempfile.mkdtemp(prefix="medallion_bench_")
    try:
        datagen.generate(f"{tmp}/raw", n_policies=10_000, seed=42)
        t0 = time.perf_counter()
        pipe = build_medallion_pipeline(spark, f"{tmp}/raw",
                                        f"{tmp}/warehouse", "2024-06-01")
        outputs, _ = pipe.run(max_workers=4)
        for df in outputs.values():     # execute every unmaterialized node
            df.write.format("noop").mode("overwrite").save()
        pipeline_sec = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # End-to-end corpus-prep pipeline (the LLM-side medallion): gate →
    # exact dedup → near-dup clustering → decontaminate → sample → pack,
    # each stage materialized to parquet like a restartable production run.
    from redshift_to_lakehouse_migration_spark.llm.pipeline import run_corpus_pipeline
    from redshift_to_lakehouse_migration_spark.tables import load as _load
    from redshift_to_lakehouse_migration_spark.tables import spread as _spread

    tmp2 = tempfile.mkdtemp(prefix="corpus_bench_")
    try:
        docs = _spread(_load(spark, sf_dir, "documents"), spark)
        t0 = time.perf_counter()
        run_corpus_pipeline(spark, docs, tmp2).write \
            .format("noop").mode("overwrite").save()
        corpus_sec = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp2, ignore_errors=True)

    total = round(sum(timings.values()) + pipeline_sec + corpus_sec, 3)
    print(json.dumps({
        "metric": "engine_query_suite_plus_pipeline_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": {**timings, "medallion_pipeline_10k": pipeline_sec,
                    "corpus_prep_pipeline": corpus_sec},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "notes": ("total covers every registered query plus TWO "
                  "materializing end-to-end pipelines (medallion 10k, "
                  "corpus prep); the registry grew across rounds, so "
                  "compare per-entry times, not totals"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
