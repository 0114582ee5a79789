"""Benchmark harness: runs the engine's registered queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query executes fully via the no-op sink (count() would let Spark skip
column materialization; noop forces the whole plan) after a shared-session
warmup query to amortize JVM startup out of per-query numbers.

Every entry (queries AND the two end-to-end pipelines) runs
$SPARK_GRAFT_BENCH_REPS times (default 3) and reports the per-entry
MEDIAN — single-shot numbers on a shared VM carry ±40% noise, and medians
are the defensible round-over-round comparison unit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redshift_to_lakehouse_migration_spark.queries import QUERIES
from redshift_to_lakehouse_migration_spark.session import get_spark


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    mid = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    return round(mid, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # strict sf-label parse: a dir like .../sf0.1_v2 or /data/run1 must
    # not record a garbage scale factor that later pairs timings across
    # scales — fall back to the honest directory basename
    import re
    _m = re.search(r"sf([0-9]*\.?[0-9]+)$", sf_dir.rstrip("/"))
    sf = _m.group(1) if _m else os.path.basename(sf_dir.rstrip("/"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark("bench")

    # JVM/codegen/FileSystem warmup — not timed (standard bench practice:
    # the first parquet scan pays one-time Hadoop FS + codegen init that
    # would otherwise land on whichever query sorts first)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from redshift_to_lakehouse_migration_spark.tables import load
    load(spark, sf_dir, "lineitem").selectExpr("count(*)").collect()

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    import gc

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        timings[name] = _median([run_once(name) for _ in range(reps)])
        # Release dropped DataFrame refs promptly so the ContextCleaner
        # unpersists localCheckpoint/cache blocks between entries —
        # otherwise earlier queries' cached blocks add GC pressure to
        # every later entry's timing.
        gc.collect()

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
    pipeline_runs = []
    try:
        datagen.generate(f"{tmp}/raw", n_policies=10_000, seed=42)
        for rep in range(reps):
            t0 = time.perf_counter()
            pipe = build_medallion_pipeline(spark, f"{tmp}/raw",
                                            f"{tmp}/warehouse_{rep}",
                                            "2024-06-01")
            outputs, _ = pipe.run(max_workers=4)
            for df in outputs.values():  # execute every unmaterialized node
                df.write.format("noop").mode("overwrite").save()
            pipeline_runs.append(time.perf_counter() - t0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    pipeline_sec = _median(pipeline_runs)

    # End-to-end corpus-prep pipeline (the LLM-side medallion): gate →
    # exact dedup → near-dup clustering → decontaminate → sample → pack,
    # each stage materialized to parquet like a restartable production run.
    from redshift_to_lakehouse_migration_spark.llm.pipeline import run_corpus_pipeline
    from redshift_to_lakehouse_migration_spark.tables import load as _load
    from redshift_to_lakehouse_migration_spark.tables import spread as _spread

    corpus_runs = []
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    for rep in range(reps):
        tmp2 = tempfile.mkdtemp(prefix="corpus_bench_")
        try:
            t0 = time.perf_counter()
            run_corpus_pipeline(spark, docs, tmp2).write \
                .format("noop").mode("overwrite").save()
            corpus_runs.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(tmp2, ignore_errors=True)
    corpus_sec = _median(corpus_runs)

    total = round(sum(timings.values()) + pipeline_sec + corpus_sec, 3)
    print(json.dumps({
        "metric": "engine_query_suite_plus_pipeline_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": {**timings, "medallion_pipeline_10k": pipeline_sec,
                    "corpus_prep_pipeline": corpus_sec},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "reps": reps,
        "notes": (f"per-entry MEDIANS over {reps} runs; total covers every "
                  "registered query plus TWO materializing end-to-end "
                  "pipelines (medallion 10k, corpus prep); the registry "
                  "grew across rounds, so compare per-entry medians, not "
                  "totals"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
