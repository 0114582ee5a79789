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

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "engine_query_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
