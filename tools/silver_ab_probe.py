"""Matched-A/B probe: time the end-to-end medallion pipeline (10k
policies, seed 42 — the bench's `medallion_pipeline_10k` entry) against
whatever `medallion/silver.py` is currently on disk, and print one JSON
line.  An orchestrating loop swaps silver.py between invocations to get
an interleaved same-host-window A/B (the r6-established protocol: never
compare across sessions; alternate variants within one window and
compare medians).

Usage: python tools/silver_ab_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redshift_to_lakehouse_migration_spark import datagen
from redshift_to_lakehouse_migration_spark.medallion.flow import (
    build_medallion_pipeline,
)
from redshift_to_lakehouse_migration_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("silver_ab_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.mkdtemp(prefix="silver_ab_")
    runs = []
    try:
        datagen.generate(f"{tmp}/raw", n_policies=10_000, seed=42)
        for rep in range(reps + 1):  # rep 0 = warmup, untimed
            t0 = time.perf_counter()
            pipe = build_medallion_pipeline(spark, f"{tmp}/raw",
                                            f"{tmp}/warehouse_{rep}",
                                            "2024-06-01")
            outputs, _ = pipe.run(max_workers=4)
            for df in outputs.values():
                df.write.format("noop").mode("overwrite").save()
            if rep > 0:
                runs.append(round(time.perf_counter() - t0, 3))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # ONE median definition repo-wide (bench._median): a second inline
    # copy rounded differently and could drift from the shipped bench
    from bench import _median
    print(json.dumps({"median_s": _median(runs), "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
