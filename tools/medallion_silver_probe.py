"""Shared-silver localCheckpoint probe for the medallion bench entry
(VERDICT r11 #3).

The bench's per-output noop loop re-derives every unmaterialized node
(contract-pinned methodology); each silver transform is re-computed from
its bronze parquet once per downstream consumer. This probe measures, in
ONE session with ABBA interleaving, whether localCheckpointing the four
silver outputs inside the flow would cut the re-derivation cost — without
changing flow.py unless it pays.

Variant A = shipped flow. Variant B = same flow, silver_* node functions
wrapped to `.localCheckpoint(eager=False)` their result.

Usage: python tools/medallion_silver_probe.py [--reps N]
"""

from __future__ import annotations

import argparse
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


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    spark = get_spark("medallion_silver_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    tmp = tempfile.mkdtemp(prefix="medallion_probe_")
    datagen.generate(f"{tmp}/raw", n_policies=10_000, seed=42)

    def run_once(tag: str, checkpoint_silver: bool, rep: int) -> float:
        t0 = time.perf_counter()
        pipe = build_medallion_pipeline(
            spark, f"{tmp}/raw", f"{tmp}/wh_{tag}_{rep}", "2024-06-01")
        if checkpoint_silver:
            for name, node in pipe._nodes.items():
                if name.startswith("silver_"):
                    orig = node.fn

                    def wrapped(s, __orig=orig, **deps):
                        return __orig(s, **deps).localCheckpoint(eager=False)

                    node.fn = wrapped
        outputs, _ = pipe.run(max_workers=4)
        for df in outputs.values():
            df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    try:
        a_runs, b_runs = [], []
        run_once("warm_a", False, 99)
        run_once("warm_b", True, 98)
        for rep in range(args.reps):
            a_runs.append(run_once("a", False, rep * 2))
            b_runs.append(run_once("b", True, rep * 2))
            b_runs.append(run_once("b", True, rep * 2 + 1))
            a_runs.append(run_once("a", False, rep * 2 + 1))
        print(f"shipped median={_median(a_runs):.3f}s "
              f"silver-ckpt median={_median(b_runs):.3f}s")
        print(f"a_reps={[round(x, 3) for x in a_runs]}")
        print(f"b_reps={[round(x, 3) for x in b_runs]}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
