"""Per-entry profiler for the optimization rounds (guide §1).

For each named query: build the plan (timed — planning cost is real at
this scale), run it through the noop sink `reps` times (guide §1.4),
print per-rep wall seconds + median, and optionally dump
`.explain('formatted')` to a file.

Usage:
  python tools/profile_entry.py [--reps N] [--plans DIR] [--sf SF_DIR] q1 q2 ...

Runs on the same engine session as bench.py (get_spark + warmup) so the
numbers are comparable to BENCH medians.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redshift_to_lakehouse_migration_spark.queries import QUERIES
from redshift_to_lakehouse_migration_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans", default=None,
                    help="directory to write <name>.txt formatted plans")
    ap.add_argument("--suffix", default="",
                    help="suffix for plan files, e.g. _before/_after")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile")
    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from redshift_to_lakehouse_migration_spark.tables import load
    load(spark, args.sf, "lineitem").selectExpr("count(*)").collect()

    def median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    for name in args.names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = QUERIES[name](spark, args.sf)
        build_s = time.perf_counter() - t0
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(
                    args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        runs = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            d = QUERIES[name](spark, args.sf)
            d.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        rep_str = " ".join(f"{r:.3f}" for r in runs)
        print(f"{name}: build={build_s:.3f}s median={median(runs):.3f}s "
              f"reps=[{rep_str}]")


if __name__ == "__main__":
    main()
