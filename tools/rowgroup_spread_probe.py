"""Re-evaluate spread() on multi-row-group input (VERDICT r11 #5).

The r11 §2.5 finding: every driver sf0.1 table is ONE parquet row group,
so scans populate a single split and serialize downstream per-row work
onto one core — `tables.spread` (repartition-when-underpartitioned) is
the mitigation, ~30 call sites. This probe answers whether those sites
still pay on a layout a production table would actually have: the SAME
generated sf0.1 data written single-row-group vs multi-row-group
(tools/gen_scale_data.py row_group_size arg), with spread ON (shipped)
vs OFF (monkeypatched to identity), ABBA-interleaved in one session.

Note Spark's split packing is BYTE-based (maxSplitBytes =
max(openCostInBytes, totalBytes/parallelism) capped at
maxPartitionBytes), so a ~15 MB file yields ~4 splits regardless of row
groups; multi-row-group layout decides how many of those splits carry
ROWS (all of them) vs one (single-group layout). Neither layout reaches
32 populated partitions at sf0.1 file sizes — that takes cluster-scale
files — so the probe quantifies how much of spread's win survives the
layout fix rather than expecting it to vanish.

Usage: python tools/rowgroup_spread_probe.py [--reps N] [entries...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redshift_to_lakehouse_migration_spark import tables
from redshift_to_lakehouse_migration_spark.queries import QUERIES
from redshift_to_lakehouse_migration_spark.session import get_spark

DEFAULT_ENTRIES = ("recon_global_aggregates", "agg_pricing_summary",
                   "dedup_ngram_jaccard", "contamination_check")
RG1 = "/root/repo/testdata_sf0.1_rg1"
RG8 = "/root/repo/testdata_sf0.1_rg8"


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _spread_consumers():
    """Every loaded engine module whose namespace holds tables.spread
    under any name (`from ..tables import spread [as _spread]`)."""
    out = []
    for name, mod in list(sys.modules.items()):
        if not name.startswith("redshift_to_lakehouse_migration_spark"):
            continue
        for attr, val in list(vars(mod).items()):
            if val is tables.spread:
                out.append((mod, attr))
    return out


class _SpreadOff:
    def __enter__(self):
        self._orig = tables.spread
        self._sites = _spread_consumers()
        identity = lambda df, spark: df  # noqa: E731
        tables.spread = identity
        for mod, attr in self._sites:
            setattr(mod, attr, identity)
        return self

    def __exit__(self, *exc):
        tables.spread = self._orig
        for mod, attr in self._sites:
            setattr(mod, attr, self._orig)
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("entries", nargs="*", default=list(DEFAULT_ENTRIES))
    args = ap.parse_args()

    spark = get_spark("rowgroup_spread_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_once(name, sf_dir, spread_on):
        ctx = _SpreadOff() if not spread_on else None
        if ctx:
            ctx.__enter__()
        try:
            spark.sparkContext.setJobDescription(
                f"rg:{name}:{os.path.basename(sf_dir)}:"
                f"{'on' if spread_on else 'off'}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            return time.perf_counter() - t0
        finally:
            if ctx:
                ctx.__exit__()
            spark.sparkContext.setJobDescription(None)

    for name in args.entries:
        for sf_dir, tag in ((RG1, "rg1"), (RG8, "rg8")):
            on_runs, off_runs = [], []
            run_once(name, sf_dir, True)   # warm
            run_once(name, sf_dir, False)
            for _ in range(args.reps):
                on_runs.append(run_once(name, sf_dir, True))
                off_runs.append(run_once(name, sf_dir, False))
                off_runs.append(run_once(name, sf_dir, False))
                on_runs.append(run_once(name, sf_dir, True))
            print(f"{name} [{tag}]: spread-ON={_median(on_runs):.3f}s "
                  f"spread-OFF={_median(off_runs):.3f}s "
                  f"on={[round(x, 3) for x in on_runs]} "
                  f"off={[round(x, 3) for x in off_runs]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
