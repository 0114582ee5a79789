"""Interleaved checkpoint-on/off A/B for the four r11 checkpoint-gaining
entries (VERDICT r11 directive #1).

The r11 driver's 32-core bench was contaminated (canary 1.35x slower than
r10's with 1.52x in-run drift), and the four entries that gained lazy
``localCheckpoint``s that round — dedup_minhash_lsh, dedup_clusters,
corpus_funnel, contamination_check — were exactly its worst outliers, so
the change family's only 32-core datapoint was bad for it. This probe
settles the question the way the verdict asks: ONE session at
local[$SPARK_GRAFT_CPUS], ABBA-interleaved reps of each entry with the
r11-added checkpoint ON (shipped code) vs OFF (same plan minus the
checkpoint), through the noop sink, medians per variant.

Toggle mechanics: each r11 checkpoint site is behind a ``materialize``
keyword (llm/dedup.py ``minhash_lsh_pairs`` / ``jaccard_pairs``,
queries/curation.py ``contamination_check``, llm/pipeline.py ``funnel``);
the probe monkeypatches the DEFAULT to False for the OFF legs so the
measured object stays the registered QUERIES entry, byte-for-byte.

Usage: python tools/checkpoint_ab_probe.py [--reps N] [--sf SF_DIR]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redshift_to_lakehouse_migration_spark.queries import QUERIES
from redshift_to_lakehouse_migration_spark.session import get_spark

ENTRIES = ("contamination_check", "dedup_minhash_lsh", "dedup_clusters",
           "corpus_funnel")


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


class _Toggles:
    """Force every r11-added checkpoint site's ``materialize`` default."""

    def __init__(self, value: bool):
        self.value = value
        self._saved = []

    def __enter__(self):
        if self.value:
            return self  # shipped defaults ARE the ON variant
        from redshift_to_lakehouse_migration_spark.llm import dedup as D
        from redshift_to_lakehouse_migration_spark.llm import (
            pipeline as P,
        )
        from redshift_to_lakehouse_migration_spark.queries import (
            curation as C,
        )

        def force_off(mod, name):
            orig = getattr(mod, name)

            @functools.wraps(orig)
            def wrapper(*a, **kw):
                kw["materialize"] = False
                return orig(*a, **kw)

            self._saved.append((mod, name, orig))
            setattr(mod, name, wrapper)

        force_off(D, "jaccard_pairs")        # dedup_clusters, funnel
        force_off(D, "minhash_lsh_pairs")    # dedup_minhash_lsh
        force_off(C, "contamination_check")
        # QUERIES captured the original fn object at registry build time;
        # point the dict entry at the wrapper for the OFF legs
        QUERIES["contamination_check"] = C.contamination_check
        force_off(P, "funnel")               # corpus_funnel's wrapper does
        # `from ..llm.pipeline import funnel` inside the fn body, so the
        # module-attr patch is picked up at call time.
        return self

    def __exit__(self, *exc):
        from redshift_to_lakehouse_migration_spark.queries import (
            curation as C,
        )
        for mod, name, orig in reversed(self._saved):
            setattr(mod, name, orig)
        self._saved.clear()
        QUERIES["contamination_check"] = C.contamination_check
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("ckpt_ab_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from redshift_to_lakehouse_migration_spark.tables import load
    load(spark, args.sf, "lineitem").selectExpr("count(*)").collect()

    def run_once(name: str, on: bool) -> float:
        with _Toggles(on):
            spark.sparkContext.setJobDescription(
                f"ab:{name}:{'on' if on else 'off'}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            return dt

    import gc
    results: dict[str, dict[str, list[float]]] = {}
    for name in ENTRIES:
        on_runs: list[float] = []
        off_runs: list[float] = []
        # warmup one untimed leg per variant (codegen/scan init)
        run_once(name, True)
        run_once(name, False)
        for _ in range(args.reps):
            # ABBA within each rep pair to cancel linear drift
            on_runs.append(run_once(name, True))
            off_runs.append(run_once(name, False))
            off_runs.append(run_once(name, False))
            on_runs.append(run_once(name, True))
            gc.collect()
        results[name] = {"on": on_runs, "off": off_runs}
        print(f"{name}: ON median={_median(on_runs):.3f}s "
              f"OFF median={_median(off_runs):.3f}s  "
              f"on_reps={[round(x, 3) for x in on_runs]} "
              f"off_reps={[round(x, 3) for x in off_runs]}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
