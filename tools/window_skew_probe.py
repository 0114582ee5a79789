"""Measure the hot-key cliff on exact window operators — and the
skew-safe composition that sidesteps it where the workload allows.

The scale probes (tools/scale_probe.py) grow DATA under the driver's
key distribution; this probe holds N fixed and grows ONE key's share
(uniform → 50% → 90% → 99%). Exact window functions partition by key,
and a window partition cannot be salted or AQE-split without changing
semantics — at 100 TB a single hot key with 10^9 rows means ONE task
sorts 10^9 rows, no matter how many executors exist. Two forms of the
same query ("per event, count the SAME key's events in the preceding W
seconds", the registered `events_rolling_hour_range` shape) are raced:

1. `window`: RANGE-frame count — one shuffle on the key, per-key
   single-task sort. O(rows_per_key · log) on the hot key's ONE task.
2. `rangejoin`: `rangejoin.range_join_binned` on (key, time-bucket)
   + hash aggregate + tie join. The bucket component spreads the hot
   key across time, so parallelism tracks buckets, not keys — but the
   join MATERIALIZES every (event, in-window-candidate) pair, so its
   cost is O(N · window_density), skew-free.

To isolate SKEW from DENSITY, the window length W is chosen PER RUN so
the hot key's expected in-window candidate count stays ~16 (both forms
run the same W within a run; results asserted equal every run). The
decision rule this measures: the window form wins while per-key row
counts fit a task; past the skew point the binned form wins IF window
density is bounded — when BOTH per-key rows and density are huge, no
exact form is cheap and the answer is a coarser continuous aggregate
(rollup.py) feeding an approximate rolling count.

Usage: python tools/window_skew_probe.py [n_rows]   (default 1M)
Output: markdown table on stdout (recorded in SCALE.md).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TARGET_IN_WINDOW = 16  # expected hot-key candidates per window


def build(spark, n: int, hot_share: float):
    """n events over n seconds (1 ev/s overall); `hot_share` of rows on
    key 0, the rest uniform over 1024 keys. Deterministic."""
    from pyspark.sql import functions as F
    hot_n = int(n * hot_share)
    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") < hot_n, F.lit(0))
            .otherwise(1 + F.pmod(F.xxhash64("id"), F.lit(1023)))
            .alias("user_id"),
            F.timestamp_micros(
                (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n)) * 1_000_000)
                + F.lit(1_700_000_000_000_000)).alias("ts"),
        )
    )


def window_form(e, window_s: int):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    w = (W.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-window_s * 1_000_000, 0))
    return (e.select("event_id", "user_id",
                     F.unix_micros("ts").alias("ts_us"))
            .select("event_id", "user_id",
                    F.count("*").over(w).alias("events_in_window")))


def rangejoin_form(e, window_s: int):
    """Same semantics via the binned range join: strictly-before
    candidates with gap ∈ (0, W] from `range_join_binned`, plus an
    equality join on (key, ts) for the gap-0 ties — which includes the
    probe row itself, matching the RANGE frame's CURRENT ROW end."""
    from pyspark.sql import functions as F

    from redshift_to_lakehouse_migration_spark.rangejoin import (
        range_join_binned,
    )
    probes = e.select("user_id", F.col("event_id").alias("probe_id"),
                      F.col("ts").alias("probe_ts"))
    cands = e.select("user_id", F.col("event_id").alias("cand_id"),
                     F.col("ts").alias("cand_ts"))
    after = range_join_binned(cands, probes, by=["user_id"],
                              left_ts="cand_ts", right_ts="probe_ts",
                              lower=0.0, upper=float(window_s))
    strict = after.groupBy("probe_id").agg(F.count("*").alias("n_before"))
    ties = (probes.join(cands.withColumnRenamed("cand_ts", "probe_ts"),
                        ["user_id", "probe_ts"])
            .groupBy("probe_id").agg(F.count("*").alias("n_tie")))
    return (probes.join(strict, "probe_id", "left")
            .join(ties, "probe_id", "left")
            .select(F.col("probe_id").alias("event_id"), "user_id",
                    (F.coalesce("n_before", F.lit(0))
                     + F.coalesce("n_tie", F.lit(0)))
                    .alias("events_in_window")))


def main() -> None:
    from redshift_to_lakehouse_migration_spark.session import get_spark

    spark = get_spark("window_skew_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(f"N={N}, target in-window candidates ~{TARGET_IN_WINDOW} "
          f"(W shrinks as the hot key densifies — both forms share W)")
    print("| hot-key share | W (s) | window form (s) | binned form (s) "
          "| equal |")
    print("|---|---|---|---|---|")
    for share in (0.0, 0.5, 0.9, 0.99):
        # hot key rate = max(share, 1/1024) · N / N span = ev/sec
        rate = max(share, 1.0 / 1024)
        window_s = max(1, int(TARGET_IN_WINDOW / rate))
        e = build(spark, N, share).localCheckpoint(eager=True)
        wf = window_form(e, window_s)
        rf = rangejoin_form(e, window_s)
        mismatch = (wf.join(rf, ["event_id", "user_id"])
                    .filter(wf.events_in_window != rf.events_in_window)
                    .count())
        times = []
        for form in (window_form, rangejoin_form):
            form(e, window_s).write.format("noop") \
                .mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            form(e, window_s).write.format("noop") \
                .mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(f"| {share:.0%} | {window_s} | {times[0]:.2f} "
              f"| {times[1]:.2f} | {'yes' if mismatch == 0 else 'NO'} |")
        e.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
