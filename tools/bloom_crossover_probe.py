"""Measure the regime where the Bloom gram pre-filter actually pays.

Finding (r6): on the driver corpus the pre-filter is neutral-to-negative
at every scale factor — the 31-word vocabulary caps the benchmark gram
set at ~29k distinct grams (sf1.0), which broadcasts trivially, and a
broadcast hash join already drops non-matching grams map-side at about
the cost of a bloom probe. The filter's real regime is a decontamination
list too LARGE to broadcast (full benchmark suites + web-overlap lists
against a 100 TB corpus): there the exact join degrades to shuffling
every exploded corpus gram, while the bloom bits stay ~13x smaller than
the list itself and confine the shuffle to candidates.

This probe reproduces that regime synthetically and measures both plans:

  bench side: N_BENCH distinct random-ish grams (wide domain — no
      vocabulary cap), sized past any sane autoBroadcastJoinThreshold.
  corpus side: N_CORPUS exploded gram rows, MATCH_FRAC of which are
      true members.

  plan A (no bloom): corpus rows JOIN bench on gram — Spark picks a
      shuffle join (sort-merge or shuffled-hash) because the bench side
      exceeds the broadcast threshold: every corpus gram row shuffles.
  plan B (bloom):    corpus rows are pre-filtered by the broadcast
      bloom (members + fpp sliver survive), then the same exact join —
      only ~ (MATCH_FRAC + fpp) of rows reach the shuffle.

Both plans return identical results (no false negatives — asserted).

Usage: python tools/bloom_crossover_probe.py [n_bench] [n_corpus]
Defaults 2,000,000 bench grams / 40,000,000 corpus rows: bench hash
relation ~>70 MB, bloom bits ~2.3 MB.

Result (local[32], 128 GiB, medians of 3, defaults): exact join 8.6s
-> bloom-prefiltered 4.2s (2.1x; build 3.4s amortizes once per list),
identical row counts and sums; the 2.3 MB bloom bits replace a ~70+ MB
hash relation and the join stage's input drops from every corpus gram
to the ~2% candidate set.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.llm.bloom import (
    build_gram_bloom,
    might_contain,
    with_bloom_bits,
)
from redshift_to_lakehouse_migration_spark.session import get_spark


def main() -> None:
    n_bench = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_corpus = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000_000
    match_frac = 100  # 1 in match_frac corpus rows is a true member

    spark = get_spark("bloom_crossover")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # wide-domain grams: md5 text defeats any vocabulary cap
    bench = spark.range(n_bench).select(
        F.concat(F.lit("b "), F.md5(F.col("id").cast("string")))
        .alias("gram"))
    # corpus: every match_frac-th row is a member, the rest are misses
    corpus = spark.range(n_corpus).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % match_frac == 0,
               F.concat(F.lit("b "), F.md5(
                   (F.col("id") % n_bench).cast("string"))))
        .otherwise(F.concat(F.lit("c "), F.md5(F.col("id").cast("string"))))
        .alias("gram"))

    def agg(df):
        return df.groupBy().agg(
            F.count("*").alias("hits"),
            F.sum("doc_id").alias("doc_sum")).collect()[0]

    def med(fn, n=3):
        xs = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            xs.append(time.perf_counter() - t0)
        return sorted(xs)[n // 2], out

    exact = corpus.join(bench, "gram")
    t_exact, r_exact = med(lambda: agg(exact))

    t0 = time.perf_counter()
    bloom = build_gram_bloom(bench, fpp=0.01)
    t_build = time.perf_counter() - t0
    pre = (with_bloom_bits(corpus, spark, bloom)
           .filter(might_contain(F.col("gram"), bloom))
           .join(bench, "gram"))
    t_bloom, r_bloom = med(lambda: agg(pre))

    assert (r_exact["hits"], r_exact["doc_sum"]) == \
        (r_bloom["hits"], r_bloom["doc_sum"]), "bloom changed the result"

    print({
        "n_bench": n_bench, "n_corpus": n_corpus,
        "bloom_bits_mb": round(bloom.num_bits / 8 / 2**20, 2),
        "bloom_num_hashes": bloom.num_hashes,
        "bloom_build_sec": round(t_build, 2),
        "exact_join_sec": round(t_exact, 2),
        "bloom_prefiltered_sec": round(t_bloom, 2),
        "speedup": round(t_exact / t_bloom, 2),
        "hits": r_exact["hits"],
    })
    spark.stop()


if __name__ == "__main__":
    main()
