"""Broadcast Bloom pre-filter for gram-level decontamination.

Motivation (CHANGES_r5 §6 / VERDICT r5 directive #2): benchmark
decontamination is 46–50% of `corpus_prep_pipeline` at every measured
scale factor, and nearly all of that cost is the corpus-side gram
EXPLODE — every document fans out to hundreds of gram rows that are then
probed against the (broadcast) benchmark gram set and re-aggregated by
doc_id, even though at any realistic fpp only a sliver of grams can
match. The fix is the classic semi-join pre-filter: build a Bloom filter
over the benchmark grams (small by construction — eval sets are
thousands of docs against a corpus of billions) and test each gram
BEFORE exploding, so only candidate grams ever become rows.

Spark's own `BloomFilterAggregate` / `might_contain` pair is internal
(runtime-filter machinery, not in the public function registry), and
`df.stat.bloomFilter` returns a driver-side object that would need a
Python UDF to probe — the slow path. So this module builds the same
structure out of public primitives, keeping every probe inside
whole-stage codegen:

  - BUILD: each benchmark gram sets ``num_hashes`` bit positions derived
    by Kirsch–Mitzenmacher double hashing of two independent
    ``xxhash64`` values; positions are packed into 64-bit words by a
    distributed ``bit_or`` aggregate (≤ ``num_bits``/64 rows collected —
    bounded by the chosen filter size, never by the corpus).
  - PROBE: the bit array rides along as a one-row broadcast
    (``crossJoin(broadcast(...))``); membership is a conjunction of
    ``element_at``/``bitwiseAND`` tests — plain JVM expressions usable
    inside a higher-order ``filter`` over the gram ARRAY, i.e. before
    any explode.

Correctness (recall preservation, the property the oracle gate needs):
build and probe use the IDENTICAL position formula, so every inserted
gram has all its probed bits set — a Bloom filter has no false
negatives. Every corpus gram equal to a benchmark gram therefore passes
the pre-filter, and the exact equi-join downstream sees exactly the
matching rows it saw before; false positives (rate ``fpp``) only let
extra grams through to that join, which drops them. Result sets are
bit-identical with the filter on or off (pinned by
tests/test_bloom.py), so the DuckDB oracles are unaffected.

Overflow note: Spark 4 runs ANSI mode by default, so the probe reduces
both hashes mod ``num_bits`` before the ``h1 + i*h2`` combination —
intermediate values stay ≤ 9·num_bits, far inside int64.
"""

from __future__ import annotations

import math
import operator
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Salt distinguishing the second xxhash64 stream from the first
# (F.xxhash64 has no seed parameter; an extra literal column reseeds it).
_H2_SALT = 0x5EED


@dataclass(frozen=True)
class GramBloom:
    """An immutable built Bloom filter: packed little-endian 64-bit words
    plus the (num_bits, num_hashes) needed to reproduce probe positions."""

    bits: tuple[int, ...]
    num_bits: int
    num_hashes: int


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2), with m
    rounded up to whole 64-bit words and k clipped to [1, 8]."""
    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, min(8, round(m / n * math.log(2))))
    return m, k


def _positions(gram: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The shared build/probe position formula — h1 + i·h2 (mod m), both
    hashes pre-reduced mod m so the sum cannot overflow under ANSI."""
    h1 = F.pmod(F.xxhash64(gram), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(gram, F.lit(_H2_SALT)), F.lit(num_bits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits))
            for i in range(num_hashes)]


def build_gram_bloom(grams: DataFrame, gram_col: str = "gram",
                     fpp: float = 0.01) -> GramBloom:
    """Build a :class:`GramBloom` over a (small) gram DataFrame.

    Triggers two actions on the gram side — a count for sizing and the
    bit_or word aggregation — both bounded by the benchmark set, never
    the corpus. The collected word list is ≤ num_bits/64 entries —
    ~150k words (~1.2 MiB packed) per million grams at fpp=0.01."""
    n = grams.count()
    num_bits, num_hashes = bloom_params(n, fpp)
    words = [0] * (num_bits // 64)
    if n:
        pos = F.explode(F.array(
            *_positions(F.col(gram_col), num_bits, num_hashes))).alias("p")
        rows = (
            grams.select(pos)
            .select(
                F.shiftrightunsigned("p", 6).alias("w"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"),
                    F.col("p").bitwiseAND(F.lit(63)).cast("int"))
                .alias("mask"))
            .groupBy("w").agg(F.bit_or("mask").alias("word"))
            .collect()
        )
        for r in rows:
            words[r["w"]] = r["word"]
    return GramBloom(tuple(words), num_bits, num_hashes)


def with_bloom_bits(df: DataFrame, spark: SparkSession, bloom: GramBloom,
                    col_name: str = "_bloom_bits") -> DataFrame:
    """Attach the packed bit array as a one-row broadcast cross join —
    shipped once per executor, visible to every row's probe expressions."""
    bits_df = spark.createDataFrame([(list(bloom.bits),)],
                                    f"{col_name} array<bigint>")
    return df.crossJoin(F.broadcast(bits_df))


def might_contain(gram: Column, bloom: GramBloom,
                  bits_col: str = "_bloom_bits") -> Column:
    """Pure-expression membership test: all num_hashes probed bits set.
    Usable inside higher-order functions (the lambda argument resolves
    ``bits_col`` as an outer reference), so gram arrays can be filtered
    BEFORE exploding."""
    bits = F.col(bits_col)
    conds = []
    for pos in _positions(gram, bloom.num_bits, bloom.num_hashes):
        word = F.element_at(
            bits, (F.shiftrightunsigned(pos, 6) + F.lit(1)).cast("int"))
        mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                               pos.bitwiseAND(F.lit(63)).cast("int"))
        conds.append(word.bitwiseAND(mask) != 0)
    return reduce(operator.and_, conds)


def bloom_filter_grams(grams_array: Column, bloom: GramBloom,
                       bits_col: str = "_bloom_bits") -> Column:
    """Filter a gram ARRAY down to Bloom candidates — the pre-explode
    semi-join filter. Recall-preserving: no false negatives."""
    return F.filter(grams_array, lambda g: might_contain(g, bloom, bits_col))
