"""Deduplication operators for LLM training-data pipelines.

Four dedup families (BASELINE.json north star), all Spark-first:

- exact: hash-groupBy on normalized-text md5 — one shuffle, arbitrarily
  scalable.
- n-gram Jaccard: blocked pairwise comparison — shingle explode → block-local
  self-join → shared-shingle count → Jaccard. Blocking (prefix key) keeps the
  join from going quadratic; at 100 TB the LSH variant below replaces the
  block key with banded MinHash buckets, same downstream shape.
- MinHash-LSH: shingle → md5-derived 60-bit hash → k universal-hash
  permutations → per-doc min (signature) → banded bucket join → candidate
  pairs → exact Jaccard verify on candidates only. No quadratic step;
  everything is explode/groupBy/join on bounded keys.
- SimHash: token-hash bit voting → 64-bit signature → banded hamming join.

MinHash/SimHash use md5-derived integer hashes (deterministic everywhere);
their queries carry no DuckDB oracle (hex→int is not portable SQL) and are
driver-checked rows-only; planted-duplicate unit tests in
tests/test_dedup.py cover their recall instead.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

_NORM = r"regexp_replace(lower(trim(text)), '\\s+', ' ')"

# MinHash parameters: 32 permutations in 8 bands of 4 rows → catches
# Jaccard ≳ 0.5 pairs with high probability.
_MERSENNE = (1 << 31) - 1
_N_PERM, _BAND_ROWS = 32, 4
_rng = random.Random(42)
_PERMS = [(_rng.randrange(1, _MERSENNE), _rng.randrange(0, _MERSENNE))
          for _ in range(_N_PERM)]


def _norm_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").isNotNull()
                 & (F.length(F.trim(F.col("text"))) > 0))
        .select("doc_id", F.expr(_NORM).alias("norm"))
    )


def _shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """doc_id → distinct k-token shingles (explode; no driver loop)."""
    toks = docs.withColumn("toks", F.split("norm", " "))
    sh = F.expr(
        f"transform(sequence(1, greatest(size(toks) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', slice(toks, i, {k})))"
    )
    return (
        toks.select("doc_id",
                    F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by normalized-text hash, keep lowest doc_id as
    keeper, count members — the hash-groupBy scale path."""
    docs = _norm_docs(spark, sf_dir)
    return (
        docs.groupBy(F.md5("norm").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count("*").alias("member_count"),
             F.max("doc_id").alias("max_doc_id"))
        .withColumn("has_duplicates", F.col("member_count") > 1)
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise 3-gram Jaccard ≥ 0.4: prefix-block join prevents the
    quadratic blowup; per-pair shared-shingle counts via groupBy."""
    docs = _norm_docs(spark, sf_dir).withColumn(
        "block", F.substring("norm", 1, 16))
    sh = _shingles(docs).join(docs.select("doc_id", "block"), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.block") == F.col("b.block"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_1"),
                 F.col("b.doc_id").alias("doc_id_2"))
        .agg(F.count("*").alias("shared_shingles"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc_id_1"),
                      F.col("n_shingles").alias("n_shingles_1"))
    s2 = sizes.select(F.col("doc_id").alias("doc_id_2"),
                      F.col("n_shingles").alias("n_shingles_2"))
    jac = (F.col("shared_shingles")
           / (F.col("n_shingles_1") + F.col("n_shingles_2")
              - F.col("shared_shingles")))
    return (
        pairs.join(s1, "doc_id_1").join(s2, "doc_id_2")
        .select("doc_id_1", "doc_id_2", "shared_shingles",
                "n_shingles_1", "n_shingles_2", jac.alias("jaccard"))
        .filter(jac >= 0.4)
    )


def _minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, perm_id → min universal-hash of shingle set (the signature)."""
    sh = _shingles(_norm_docs(spark, sf_dir))
    # md5 hex → 60-bit int, stable across engines and runs
    h = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    hashed = sh.select("doc_id", (h % _MERSENNE).alias("h"))
    perms = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(_PERMS)],
        "perm_id int, a long, b long")
    return (
        hashed.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm_id")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % _MERSENNE)
             .alias("minhash"))
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: banded signature buckets → candidate pairs
    → exact Jaccard verification on candidates only (rows-only check)."""
    sig = _minhash_signatures(spark, sf_dir)
    bands = (
        sig.withColumn("band_id", F.col("perm_id") % F.lit(_N_PERM // _BAND_ROWS))
        .groupBy("doc_id", "band_id")
        .agg(F.md5(F.concat_ws(",", F.sort_array(
            F.collect_list(F.struct("perm_id", "minhash"))).cast("string")))
            .alias("band_key"))
    )
    cand = (
        bands.alias("x").join(
            bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_id_1"),
                F.col("y.doc_id").alias("doc_id_2"))
        .distinct()
    )
    # exact verify: true Jaccard on candidate pairs only
    sh = _shingles(_norm_docs(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    shared = (
        cand.join(sh.alias("s1"), F.col("doc_id_1") == F.col("s1.doc_id"))
        .join(sh.alias("s2"),
              (F.col("doc_id_2") == F.col("s2.doc_id"))
              & (F.col("s1.shingle") == F.col("s2.shingle")))
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count("*").alias("shared"))
    )
    n1 = sizes.select(F.col("doc_id").alias("doc_id_1"),
                      F.col("n").alias("n1"))
    n2 = sizes.select(F.col("doc_id").alias("doc_id_2"),
                      F.col("n").alias("n2"))
    jac = F.col("shared") / (F.col("n1") + F.col("n2") - F.col("shared"))
    return (
        cand.join(shared, ["doc_id_1", "doc_id_2"], "left")
        .join(n1, "doc_id_1").join(n2, "doc_id_2")
        .select("doc_id_1", "doc_id_2",
                F.coalesce("shared", F.lit(0)).alias("shared_shingles"),
                F.coalesce(jac, F.lit(0.0)).alias("jaccard"))
        .filter(F.coalesce(jac, F.lit(0.0)) >= 0.5)
        .orderBy("doc_id_1", "doc_id_2")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash signatures per document (token-frequency bit voting);
    rows-only check, recall covered by unit tests."""
    docs = _norm_docs(spark, sf_dir)
    toks = (
        docs.select("doc_id", F.explode(F.split("norm", " ")).alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("w"))
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    bits = (
        toks.withColumn("h", h)
        .select("doc_id", "w",
                F.explode(F.sequence(F.lit(0), F.lit(59))).alias("i"),
                "h")
        .withColumn("bit", F.expr("shiftright(h, i) & 1"))
        .groupBy("doc_id", "i")
        .agg(F.sum(F.col("w") * (F.col("bit") * 2 - 1)).alias("vote"))
    )
    return (
        bits.groupBy("doc_id")
        .agg(F.sum(F.expr(
            "CASE WHEN vote > 0 THEN shiftleft(CAST(1 AS BIGINT), i) "
            "ELSE 0 END")).alias("simhash"))
        .select("doc_id", "simhash",
                (F.col("simhash") % 32768).alias("band_0"),
                (F.shiftright("simhash", 15) % 32768).alias("band_1"),
                (F.shiftright("simhash", 30) % 32768).alias("band_2"),
                (F.shiftright("simhash", 45) % 32768).alias("band_3"))
        .orderBy("doc_id")
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
}

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

ORACLES = {
    "dedup_exact": f"""
        SELECT
            md5(norm) AS content_hash,
            MIN(doc_id) AS keeper_doc_id,
            COUNT(*) AS member_count,
            MAX(doc_id) AS max_doc_id,
            COUNT(*) > 1 AS has_duplicates
        FROM (SELECT doc_id, {_NORM_SQL} AS norm FROM documents
              WHERE text IS NOT NULL AND length(trim(text)) > 0)
        GROUP BY md5(norm)
    """,
    "dedup_ngram_jaccard": f"""
        WITH docs AS (
            SELECT doc_id, {_NORM_SQL} AS norm FROM documents
            WHERE text IS NOT NULL AND length(trim(text)) > 0
        ), tok AS (
            SELECT doc_id, substr(norm, 1, 16) AS block,
                   string_split(norm, ' ') AS toks
            FROM docs
        ), sh AS (
            SELECT doc_id, block, unnest(list_distinct(
                [array_to_string(toks[i:i+2], ' ')
                 for i in range(1, greatest(len(toks) - 2, 1) + 1)]))
                AS shingle
            FROM tok
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
        ), pairs AS (
            SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
                   COUNT(*) AS shared_shingles
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.block = b.block
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT p.doc_id_1, p.doc_id_2, p.shared_shingles,
               s1.n_shingles AS n_shingles_1,
               s2.n_shingles AS n_shingles_2,
               p.shared_shingles
               / (s1.n_shingles + s2.n_shingles - p.shared_shingles)
                   AS jaccard
        FROM pairs p
        JOIN sizes s1 ON p.doc_id_1 = s1.doc_id
        JOIN sizes s2 ON p.doc_id_2 = s2.doc_id
        WHERE p.shared_shingles
              / (s1.n_shingles + s2.n_shingles - p.shared_shingles) >= 0.4
    """,
}
