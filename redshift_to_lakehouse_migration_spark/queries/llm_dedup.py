"""Deduplication queries — thin bindings of ``redshift_to_lakehouse_migration_spark.llm.dedup``
(the reusable operator library) to the driver's documents table.

Coverage (BASELINE.json north star): exact hash dedup, blocked n-gram
Jaccard (full DuckDB oracle), MinHash-LSH candidates + exact verify, SimHash
signatures + hamming-banded near-pairs. MinHash/SimHash carry no oracle
(md5-hex→int is not portable SQL); tests/test_dedup.py covers their recall
with planted near-duplicates instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup as D
from ..tables import load, spread


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shingling/signature construction is CPU-bound per row: make sure the
    # scan doesn't serialize it onto one core (no-op at cluster scale)
    return spread(load(spark, sf_dir, "documents"), spark)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(
        F.col("text").rlike(r"\S"))
    return D.exact_duplicates(docs, "doc_id", "text")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise 3-gram Jaccard ≥ 0.4 (16-char prefix blocks)."""
    normed = (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull()
                & (F.col("text").rlike(r"\S")))
        .select("doc_id", D.norm_text("text").alias("norm"))
    )
    sh = D.shingles(normed, "doc_id", "norm")
    blocks = normed.select("doc_id",
                           F.substring("norm", 1, 16).alias("block"))
    return D.jaccard_pairs(sh, blocks, threshold=0.4)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic order at the query surface; the library operator is
    # deliberately unsorted (scale path)
    return D.minhash_lsh_pairs(_docs(spark, sf_dir), "doc_id", "text",
                               n_perm=32, band_rows=4, threshold=0.5) \
        .orderBy("doc_id_1", "doc_id_2")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_signatures(_docs(spark, sf_dir), "doc_id", "text") \
        .orderBy("doc_id")


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = D.simhash_signatures(_docs(spark, sf_dir), "doc_id", "text")
    return D.simhash_near_pairs(sig, max_hamming=6) \
        .orderBy("doc_id_1", "doc_id_2")


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the blocked
    3-gram-Jaccard pair graph (A~B, B~C ⇒ {A,B,C} one cluster), canonical
    keeper = min doc_id per component — the step that turns pair detection
    into an actual drop list. Iterative min-label propagation
    (`llm/components.py`); the DuckDB oracle replays it as a recursive CTE."""
    from ..llm.components import connected_components
    pairs = dedup_ngram_jaccard(spark, sf_dir) \
        .select("doc_id_1", "doc_id_2")
    docs = (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull()
                & (F.col("text").rlike(r"\S")))
        .select("doc_id")
    )
    comp = connected_components(pairs, "doc_id_1", "doc_id_2")
    labeled = (
        docs.join(comp, docs["doc_id"] == comp["node"], "left")
        .select(docs["doc_id"],
                F.coalesce(F.col("comp"), docs["doc_id"])
                .alias("cluster_id"))
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return (
        labeled.join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size",
                (F.col("doc_id") == F.col("cluster_id"))
                .alias("is_canonical"))
        .orderBy("doc_id")
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_clusters": dedup_clusters,
}

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')"

# Both engines drop shingles whose within-block document frequency exceeds
# the cap (quadratic-join boilerplate; see llm/dedup.py) — the filter is
# deterministic, so the oracle mirrors it exactly.
_DF_CAP = D.DEFAULT_SHINGLE_DF_CAP
_SHF_SQL = f"""
        ), shf AS (
            SELECT doc_id, block, shingle FROM (
                SELECT doc_id, block, shingle,
                       COUNT(*) OVER (PARTITION BY block, shingle) AS df
                FROM sh)
            WHERE df <= {_DF_CAP}"""

ORACLES = {
    "dedup_exact": f"""
        SELECT
            md5(norm) AS content_hash,
            MIN(doc_id) AS keeper_doc_id,
            COUNT(*) AS member_count,
            MAX(doc_id) AS max_doc_id,
            COUNT(*) > 1 AS has_duplicates
        FROM (SELECT doc_id, {_NORM_SQL} AS norm FROM documents
              WHERE text IS NOT NULL AND regexp_matches(text, '\\S'))
        GROUP BY md5(norm)
    """,
    "dedup_ngram_jaccard": f"""
        WITH docs AS (
            SELECT doc_id, {_NORM_SQL} AS norm FROM documents
            WHERE text IS NOT NULL AND regexp_matches(text, '\\S')
        ), tok AS (
            SELECT doc_id, substr(norm, 1, 16) AS block,
                   string_split(norm, ' ') AS toks
            FROM docs
        ), sh AS (
            SELECT doc_id, block, unnest(list_distinct(
                [array_to_string(toks[i:i+2], ' ')
                 for i in range(1, greatest(len(toks) - 2, 1) + 1)]))
                AS shingle
            FROM tok{_SHF_SQL}
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_shingles FROM shf GROUP BY doc_id
        ), pairs AS (
            SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
                   COUNT(*) AS shared_shingles
            FROM shf a JOIN shf b
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

ORACLES["dedup_clusters"] = f"""
    WITH RECURSIVE docs AS (
        SELECT doc_id, {_NORM_SQL} AS norm FROM documents
        WHERE text IS NOT NULL AND regexp_matches(text, '\\S')
    ), tok AS (
        SELECT doc_id, substr(norm, 1, 16) AS block,
               string_split(norm, ' ') AS toks
        FROM docs
    ), sh AS (
        SELECT doc_id, block, unnest(list_distinct(
            [array_to_string(toks[i:i+2], ' ')
             for i in range(1, greatest(len(toks) - 2, 1) + 1)]))
            AS shingle
        FROM tok{_SHF_SQL}
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM shf GROUP BY doc_id
    ), rawpairs AS (
        SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
               COUNT(*) AS shared_shingles
        FROM shf a JOIN shf b
          ON a.shingle = b.shingle AND a.block = b.block
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), jpairs AS (
        SELECT p.doc_id_1, p.doc_id_2
        FROM rawpairs p
        JOIN sizes s1 ON p.doc_id_1 = s1.doc_id
        JOIN sizes s2 ON p.doc_id_2 = s2.doc_id
        WHERE p.shared_shingles
              / (s1.n_shingles + s2.n_shingles - p.shared_shingles) >= 0.4
    ), sym AS (
        SELECT doc_id_1 AS a, doc_id_2 AS b FROM jpairs
        UNION
        SELECT doc_id_2, doc_id_1 FROM jpairs
    ), reach(node, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
    ), comp AS (
        SELECT node, MIN(r) AS comp FROM reach GROUP BY node
    ), labeled AS (
        SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
        FROM docs d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT l.doc_id, l.cluster_id, s.cluster_size,
           l.doc_id = l.cluster_id AS is_canonical
    FROM labeled l
    JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
          FROM labeled GROUP BY cluster_id) s USING (cluster_id)
    ORDER BY l.doc_id
"""
