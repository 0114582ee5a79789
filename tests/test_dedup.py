"""Recall tests for the hash-based dedup operators (MinHash-LSH, SimHash)
with planted near-duplicates — these ops have no SQL oracle, so correctness
is asserted behaviorally: planted near-dups must be found, distinct docs
must not collapse."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.llm import dedup as D

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill near the garden")


def _corpus(spark):
    near = BASE.replace("lazy", "sleepy")           # 1-token edit → near-dup
    exact = BASE
    distinct = ("completely different content about spark query engines "
                "and distributed columnar execution at massive scale "
                "with shuffles joins and aggregates")
    rows = [(1, BASE), (2, exact), (3, near), (4, distinct),
            (5, "short text"), (6, "short text here")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    groups = D.exact_duplicates(_corpus(spark), "doc_id", "text")
    dup = groups.filter("has_duplicates").collect()
    assert len(dup) == 1
    assert dup[0].keeper_doc_id == 1 and dup[0].member_count == 2


def test_minhash_finds_planted_near_dups(spark):
    pairs = D.minhash_lsh_pairs(_corpus(spark), "doc_id", "text",
                                threshold=0.5).collect()
    found = {(r.doc_id_1, r.doc_id_2) for r in pairs}
    assert (1, 2) in found          # exact dup pair
    assert (1, 3) in found          # planted near-dup
    assert (2, 3) in found
    # distinct docs must not pair with the fox corpus
    assert not any(4 in p for p in found)
    for r in pairs:
        if (r.doc_id_1, r.doc_id_2) == (1, 2):
            assert r.jaccard == 1.0
        if (r.doc_id_1, r.doc_id_2) == (1, 3):
            assert 0.5 <= r.jaccard < 1.0


def test_simhash_hamming_separation(spark):
    sig = D.simhash_signatures(_corpus(spark), "doc_id", "text")
    rows = {r.doc_id: r.simhash for r in sig.collect()}
    assert rows[1] == rows[2]                       # identical text
    ham_near = bin(rows[1] ^ rows[3]).count("1")
    ham_far = bin(rows[1] ^ rows[4]).count("1")
    assert ham_near < ham_far                       # near-dup closer
    pairs = D.simhash_near_pairs(sig, max_hamming=ham_near).collect()
    found = {(r.doc_id_1, r.doc_id_2) for r in pairs}
    assert (1, 2) in found and (1, 3) in found
    assert not any(4 in p for p in found)


def test_jaccard_pairs_block_confinement(spark):
    """Docs in different blocks are never compared (the scale guarantee)."""
    docs = _corpus(spark).select(
        "doc_id", D.norm_text("text").alias("norm"))
    sh = D.shingles(docs, "doc_id", "norm")
    blocks = docs.select("doc_id", F.substring("norm", 1, 16).alias("block"))
    pairs = D.jaccard_pairs(sh, blocks, threshold=0.0).collect()
    found = {(r.doc_id_1, r.doc_id_2) for r in pairs}
    assert (1, 2) in found and (1, 3) in found
    assert not any(4 in p for p in found)   # different prefix block
