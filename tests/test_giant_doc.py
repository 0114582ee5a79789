"""Giant-document envelope: the text surface against multi-megabyte rows.

A 100 TB corpus contains multi-MB documents — minified bundles, log
dumps, a book per row — and several text operators build per-row arrays
(tokens, grams) whose size tracks the DOCUMENT, not the partition. This
suite drives the REGISTERED query functions end-to-end over a synthetic
documents table whose rows are the per-row memory worst cases:

- a ~2 MB repeated-sentence doc (384k tokens → a 2-gram array of 384k
  elements built per ROW before any aggregate),
- a ~2 MB single token (no whitespace anywhere — the degenerate split,
  and a 2 MB group-by key in the histogram),
- a ~2 MB doc that is mostly whitespace (the normalize-collapse worst
  case: the regex rewrites nearly every character),
- an empty doc and a small control doc.

What this pins: every operator COMPLETES (per-row work stays linear in
doc bytes — a superlinear regression in any per-row expression would
blow far past the seconds this takes) and honors its contract at the
extremes: token counts match closed-form expectations, the repetition
filter flags the loopy giants, whitespace fabricates no tokens, and the
giant docs stay pairwise distinct under exact dedup.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from redshift_to_lakehouse_migration_spark.queries import QUERIES

SENT = "the quick brown fox jumps over the lazy dog again and again "
SENT_TOKENS = 12
REPEAT_N = 32_000          # ~1.9 MB, 12 * 32k = 384k tokens
GIANT_TOKEN_LEN = 2_000_000
WS_N = 300_000             # "a \n\t  " * N: ~1.8 MB, mostly whitespace


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("giant_docs")
    docs = [
        (1, SENT * REPEAT_N),
        (2, "x" * GIANT_TOKEN_LEN),
        (3, "a \n\t  " * WS_N),
        (4, ""),
        (5, "a small control document with several words"),
    ]
    table = pa.table({
        "doc_id": pa.array([r[0] for r in docs], pa.int64()),
        "text": pa.array([r[1] for r in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["synthetic"] * len(docs), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
    })
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _by_doc(spark, name, sf_dir):
    return {r["doc_id"]: r.asDict() for r in
            QUERIES[name](spark, sf_dir).collect()}


def test_text_stats_closed_form(spark, sf_dir):
    out = _by_doc(spark, "text_stats", sf_dir)
    assert out[1]["n_tokens"] == SENT_TOKENS * REPEAT_N
    assert out[2]["n_tokens"] == 1        # one giant token is still one
    assert out[3]["n_tokens"] == WS_N     # whitespace fabricates nothing
    assert 4 not in out                   # empty-doc filter
    assert out[5]["n_tokens"] == 7


def test_token_count_bpe_closed_form(spark, sf_dir):
    out = _by_doc(spark, "token_count_bpe", sf_dir)
    # the BPE-ish regex lexes one [A-Za-z]+ run regardless of its length
    assert out[2]["n_bpe_tokens"] == 1
    assert out[1]["n_bpe_tokens"] == SENT_TOKENS * REPEAT_N
    assert out[1]["n_ws_tokens"] == SENT_TOKENS * REPEAT_N
    assert 4 not in out


def test_fingerprint_and_lang_complete(spark, sf_dir):
    fp = _by_doc(spark, "doc_fingerprint", sf_dir)
    assert set(fp) == {1, 2, 3, 4, 5}
    assert len({r["fingerprint"] for r in fp.values()}) == 5
    # SENT is already single-spaced; normalize only trims the final space
    assert fp[1]["norm_length"] == len(SENT) * REPEAT_N - 1
    lang = _by_doc(spark, "lang_id", sf_dir)
    assert lang[1]["predicted_lang"] == "en"


def test_repetition_filter_flags_the_loopy_giants(spark, sf_dir):
    out = _by_doc(spark, "doc_repetition_filter", sf_dir)
    assert out[1]["flagged_repetitive"] is True
    assert out[3]["flagged_repetitive"] is True   # "a a a ..." all dups
    assert out[1]["total_2grams"] == SENT_TOKENS * REPEAT_N - 1
    # single-token and empty docs are absent by the query's own filter
    assert 2 not in out and 4 not in out
    assert out[5]["flagged_repetitive"] is False


def test_token_histogram_with_megabyte_group_key(spark, sf_dir):
    rows = {r["token"]: r["freq"]
            for r in QUERIES["token_histogram"](spark, sf_dir).collect()}
    assert rows["a"] == WS_N + 1          # whitespace doc + control doc
    assert rows["the"] == 2 * REPEAT_N
    assert rows["again"] == 2 * REPEAT_N
    assert rows["x" * GIANT_TOKEN_LEN] == 1   # the 2 MB key survives


def test_exact_dedup_no_false_groups_on_giants(spark, sf_dir):
    out = QUERIES["dedup_exact"](spark, sf_dir).collect()
    assert len(out) == 4                  # empty doc filtered, rest distinct
    assert all(r["member_count"] == 1 and not r["has_duplicates"]
               for r in out)


def test_minhash_and_simhash_complete_without_false_pairs(spark, sf_dir):
    """The shingle/signature paths explode 384k shingles for the giant
    doc — linear rows, bounded per-row arrays. The five docs share no
    real similarity, so no pair may surface."""
    assert QUERIES["dedup_minhash_lsh"](spark, sf_dir).count() == 0
    assert QUERIES["dedup_simhash_pairs"](spark, sf_dir).count() == 0


def test_contamination_and_corpus_prep_complete(spark, sf_dir):
    """End-to-end curation over the giants: the 5-gram builders and the
    benchmark join stay linear per row. doc_id 97 % BENCH_MOD != 0 for
    all five docs, so nothing is benchmark-member and nothing can be
    contaminated."""
    cont = QUERIES["contamination_check"](spark, sf_dir).collect()
    assert all(not r["contaminated"] for r in cont)
    prep = QUERIES["corpus_prep"](spark, sf_dir)
    assert prep.count() >= 1              # summary rows exist
