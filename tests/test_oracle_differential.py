"""Randomized query≡oracle differential for the text surface.

The driver's gate and the in-repo replica compare Spark vs DuckDB on the
FIXED testdata corpora; every hash there exercises one set of values. This
suite re-runs the same comparison over a seeded RANDOM hostile corpus —
agreement-class whitespace runs, NULs, NBSP, combining marks, emoji,
CJK, empty/whitespace-only/NULL texts, duplicate texts across
languages — so the parity being trusted is a property of the
QUERY+ORACLE pair, not of one corpus.

The alphabet is drawn from the PINNED agreement class
(`test_text_parity.py`): whitespace from {space, \\t, \\n, \\r, \\f} and
1:1-case-folding letters. The documented divergence classes — ``\\x0b``
and ``\\x1c``–``\\x1f`` (Java ``\\s`` vs RE2), Turkish ``İ``/``ı``
(full vs simple casefold) — are deliberately excluded: they are
engine-level semantics pinned as known boundaries, not query defects,
and this suite's job is to prove parity EVERYWHERE INSIDE the envelope.

Reuses the exact normalize/hash machinery of the replica
(`test_queries_oracle`) so a mismatch here means the DRIVER would
mismatch on such a corpus too.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from redshift_to_lakehouse_migration_spark.queries import ORACLES, QUERIES

from test_queries_oracle import assert_rows_match

# documents-only, oracle-bearing queries (the text/curation surface)
TEXT_QUERIES = [
    "dedup_exact",
    "text_stats",
    "token_count_bpe",
    "token_histogram",
    "lang_id",
    "doc_fingerprint",
    "dq_documents",
    "doc_repetition_filter",
    "sample_stratified",
    "sample_per_stratum",
    "mix_datasets",
    "pack_sequences",
    "contamination_check",
    "corpus_funnel",
    # full simhash/minhash oracles since r11 (VERDICT r10 #6) — the md5
    # pipeline runs over the same hostile alphabet here
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_minhash_lsh",
]

_ALPHABET = (
    list(" \t\n\r\f")                             # agreement-class \s
    + list("the quick brown fox and is of a")     # stopword-bearing ASCII
    + list("XYZ09.,;:!?")                         # punct the gates score
    + list("é漢字🎉\xa0\x00̇")                # accents/CJK/emoji/NUL/
                                                  # NBSP/combining dot
)

_LANGS = ["en", "de", "fr", "es", None]
_SOURCES = ["web", "books", "code"]


def _random_corpus(seed: int, n: int) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        roll = rng.random()
        if roll < 0.04:
            text = None                       # NULL text
        elif roll < 0.08:
            text = ""                         # empty
        elif roll < 0.12:
            text = "".join(rng.choice(" \t\n\f")
                           for _ in range(rng.randrange(1, 6)))  # ws-only
        elif roll < 0.22 and rows:
            text = rng.choice(rows)[1]        # duplicate of an earlier doc
        else:
            text = "".join(rng.choice(_ALPHABET)
                           for _ in range(rng.randrange(1, 160)))
        lang = rng.choice(_LANGS)
        src = rng.choice(_SOURCES)
        rows.append((i, text, lang, src,
                     len(text) if text is not None else None))
    return rows


@pytest.fixture(scope="module")
def random_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("rand_docs")
    rows = _random_corpus(seed=20260815, n=400)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    ).coalesce(2).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def rand_oracle_con(random_sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{random_sf_dir}/documents.parquet/*.parquet'")
    return con


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_query_matches_oracle_on_random_corpus(name, spark,
                                                    random_sf_dir,
                                                    rand_oracle_con):
    sdf = QUERIES[name](spark, random_sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = rand_oracle_con.sql(ORACLES[name])
    d_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(s_rows) == len(d_rows), (len(s_rows), len(d_rows))
    assert_rows_match(s_rows, sdf.columns, d_rows, rel.columns,
                      context=f" [{name}]")


# --- oversized-bucket star branch: planted mass-duplicate family ---------
#
# The hostile corpus above is 400 docs, so no LSH band bucket can exceed
# DEFAULT_BUCKET_CAP (512) and the capped_band_candidates star branch —
# the part of the r11 simhash/minhash oracles most likely to drift from
# the engine — would go untested. This corpus plants ONE exact-duplicate
# family of 600 docs (every band bucket it touches is oversized), a
# 100-doc near-duplicate family (one appended token: small hamming
# distance, likely sharing band buckets with the big family → MIXED
# oversized buckets exercising the per-group star + group-rep star), and
# 200 short random fillers, with ids interleaved so representatives (min
# doc_id per bucket/group) don't trivially coincide.

@pytest.fixture(scope="module")
def mass_dup_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mass_dup_docs")
    rng = random.Random(7)
    big = ("the quick brown fox jumps over the lazy dog "
           "pack my box with five dozen liquor jugs ") * 2
    near = big + "extra"
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(900):
        if i % 3 != 2:
            text = big                            # 600 exact copies
        elif i % 9 == 2:
            text = near                           # 100 near-dups
        else:
            text = " ".join(rng.choice(words)
                            for _ in range(rng.randrange(3, 30)))
        rows.append((i, text, "en", "web", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    ).coalesce(2).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def mass_dup_oracle_con(mass_dup_sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{mass_dup_sf_dir}/documents.parquet/*.parquet'")
    return con


@pytest.mark.parametrize("name", ["dedup_simhash_pairs",
                                  "dedup_minhash_lsh"])
def test_capped_star_branch_matches_oracle(name, spark, mass_dup_sf_dir,
                                           mass_dup_oracle_con):
    sdf = QUERIES[name](spark, mass_dup_sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = mass_dup_oracle_con.sql(ORACLES[name])
    d_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(s_rows) == len(d_rows), (len(s_rows), len(d_rows))
    assert_rows_match(s_rows, sdf.columns, d_rows, rel.columns,
                      context=f" [{name}]")

    # Prove the CAP branch actually ran (in both engines, since they
    # match): the 600-doc exact family sits in oversized buckets in every
    # band, so it must contribute exactly its star — 599 pairs — rather
    # than the 600·599/2 = 179,700 an uncapped all-pairs join would emit.
    fam = {i for i in range(900) if i % 3 != 2}
    cols = list(sdf.columns)
    i1, i2 = cols.index("doc_id_1"), cols.index("doc_id_2")
    fam_pairs = [r for r in s_rows if r[i1] in fam and r[i2] in fam]
    assert len(fam_pairs) == len(fam) - 1, len(fam_pairs)
    rep = min(fam)
    assert all(r[i1] == rep for r in fam_pairs)
