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
