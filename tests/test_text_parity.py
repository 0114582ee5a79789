"""Cross-engine text-semantics parity envelope (Spark vs DuckDB oracle).

The oracle gate proves Spark ≡ DuckDB on the driver corpus (ASCII words,
plain single spaces) at sf0.001–sf1.0. This module pins the BOUNDARY of
that equivalence, found by running the text/dedup oracle pairs over a
hostile corpus (unicode whitespace, control chars, Turkish dotted
capitals, NULs, emoji):

1. **Agreement class** — on text whose whitespace is drawn from
   {space, \\t, \\n, \\r, \\f} and whose letters case-fold 1:1 (ASCII,
   accented Latin, CJK, emoji), Spark's `split(trim(x), '\\s+')` +
   `lower` normalization and the DuckDB oracle twin
   (`regexp_replace(lower(trim(x)), '\\s+', ' ', 'g')` + split-on-space)
   produce IDENTICAL token streams. The driver corpus lives entirely in
   this class, which is why 98/98 hash parity holds at every SF.

2. **Known divergence: \\x0B (vertical tab).** Java regex `\\s` includes
   \\x0B; RE2's does not — `a\\x0Bb` is two tokens in Spark, one in
   DuckDB. Aligning would need an explicit whitespace class in BOTH
   engines across every tokenizer and oracle; not worth rewriting a
   green surface for a character real corpora effectively never emit
   as a separator (recorded here instead).

3. **Known divergence: U+0130 (İ).** Spark/Java lowercases İ to
   "i\\u0307" (i + combining dot, the Unicode full case-folding);
   DuckDB's utf8proc maps it to plain "i". Exact-dedup therefore merges
   "İstanbul"/"istanbul" in DuckDB but not in Spark. Engine-level
   casefold policy — not alignable from SQL.

If either divergence assertion ever FAILS, the engines have converged
and the envelope (and this note) can be tightened.
"""

from __future__ import annotations

import duckdb
import pytest


def _spark_tokens(spark, s: str) -> list[str]:
    # the engine's canonical tokenizer: trim-LAST norm split on ' '
    # (llm.dedup.norm_text order — collapse, then trim)
    lit = s.replace("\\", "\\\\").replace("'", "''")
    return spark.sql(
        f"SELECT split(trim(regexp_replace(lower('{lit}'), "
        f"'\\\\s+', ' ')), ' ') AS t"
    ).collect()[0].t


def _duck_tokens(s: str) -> list[str]:
    return duckdb.sql(
        "SELECT string_split(trim(regexp_replace(lower(?), "
        "'\\s+', ' ', 'g')), ' ')", params=[s]
    ).fetchone()[0]


AGREEMENT = [
    "the quick brown fox",
    "tabs\tand\nnewlines\rand\fformfeeds collapse",
    "  leading and trailing   ",
    "café résumé naïve coöperate",
    "CAFÉ RÉSUMÉ NAÏVE MIXED case",
    "汉字 测试 文本 数据 处理",
    "emoji 🎉 party 🎉 emoji",
    "the quick\xa0brown fox",      # NBSP: neither engine splits on it
    "null\x00byte-adjacent stays one token",
    "a",
]


@pytest.mark.parametrize("s", AGREEMENT)
def test_tokenization_agreement_class(spark, s):
    assert _spark_tokens(spark, s) == _duck_tokens(s), s


def test_vertical_tab_divergence_pinned(spark):
    s = "and\x0bvertical"
    sp, du = _spark_tokens(spark, s), _duck_tokens(s)
    assert sp == ["and", "vertical"]      # Java \s includes \x0B
    assert du == ["and\x0bvertical"]      # RE2 \s does not


def test_turkish_dotted_capital_divergence_pinned(spark):
    s = "İstanbul"
    sp, du = _spark_tokens(spark, s), _duck_tokens(s)
    assert sp == ["i̇stanbul"]       # full casefold: i + combining dot
    assert du == ["istanbul"]             # utf8proc: plain i


def test_json_corruption_predicate_envelope(spark):
    """Pin the events_json_typed docstring's equivalence assumption
    case-by-case: Spark's corrupt-record column vs DuckDB's
    NOT json_valid agree on syntactically-invalid NON-EMPTY documents
    (the driver corpus's only corruption mode) and on NULL/valid-object
    cases; they diverge — each in a documented direction — on
    schema-violating well-formed JSON (Spark stricter) and on the empty
    string (DuckDB stricter)."""
    from pyspark.sql import functions as F

    cases = ['{"k": 5}', '{"k": null}', '{"j": 1}',   # agree: not corrupt
             'not json',                              # agree: corrupt
             '{"k": "12"}', '{"k": "abc"}', '"5"', '[1]',  # spark-only
             '']                                      # duckdb-only
    df = spark.createDataFrame([(c,) for c in cases], "props string")
    parsed = df.withColumn(
        "p", F.from_json("props", "k INT, _corrupt STRING",
                         {"columnNameOfCorruptRecord": "_corrupt"}))
    spark_corrupt = {r.props: r.c is not None
                     for r in parsed.select("props",
                                            F.col("p._corrupt").alias("c"))
                     .collect()}
    con = duckdb.connect()
    duck_corrupt = {c: not con.execute("SELECT json_valid(?)",
                                       [c]).fetchone()[0]
                    for c in cases}

    agree_clean = ['{"k": 5}', '{"k": null}', '{"j": 1}']
    for c in agree_clean:
        assert not spark_corrupt[c] and not duck_corrupt[c], c
    assert spark_corrupt["not json"] and duck_corrupt["not json"]
    for c in ['{"k": "12"}', '{"k": "abc"}', '"5"', '[1]']:
        assert spark_corrupt[c] and not duck_corrupt[c], c   # Spark stricter
    assert not spark_corrupt[""] and duck_corrupt[""]        # DuckDB stricter


def test_single_pass_tokenizer_equals_collapse_form(spark):
    """The gram tokenizers (queries/curation.py, llm/pipeline.py) split on
    \\s+ in ONE pass; this pins their equivalence to the two-pass
    collapse-whitespace-then-split form the DuckDB oracles still use:
    each maximal whitespace run is one separator either way, and
    leading/trailing runs yield the same empty tokens under limit=-1.
    Checked over the agreement corpus plus the run-boundary edges the
    class-level cases do not cover."""
    from pyspark.sql import functions as F

    cases = AGREEMENT + [
        "\t\ttab lead", "trail tab\t\t", "\n", "", " ", "a  \t\n  b",
        "and\x0bvertical",            # VT: Java \s in BOTH Spark forms
        "mixed \t runs\n\n between \r\f tokens ",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    one_pass = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    two_pass = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    assert df.select(one_pass.alias("a"), two_pass.alias("b")) \
        .filter("a <> b").count() == 0


def test_single_pass_tokenizer_equivalence_randomized(spark):
    """Seeded random corpus over a hostile alphabet (all Java-\\s
    whitespace chars incl. \\x0b/\\x1c-\\x1f, unicode letters, NBSP,
    NUL, emoji, combining marks): one-pass and two-pass tokenization
    must agree on every string. One Spark job for the whole corpus."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    alphabet = (list(" \t\n\x0b\f\r\x1c\x1d\x1e\x1f")
                + list("abcXYZ09.,!")
                + list("é漢🎉\xa0\x00̇İı"))
    corpus = ["".join(rng.choice(alphabet)
                      for _ in range(rng.randrange(0, 40)))
              for _ in range(500)]
    df = spark.createDataFrame([(c,) for c in corpus], "text string")
    one_pass = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    two_pass = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " ")
    assert df.select(one_pass.alias("a"), two_pass.alias("b")) \
        .filter("a <> b").count() == 0


def test_trailing_whitespace_normalizes_away(spark):
    """Trim-LAST normalization: 'hello world' and 'hello world\\n' (or
    trailing tab/CR) must normalize identically in BOTH engines — the
    trim-first form left the trailing run behind as a space, silently
    defeating exact dedup for the most common text variation there is."""
    variants = ["hello world", "hello world\n", "hello world\t",
                "\nhello world", "  hello world \r\n"]
    for v in variants:
        assert _spark_tokens(spark, v) == ["hello", "world"], repr(v)
        assert _duck_tokens(v) == ["hello", "world"], repr(v)

    from pyspark.sql import functions as F

    from redshift_to_lakehouse_migration_spark.llm.dedup import (
        exact_duplicates, norm_text, ws_token_count,
    )
    docs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(variants)], "doc_id long, text string")
    groups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0].member_count == 5
    # token counts carry no phantom empty tokens
    counts = docs.select(ws_token_count("text").alias("n")).collect()
    assert all(r.n == 2 for r in counts)
    # and the DuckDB oracle twin hashes identically
    import duckdb as d
    norm_sql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    duck = d.sql(
        f"SELECT DISTINCT md5({norm_sql}) FROM (SELECT ? AS text UNION ALL "
        f"SELECT ?) ", params=["hello world", "hello world\n"]).fetchall()
    spark_hash = docs.limit(1).select(
        F.md5(norm_text("text")).alias("h")).collect()[0].h
    assert len(duck) == 1 and duck[0][0] == spark_hash
