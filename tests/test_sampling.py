"""Invariants for the training-data sampling/mixing/packing operators
(queries/sampling.py) beyond the DuckDB oracle parity that
test_queries_oracle.py already enforces.

Reference test model (SURVEY.md §5): behavioral properties on real data —
determinism under repartitioning (the property rand()-based sampling
lacks), stratum rate bounds, packing bin-budget invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.queries.sampling import (
    PACK_BUDGET,
    mix_datasets,
    pack_sequences,
    sample_per_stratum,
    sample_stratified,
)
from redshift_to_lakehouse_migration_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_stratified_sample_is_partitioning_invariant(spark):
    """The md5-prefix decision must not depend on physical layout: the
    same doc set is kept whether the input arrives in 1 partition or 13."""
    kept1 = {r.doc_id for r in
             sample_stratified(spark, SF).select("doc_id").collect()}
    d = load(spark, SF, "documents").repartition(13)
    d.createOrReplaceTempView("__docs_repart")
    # re-run the same predicate over the repartitioned view
    kept2 = {r.doc_id for r in spark.sql("""
        SELECT doc_id FROM __docs_repart
        WHERE substring(md5(CAST(doc_id AS STRING)), 1, 2)
              < CASE WHEN lang = 'en' THEN '33' ELSE '80' END
    """).collect()}
    assert kept1 == kept2


def test_stratified_rates_within_tolerance(spark):
    """Observed keep rates must sit near the configured ceilings
    (51/256 ≈ 19.9% for en, 128/256 = 50% for the rest)."""
    d = load(spark, SF, "documents")
    totals = {r.lang: r.n for r in
              d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in
            sample_stratified(spark, SF)
            .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    en_rate = kept.get("en", 0) / totals["en"]
    assert 0.10 < en_rate < 0.30
    other_total = sum(v for k, v in totals.items() if k != "en")
    other_kept = sum(v for k, v in kept.items() if k != "en")
    assert 0.38 < other_kept / other_total < 0.62


def test_per_stratum_sample_size_bound(spark):
    out = sample_per_stratum(spark, SF)
    over = (out.groupBy("lang", "source").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 5).count())
    assert over == 0


def test_mix_shares_sum_to_one(spark):
    rows = mix_datasets(spark, SF).collect()
    total_bps = sum(r.mix_share_bps for r in rows)
    # integer truncation loses at most 1 bp per source
    assert 10000 - len(rows) <= total_bps <= 10000
    for r in rows:
        assert r.effective_tokens == r.weight * r.tokens


def test_packing_bins_are_contiguous_and_start_within_budget(spark):
    """Concat-and-chunk invariants: bin ids per language form a contiguous
    range from 0, and every bin except the last holds at least the budget
    (a doc only starts a new bin once the previous offset crossed it)."""
    rows = pack_sequences(spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, bins in by_lang.items():
        bins.sort(key=lambda r: r.bin_id)
        assert [b.bin_id for b in bins] == list(range(len(bins))), lang
        cum = 0
        for i, b in enumerate(bins):
            cum += b.bin_tokens
            if i < len(bins) - 1:
                # a doc only opens bin i+1 once the running offset crossed
                # the boundary, so each prefix must span its boundaries
                assert cum >= (i + 1) * PACK_BUDGET, (lang, i)
    # total tokens conserved across bins equals the corpus total
    total = sum(b.bin_tokens for b in rows)
    d = load(spark, SF, "documents")
    expected = d.select(F.sum(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long"))
        .alias("t")).collect()[0].t
    assert total == expected


def test_null_text_docs_do_not_poison_token_sums(spark, tmp_path):
    """Spark's size(split(NULL)) is -1 (SQL engines yield NULL): a corpus
    with NULL-text docs must not see token sums shrink, bin offsets shift,
    or mix shares drift. NULL docs are excluded up front in mix/pack."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "src1", 16),
         (2, None, "en", "src1", 0),
         (3, "delta epsilon", "en", "src9", 13),
         (4, None, "xx", "src9", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    mixed = {r.source: r for r in mix_datasets(spark, sf).collect()}
    assert mixed["src1"].docs == 1 and mixed["src1"].tokens == 3
    assert mixed["src9"].docs == 1 and mixed["src9"].tokens == 2
    assert mixed["src1"].mix_share_bps + mixed["src9"].mix_share_bps <= 10000
    assert all(r.tokens > 0 for r in mixed.values())

    bins = pack_sequences(spark, sf).collect()
    assert sum(b.bin_tokens for b in bins) == 5  # 3 + 2, no -1 contamination
    assert all(b.bin_tokens > 0 for b in bins)
