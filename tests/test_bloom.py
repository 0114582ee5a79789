"""Bloom gram pre-filter (llm/bloom.py): the recall-preservation proof
the oracle gate needs — with the filter on, decontamination results are
bit-identical to the unfiltered plan, because a Bloom filter built and
probed with the same position formula has no false negatives."""

from __future__ import annotations

import pyspark.sql.functions as F

from redshift_to_lakehouse_migration_spark.llm.bloom import (
    bloom_filter_grams,
    bloom_params,
    build_gram_bloom,
    might_contain,
    with_bloom_bits,
)
from redshift_to_lakehouse_migration_spark.llm.pipeline import (
    stage_decontaminate,
    stage_exact_dedup,
    stage_gate,
    stage_raw,
)
from redshift_to_lakehouse_migration_spark.queries.curation import (
    contamination_check,
)
from redshift_to_lakehouse_migration_spark.tables import load


def test_bloom_params_sizing():
    m, k = bloom_params(1000, fpp=0.01)
    assert m % 64 == 0
    # textbook: ~9.6 bits/item at 1% fpp, ~7 hashes
    assert 9_000 <= m <= 10_048
    assert k == 7
    # degenerate inputs stay valid
    m0, k0 = bloom_params(0)
    assert m0 >= 64 and 1 <= k0 <= 8


def test_no_false_negatives(spark):
    """Every inserted gram must test positive — the property that makes
    the pre-filter recall-preserving for exact gram joins."""
    grams = spark.createDataFrame(
        [(f"gram number {i} with text",) for i in range(500)],
        "gram string")
    bloom = build_gram_bloom(grams, fpp=0.01)
    probed = with_bloom_bits(grams, spark, bloom)
    misses = probed.filter(~might_contain(F.col("gram"), bloom)).count()
    assert misses == 0


def test_false_positive_rate_bounded(spark):
    """Non-members pass at roughly fpp — the filter actually filters
    (a broken probe formula could return TRUE for everything and still
    satisfy the no-false-negative test)."""
    members = spark.createDataFrame(
        [(f"member {i}",) for i in range(2000)], "gram string")
    bloom = build_gram_bloom(members, fpp=0.01)
    others = spark.createDataFrame(
        [(f"outsider {i}",) for i in range(5000)], "gram string")
    fp = (with_bloom_bits(others, spark, bloom)
          .filter(might_contain(F.col("gram"), bloom)).count())
    assert fp / 5000 < 0.05  # 5x headroom over the 1% design point


def test_empty_gram_set(spark):
    """Zero benchmark grams → all-zero bits → every probe rejects."""
    empty = spark.createDataFrame([], "gram string")
    bloom = build_gram_bloom(empty)
    assert all(w == 0 for w in bloom.bits)
    probe = spark.createDataFrame([("anything",)], "gram string")
    kept = (with_bloom_bits(probe, spark, bloom)
            .filter(might_contain(F.col("gram"), bloom)).count())
    assert kept == 0


def test_array_filter_matches_row_filter(spark):
    """bloom_filter_grams over the ARRAY keeps exactly the grams the
    row-level probe keeps (the pre-explode form is the same predicate)."""
    members = spark.createDataFrame(
        [(f"m {i}",) for i in range(200)], "gram string")
    bloom = build_gram_bloom(members)
    docs = spark.createDataFrame(
        [(1, ["m 3", "x", "m 7", "zq"]), (2, ["nope", "m 199"])],
        "doc_id int, grams array<string>")
    via_array = (with_bloom_bits(docs, spark, bloom)
                 .select("doc_id", F.explode(
                     bloom_filter_grams(F.col("grams"), bloom))
                     .alias("gram")))
    via_rows = (with_bloom_bits(
        docs.select("doc_id", F.explode("grams").alias("gram")),
        spark, bloom).filter(might_contain(F.col("gram"), bloom))
        .select("doc_id", "gram"))
    assert sorted(map(tuple, via_array.collect())) == \
        sorted(map(tuple, via_rows.collect()))
    # and the true members survived
    kept = {g for _, g in via_array.collect()}
    assert {"m 3", "m 7", "m 199"} <= kept


def test_contamination_check_bloom_identical(spark, sf_dir):
    """The headline guarantee: `contamination_check` with the Bloom
    pre-filter is row-for-row identical to the unfiltered (default)
    plan."""
    with_bloom = contamination_check(spark, sf_dir, bloom_fpp=0.01).collect()
    without = contamination_check(spark, sf_dir).collect()
    assert with_bloom == without
    # sanity: the check finds real contamination at this SF
    assert any(r["contaminated"] for r in with_bloom)


def test_stage_decontaminate_bloom_identical(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    canon = stage_exact_dedup(stage_gate(stage_raw(docs)))
    a = stage_decontaminate(canon, stage_raw(docs), bloom_fpp=0.01)
    b = stage_decontaminate(canon, stage_raw(docs))
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in b.select("doc_id").collect())


def test_probe_plan_stays_jvm_side(spark):
    """The probe must be pure expressions — no BatchEvalPython / Arrow
    eval nodes in the plan (the whole point of not using a Python UDF)."""
    members = spark.createDataFrame([("a b c d e",)], "gram string")
    bloom = build_gram_bloom(members)
    docs = spark.createDataFrame([(1, ["a b c d e", "x"])],
                                 "doc_id int, grams array<string>")
    plan = (with_bloom_bits(docs, spark, bloom)
            .select(F.explode(bloom_filter_grams(F.col("grams"), bloom)))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
