"""Catalog DDL management (catalog.py) — the setup_catalog.sql twin:
schema creation, reconciliation-log DDL + append + summary, classification
properties, and the per-layer smoke check
(reference `tests/smoke/verify_layer_access.py:21-105`)."""

from __future__ import annotations

from datetime import datetime

import pytest

from redshift_to_lakehouse_migration_spark import catalog as C
from redshift_to_lakehouse_migration_spark.recon import ReconResult


@pytest.fixture()
def lakehouse(spark, tmp_path):
    C.setup_catalog(spark, location_root=str(tmp_path))
    yield spark
    for schema in C.MEDALLION_SCHEMAS:
        spark.sql(f"DROP SCHEMA IF EXISTS {schema} CASCADE")


def test_setup_creates_all_schemas_and_log_table(lakehouse):
    spark = lakehouse
    dbs = {r.namespace for r in spark.sql("SHOW SCHEMAS").collect()}
    assert set(C.MEDALLION_SCHEMAS) <= dbs
    cols = [f.name for f in
            spark.read.table(C.RECONCILIATION_LOG_TABLE).schema.fields]
    assert cols == [f.name for f in C.RECONCILIATION_LOG_SCHEMA.fields]
    # idempotent: a second run is a no-op, not an error
    C.setup_catalog(spark, location_root=None)


def test_verify_layer_roundtrip_all_layers(lakehouse):
    for layer in ("bronze", "silver", "gold"):
        out = C.verify_layer(lakehouse, layer)
        assert out["schema_accessible"] and out["write_read_ok"], layer
        assert "_smoke_test" not in out["tables"]  # cleaned up


def test_log_reconciliation_appends_and_summarizes(lakehouse):
    spark = lakehouse
    ts = datetime(2026, 1, 2, 3, 4, 5)
    results = [
        ReconResult("row_count", True, 100, 100),
        ReconResult("aggregate_sum_amount", False, 10.0, 11.5,
                    "rel_diff=1.5e-1"),
    ]
    C.log_reconciliation(spark, "run-1", "fact_orders", results, ts,
                         tolerance=1e-4)
    C.log_reconciliation(spark, "run-2", "fact_orders",
                         [ReconResult("row_count", True, 101, 101)], ts)
    log = spark.read.table(C.RECONCILIATION_LOG_TABLE)
    assert log.count() == 3
    bad = log.filter("NOT passed").collect()
    assert len(bad) == 1
    assert bad[0].check_type == "aggregate_sum_amount"
    assert bad[0].difference == pytest.approx(1.5)
    assert bad[0].legacy_value == "10.0"
    summary = {(r.table_name, r.check_type): r
               for r in C.reconciliation_summary(spark).collect()}
    rc = summary[("fact_orders", "row_count")]
    assert rc.n_runs == 2 and rc.n_passed == 2 and rc.all_passed
    agg = summary[("fact_orders", "aggregate_sum_amount")]
    assert agg.n_runs == 1 and agg.n_passed == 0 and not agg.all_passed


def test_classification_properties_roundtrip(lakehouse):
    spark = lakehouse
    spark.sql("CREATE TABLE gold.dim_policy_t (policy_sk STRING) "
              "USING PARQUET")
    C.classify_table(spark, "gold.dim_policy_t", "confidential",
                     contains_pii=True)
    tags = C.table_classification(spark, "gold.dim_policy_t")
    assert tags == {"data_classification": "confidential",
                    "contains_pii": "true"}


def test_quoting_survives_hostile_metadata(lakehouse):
    """A quote in untrusted metadata must become data, not SQL: the
    classification literal round-trips verbatim and the statement parses —
    under BOTH values of spark.sql.parser.escapedStringLiterals. Quotes
    are doubled and backslashes are doubled; DDL property literals use the
    default unescaper regardless of that conf (empirical, Spark 4.1.2),
    so one encoding serves both modes."""
    spark = lakehouse
    spark.sql("CREATE TABLE gold.quoted_t (x STRING) USING PARQUET")
    hostile = "tier-1 'quoted', C:\\path\\, injected"
    for esc_mode in ("false", "true"):
        spark.conf.set("spark.sql.parser.escapedStringLiterals", esc_mode)
        try:
            C.classify_table(spark, "gold.quoted_t", hostile,
                             contains_pii=False)
            tags = C.table_classification(spark, "gold.quoted_t")
            assert tags["data_classification"] == hostile, esc_mode
        finally:
            spark.conf.unset("spark.sql.parser.escapedStringLiterals")


def test_quote_ident_parts():
    assert C.quote_ident("gold.dim_policy") == "`gold`.`dim_policy`"
    assert C.quote_ident("we`ird") == "`we``ird`"
    assert C.quote_literal("it's a 'test'") == "it''s a ''test''"
    assert C.quote_literal("a\\b") == "a\\\\b"


def test_verify_layer_restores_caller_schema(lakehouse):
    """The smoke check must put the session back on the CALLER's current
    schema (an earlier version hard-switched to default on success and
    left the session on the layer schema on failure)."""
    spark = lakehouse
    spark.sql("USE SCHEMA gold")
    try:
        C.verify_layer(spark, "bronze")
        assert spark.catalog.currentDatabase() == "gold"
    finally:
        spark.sql("USE SCHEMA default")
