"""Catalog / schema DDL management — the lakehouse catalog-setup twin.

Reference behavior (`infrastructure/unity_catalog/setup_catalog.sql:9-49`):
create a catalog, one schema per medallion layer with a managed storage
location, a ``data_quality.reconciliation_log`` results table, and
classification tags on the PII-bearing gold tables. The post-deploy smoke
test (`tests/smoke/verify_layer_access.py:21-105`) then proves read/write
access per layer.

OSS-Spark mapping (documented deltas, not omissions):
- Unity catalogs don't exist in the session catalog → schemas map to
  databases (``CREATE SCHEMA`` is already the Spark synonym); a
  ``location_root`` stands in for the per-schema managed location.
- ``USING DELTA`` + autoOptimize table properties → ``USING PARQUET``
  (delta-spark is not installable here; `maintenance.compact_parquet`
  is the compaction analog).
- ``SET TAGS`` is Databricks-only → classification tags are recorded as
  table properties, which `DESCRIBE TABLE EXTENDED` surfaces the same way.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .recon import ReconResult


def quote_literal(value: str) -> str:
    """Escape ``value`` for interpolation into a single-quoted literal of a
    Spark DDL statement (COMMENT, LOCATION, TBLPROPERTIES). DDL takes no
    bind parameters, so every interpolated literal must be escaped — a
    quote in untrusted metadata otherwise breaks (or injects into) the
    statement.

    Quotes are escaped by DOUBLING (``''``) rather than backslashing: the
    parser accepts ``''`` in its default mode, and doubling survives
    ``spark.sql.parser.escapedStringLiterals=true`` as well because DDL
    property/comment literals are unescaped with the DEFAULT (backslash)
    unescaper regardless of that conf — verified empirically on Spark
    4.1.2 (the conf only changes query-context literals). For the same
    reason backslashes are always doubled here: a raw trailing backslash
    would swallow the closing quote.
    """
    return value.replace("\\", "\\\\").replace("'", "''")


def quote_ident(name: str) -> str:
    """Backtick-quote a possibly-dotted identifier (schema.table) for
    interpolation into Spark SQL. Each part is quoted separately so dots
    keep their namespace meaning; embedded backticks are doubled per the
    Spark identifier-quoting rule."""
    return ".".join("`" + part.replace("`", "``") + "`"
                    for part in name.split("."))

# layer → comment, verbatim from setup_catalog.sql:15-29.
MEDALLION_SCHEMAS: dict[str, str] = {
    "bronze": "Raw ingestion layer. Append-only. Source data in original "
              "format.",
    "silver": "Cleaned, validated, and conformed data. Schema-enforced.",
    "gold": "Business-ready dimensional models. Star schema for reporting.",
    "data_quality": "Data quality check results, reconciliation logs, and "
                    "monitoring.",
}

# Column-for-column twin of setup_catalog.sql:32-43 (NOT NULL markers are
# enforced at write time by `log_reconciliation`; the in-memory session
# catalog does not persist column constraints).
RECONCILIATION_LOG_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("run_timestamp", T.TimestampType(), False),
    T.StructField("table_name", T.StringType(), False),
    T.StructField("check_type", T.StringType(), False),
    T.StructField("passed", T.BooleanType(), False),
    T.StructField("legacy_value", T.StringType(), True),
    T.StructField("lakehouse_value", T.StringType(), True),
    T.StructField("difference", T.DoubleType(), True),
    T.StructField("tolerance", T.DoubleType(), True),
    T.StructField("details", T.StringType(), True),
])

RECONCILIATION_LOG_TABLE = "data_quality.reconciliation_log"


def setup_catalog(spark: SparkSession,
                  location_root: str | None = None) -> list[str]:
    """Create the medallion schemas and the reconciliation-log table.
    Idempotent (IF NOT EXISTS throughout, like the reference DDL).
    Returns the executed statements for logging/audit."""
    executed = []
    for schema, comment in MEDALLION_SCHEMAS.items():
        loc = (f" LOCATION '{quote_literal(location_root)}/{schema}'"
               if location_root else "")
        stmt = (f"CREATE SCHEMA IF NOT EXISTS {quote_ident(schema)} "
                f"COMMENT '{quote_literal(comment)}'{loc}")
        spark.sql(stmt)
        executed.append(stmt)
    cols = ", ".join(f"{f.name} {f.dataType.simpleString().upper()}"
                     for f in RECONCILIATION_LOG_SCHEMA.fields)
    stmt = (f"CREATE TABLE IF NOT EXISTS {RECONCILIATION_LOG_TABLE} "
            f"({cols}) USING PARQUET "
            f"COMMENT 'Migration reconciliation results between legacy "
            f"warehouse and lakehouse'")
    spark.sql(stmt)
    executed.append(stmt)
    return executed


def classify_table(spark: SparkSession, table: str, classification: str,
                   contains_pii: bool) -> None:
    """GLBA-style classification tags (setup_catalog.sql:52-55), recorded
    as table properties in the session catalog."""
    spark.sql(
        f"ALTER TABLE {quote_ident(table)} SET TBLPROPERTIES ("
        f"'data_classification' = '{quote_literal(classification)}', "
        f"'contains_pii' = '{str(contains_pii).lower()}')")


def table_classification(spark: SparkSession, table: str) -> dict[str, str]:
    """Read back the classification properties for audit."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {quote_ident(table)}").collect()
    props = {r.key: r.value for r in rows}
    return {k: props[k] for k in ("data_classification", "contains_pii")
            if k in props}


def log_reconciliation(spark: SparkSession, run_id: str, table_name: str,
                       results: list[ReconResult], run_timestamp: datetime,
                       tolerance: float | None = None) -> DataFrame:
    """Append a reconciliation run to ``data_quality.reconciliation_log``
    with the reference DDL's row shape. ``run_timestamp`` is an explicit
    parameter, not ``current_timestamp()`` — deterministic replays and
    golden-output tests need a pinned clock (SURVEY §7.3.3).
    Returns the appended rows."""
    def diff(r: ReconResult) -> float | None:
        try:
            lv, tv = float(r.legacy_value), float(r.target_value)
        except (TypeError, ValueError):
            return None
        return abs(lv - tv)

    rows = [(run_id, run_timestamp, table_name, r.check, r.passed,
             None if r.legacy_value is None else str(r.legacy_value),
             None if r.target_value is None else str(r.target_value),
             diff(r), tolerance, r.details)
            for r in results]
    df = spark.createDataFrame(rows, RECONCILIATION_LOG_SCHEMA)
    df.write.mode("append").insertInto(RECONCILIATION_LOG_TABLE)
    return df


def verify_layer(spark: SparkSession, layer: str) -> dict[str, object]:
    """Post-deploy smoke check for one layer — the runnable twin of
    `tests/smoke/verify_layer_access.py:21-105`: schema is accessible,
    a table round-trips (write → read → count), cleanup drops it, and the
    layer's tables are listed. Returns the outcome instead of sys.exit so
    callers (pipelines, tests) compose it."""
    test_table = f"{quote_ident(layer)}._smoke_test"
    out: dict[str, object] = {"layer": layer}
    # Restore the CALLER's schema (not a hard-coded default) and drop the
    # smoke table even when a step throws — otherwise a failed check
    # leaves the session parked on the layer schema with the test table
    # leaked, and a successful one silently moved the session to default.
    prev_schema = spark.catalog.currentDatabase()
    try:
        spark.sql(f"USE SCHEMA {quote_ident(layer)}")
        out["schema_accessible"] = True
        df = spark.createDataFrame(
            [("smoke_test_1", 42, "2024-01-01T00:00:00")],
            "test_id string, test_value int, test_timestamp string")
        df.write.format("parquet").mode("overwrite").saveAsTable(test_table)
        n = spark.read.table(test_table).count()
        out["roundtrip_rows"] = n
        out["write_read_ok"] = n == 1
        out["tables"] = [r.tableName
                         for r in spark.sql(
                             f"SHOW TABLES IN {quote_ident(layer)}")
                         .collect()
                         if not r.tableName.startswith("_")]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {test_table}")
        spark.sql(f"USE SCHEMA {quote_ident(prev_schema)}")
    return out


def reconciliation_summary(spark: SparkSession) -> DataFrame:
    """Per-(table, check) pass rates over the log — the monitoring query a
    migration team watches. One hash aggregate over the log table."""
    return (
        spark.read.table(RECONCILIATION_LOG_TABLE)
        .groupBy("table_name", "check_type")
        .agg(F.count("*").alias("n_runs"),
             F.sum(F.when(F.col("passed"), 1).otherwise(0))
             .cast("long").alias("n_passed"),
             F.max("run_timestamp").alias("last_run"))
        .withColumn("all_passed", F.col("n_passed") == F.col("n_runs"))
        .orderBy("table_name", "check_type")
    )
