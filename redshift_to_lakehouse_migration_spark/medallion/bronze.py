"""Bronze layer: raw ingestion with lineage metadata (SURVEY §2.1 S1/S6).

Parity: `bronze/ingest_policies.py:28-97` — explicit schema (never
inferSchema), permissive append writes, and the three lineage columns
(`_ingestion_timestamp`, `_source_file`, `_batch_id`;
`ingest_policies.py:55-65`). Storage format is parquet here (Delta-optional
design, SURVEY §7.0); the write path takes any format string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def corrupt_schema(schema: T.StructType | str) -> T.StructType:
    """The declared schema plus the ``_corrupt_record`` accounting column
    (ONE construction — batch CSV, batch JSONL, and the streaming ingest
    must agree on it; a copy because ``StructType.add`` mutates the
    caller's). Accepts a DDL string (the streaming ingest's schema-
    evolution restarts pass one).

    Idempotent: a schema derived from an already-ingested bronze table
    (``spark.table(...).schema`` on a restart) already carries
    ``_corrupt_record``; appending again would make the reader schema
    ambiguous, so such a schema is returned as-is (ADVICE r6)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if any(f.name == "_corrupt_record" for f in schema.fields):
        return T.StructType(list(schema.fields))
    return T.StructType(list(schema.fields)
                        + [T.StructField("_corrupt_record", T.StringType())])


def add_metadata_columns(df: DataFrame,
                         batch_id: int | None = None) -> DataFrame:
    """Lineage columns (`bronze/ingest_policies.py:55-65`). ``batch_id``
    defaults to ingest-time epoch; pass one for reproducible runs."""
    bid = (F.lit(batch_id).cast("long") if batch_id is not None
           else F.current_timestamp().cast("long"))
    return (
        df.withColumn("_ingestion_timestamp", F.current_timestamp())
        .withColumn("_source_file", F.input_file_name())
        .withColumn("_batch_id", bid)
    )


def read_csv(spark: SparkSession, source_path: str,
             schema: T.StructType, rfc4180: bool = False) -> DataFrame:
    """CSV scan with explicit schema, header, no inference (S1,
    `bronze/ingest_policies.py:76-81`), and — unlike the reference —
    corrupt-row ACCOUNTING: PERMISSIVE mode alone silently nulls the
    fields of a malformed row (a type-mismatched id, a short row, the
    shards of an unsupported quoted newline), making bad input
    indistinguishable from legitimately-NULL data. With the
    ``_corrupt_record`` column each such row carries its raw line
    instead, so callers can quarantine-split exactly like the
    `read_jsonl` flow.

    ``rfc4180=True`` switches the quote-escape dialect: Spark's default
    escape is backslash, so an RFC-4180 file (doubled ``""`` inside
    quoted fields — Excel, most warehouse UNLOADs) parses the quotes
    literally into the value; ``escape='"'`` restores standard CSV
    semantics. Per-file dialect, caller-declared — sniffing it would
    need an extra pass over 100 TB.

    ``multiLine`` stays False deliberately: multi-line CSV is not
    splittable (one file = one task), which is unacceptable at scale.
    The boundary: a quoted field containing a real newline shreds into
    two rows, BOTH flagged in ``_corrupt_record`` — visible, not silent
    (pinned in tests/test_csv_hostile.py). Files that genuinely need
    embedded newlines should ship as JSONL/parquet."""
    reader = (
        spark.read
        .option("header", "true")
        .option("inferSchema", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if rfc4180:
        reader = reader.option("escape", '"')
    return reader.schema(corrupt_schema(schema)).csv(source_path)


def read_jsonl(spark: SparkSession, source_path: str,
               schema: T.StructType) -> DataFrame:
    """JSON-lines scan with explicit schema (the interchange format LLM
    corpora actually ship in). Same discipline as `read_csv`: no
    inference — a schema-inference pass over 100 TB is a full extra scan,
    and silent type drift is how bad rows poison a corpus. Malformed
    lines land in `_corrupt_record` (PERMISSIVE) instead of failing the
    ingest; callers route them to quarantine like the reference's DQ flow."""
    return (
        spark.read
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(corrupt_schema(schema))
        .json(source_path)
    )


def write_jsonl(df: DataFrame, target_path: str,
                mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, standard corpus export)."""
    df.write.mode(mode).json(target_path)


def ingest_batch(spark: SparkSession, source_path: str,
                 schema: T.StructType, target_path: str,
                 batch_id: int | None = None,
                 fmt: str = "parquet") -> int:
    """Batch ingest: scan → metadata → append (S1+S6,
    `bronze/ingest_policies.py:68-97`). Returns ingested row count from the
    write-side observation (no extra count job over the source)."""
    from pyspark.sql import Observation
    df = add_metadata_columns(read_csv(spark, source_path, schema), batch_id)
    obs = Observation("bronze_ingest")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    observed.write.format(fmt).mode("append").save(target_path)
    return int(obs.get["rows"])
