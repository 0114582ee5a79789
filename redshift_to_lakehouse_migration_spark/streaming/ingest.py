"""Incremental file-stream ingest (SURVEY §2.9 ST1–ST4).

OSS twin of the reference's Auto Loader bronze path
(`bronze/ingest_policies.py:100-130`): Structured Streaming file source with
explicit schema, exactly-once via checkpoint, one-shot
``trigger(availableNow=True)`` batch-over-stream, append output mode, and
the same lineage metadata columns as the batch path.

Schema evolution (ST2): the reference uses Auto Loader's
``schemaEvolutionMode=addNewColumns`` (`bronze/ingest_policies.py:115`),
which is Databricks-only. The OSS equivalent implemented here is
restart-on-schema-change: when the landing files gain a column, call
:func:`ingest_stream` again with the widened schema and the SAME
checkpoint — the file-source checkpoint only tracks which files were
processed, so the restart picks up exactly the unprocessed files and
writes them with the new schema. The target then holds parquet files of
both schemas; :func:`read_ingested` reconciles them with ``mergeSchema``
(old rows surface NULL for the added columns, the same result
addNewColumns produces). Exercised end-to-end in
`tests/test_streaming.py::test_ingest_schema_evolution_restart`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..medallion.bronze import add_metadata_columns, corrupt_schema


def ingest_stream(spark: SparkSession, source_dir: str,
                  schema: T.StructType, target_path: str,
                  checkpoint_path: str, fmt: str = "csv",
                  rfc4180: bool = False,
                  await_termination: bool = True):
    """Stream-ingest files from a landing directory into a parquet table.

    Exactly-once: the checkpoint tracks processed files, so re-running after
    new files land appends only the delta (`bronze/ingest_policies.py:111-127`
    semantics, minus cloudFiles).

    Corrupt-row accounting matches the BATCH path (`bronze.read_csv` /
    `read_jsonl`): the stream reads PERMISSIVE with a ``_corrupt_record``
    column, so a malformed landing row flows into bronze flagged instead
    of silently NULL-fielded — without it, the streaming ingest would
    re-open exactly the blind spot the batch accounting closed, on the
    path that promises batch parity. ``rfc4180`` declares the
    doubled-quote CSV dialect per landing dir, as in ``read_csv``.
    """
    reader = (spark.readStream
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record")
              .schema(corrupt_schema(schema)))
    if fmt == "csv":
        reader = reader.option("header", "true")
        if rfc4180:
            reader = reader.option("escape", '"')
    src = getattr(reader, fmt)(source_dir)
    # The SAME lineage builder as the batch path (bronze.add_metadata_
    # columns) — a hand-rolled subset here once omitted _batch_id, giving
    # stream- and batch-fed targets split schemas. In streaming,
    # current_timestamp() is pinned per micro-batch, so the epoch-derived
    # _batch_id is constant within a micro-batch — the streaming analog of
    # the batch path's default.
    with_meta = add_metadata_columns(src)
    q = (
        with_meta.writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def read_ingested(spark: SparkSession, target_path: str):
    """Read an ingest target that may span schema versions (see module
    docstring): ``mergeSchema`` unions the per-file schemas; rows written
    before a column existed read as NULL for it — the OSS analog of Auto
    Loader's addNewColumns result."""
    return spark.read.option("mergeSchema", "true").parquet(target_path)
