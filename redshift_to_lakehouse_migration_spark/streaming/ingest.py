"""Incremental file-stream ingest (SURVEY §2.9 ST1–ST4).

OSS twin of the reference's Auto Loader bronze path
(`bronze/ingest_policies.py:100-130`): Structured Streaming file source with
explicit schema, exactly-once via checkpoint, one-shot
``trigger(availableNow=True)`` batch-over-stream, append output mode, and
the same lineage metadata columns as the batch path. Schema evolution is
restart-on-change in OSS (the `addNewColumns` mode is Databricks-only,
SURVEY §2.9 ST2).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ingest_stream(spark: SparkSession, source_dir: str,
                  schema: T.StructType, target_path: str,
                  checkpoint_path: str, fmt: str = "csv",
                  await_termination: bool = True):
    """Stream-ingest files from a landing directory into a parquet table.

    Exactly-once: the checkpoint tracks processed files, so re-running after
    new files land appends only the delta (`bronze/ingest_policies.py:111-127`
    semantics, minus cloudFiles).
    """
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    src = getattr(reader, fmt)(source_dir)
    with_meta = (
        src.withColumn("_ingestion_timestamp", F.current_timestamp())
        .withColumn("_source_file", F.input_file_name())
    )
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
