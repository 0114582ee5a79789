"""Table maintenance: small-file compaction and bucketed layouts.

The reference leans on Databricks auto-compaction and optimized writes
(`databricks.yml:219-220`, `setup_catalog.sql:46-49`). Open-source
equivalents provided here:

- ``compact_parquet``: rewrite a parquet dataset to ~``target_mb`` files
  (streaming ingest and fine-grained partitioning both breed small files;
  at 100 TB, scan throughput dies by a thousand 1 MB files — compaction
  restores large sequential reads).
- ``write_bucketed``: persist a table bucketed by join key so repeated
  co-located joins skip the shuffle entirely (the Spark analog of
  Redshift DISTKEY, `MIGRATION_PLAYBOOK.md:37`). Both sides bucketed on
  the same key × bucket count → sort-merge join with NO exchange;
  `tests/test_bucketing.py` asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(spark: SparkSession, path: str,
                    target_mb: int = 256,
                    partition_by: list[str] | None = None) -> int:
    """Rewrite ``path`` to files of ~``target_mb``. Returns the file count
    written. Uses a size-based estimate (`df.inputFiles` + fs sizes), not
    a row count — row width varies wildly across tables."""
    import math
    import os

    df = spark.read.parquet(path)
    total_bytes = 0
    missing = 0
    for f in df.inputFiles():
        local = f.removeprefix("file:")
        if os.path.exists(local):
            total_bytes += os.path.getsize(local)
        else:
            missing += 1
    if missing:
        # non-local URIs (s3://, hdfs://) can't be stat'd here; falling
        # back to 0 bytes would silently collapse the rewrite to one file
        raise ValueError(
            f"compact_parquet: {missing} input files are not local — "
            f"size-based planning needs a filesystem-appropriate estimator")
    n_files = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compacting"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    # swap with crash-restore: if the second move fails, put the original
    # back so a dataset always exists at `path`
    import shutil
    back = path.rstrip("/") + "__old"
    shutil.move(path, back)
    try:
        shutil.move(tmp, path)
    except BaseException:
        shutil.move(back, path)
        raise
    shutil.rmtree(back)
    return n_files


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 16,
                   sort_col: str | None = None) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table. Joins
    between tables bucketed on the same key and count need no exchange."""
    writer = (df.write.mode("overwrite")
              .bucketBy(n_buckets, bucket_col))
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
