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


def morton_code(a, b, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative ints (Z-order /
    Morton curve): locality in the code ⇒ locality in BOTH dimensions.
    Pure bitwise column expression — codegen'd, no UDF."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    ca = a if isinstance(a, Column) else F.col(a)
    cb = b if isinstance(b, Column) else F.col(b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        # disjoint bit positions, so + is bitwise-OR (PySpark's `|` on
        # Columns is boolean OR, not bitwise)
        z = (z
             + F.shiftleft(F.shiftright(ca.cast("long"), i)
                           .bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(cb.cast("long"), i)
                           .bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def write_zordered(df, path: str, col_a: str, col_b: str,
                   n_files: int = 16, bits: int = 16) -> None:
    """Z-order layout (the OPTIMIZE ZORDER capability on plain parquet,
    reference deployment: `databricks.yml:219-220` optimizeWrite): sort
    the table along the Morton curve of two filter columns and range-
    split into ``n_files``, so every file's min/max footer covers a
    NARROW range of BOTH columns. Point/range predicates on either
    column then skip most files/row-groups via parquet statistics —
    the layout-side half of predicate pushdown at 100 TB, where a full
    scan is the difference between seconds and hours.

    repartitionByRange computes range bounds by sampling the z column;
    sortWithinPartitions makes every row-group monotone in z."""
    from pyspark.sql import functions as F
    zdf = df.withColumn("__z", morton_code(col_a, col_b, bits))
    (zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(path))
