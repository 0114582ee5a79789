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
  `tests/test_maintenance.py` asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(spark: SparkSession, path: str,
                    target_mb: int = 256,
                    partition_by: list[str] | None = None) -> int:
    """Rewrite ``path`` to files of ~``target_mb``. Returns the data-file
    count written. Uses a size-based estimate (`df.inputFiles` + fs
    sizes), not a row count — row width varies wildly across tables.

    With ``partition_by``, rows are hash-repartitioned ON the partition
    columns first: each partition VALUE then lives in exactly one task
    and writes exactly one file. (A plain ``repartition(n)`` spreads
    every value across every task, and ``partitionBy`` would then write
    up to n × n_values files — an explosion, not a compaction.) The cost
    is one file per partition value regardless of size; split oversized
    values by adding a derived salt column to the partitioning."""
    import math
    import os
    from urllib.parse import unquote, urlparse

    df = spark.read.parquet(path)
    total_bytes = 0
    missing = 0
    for f in df.inputFiles():
        # inputFiles() returns percent-encoded file: URIs — decode before
        # stat (a space in the path arrives as %20)
        parsed = urlparse(f)
        local = unquote(parsed.path) if parsed.scheme in ("file", "") else None
        if local is not None and os.path.exists(local):
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
    if partition_by:
        writer = (df.repartition(n_files, *partition_by)
                  .write.mode("overwrite").partitionBy(*partition_by))
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(tmp)
    n_written = sum(
        1 for root, _dirs, files in os.walk(tmp)
        for name in files if name.startswith("part-"))
    # Swap with crash-restore: if the second move fails IN-PROCESS, the
    # original is put back so a dataset always exists at `path`.  A hard
    # KILL between the two moves is the one window this cannot cover on a
    # plain filesystem (there is no atomic two-directory swap): the
    # dataset then lives intact at `<path>__old` — recover by renaming it
    # back.  The guard below turns that residue into a loud refusal on
    # the NEXT run instead of `shutil.move` silently NESTING the live
    # dataset inside the stale dir (after which the restore branch would
    # resurrect stale data as the live table).  On object storage the
    # equivalent is a Delta/Iceberg transactional commit, not a rename.
    import shutil
    back = path.rstrip("/") + "__old"
    if os.path.exists(back):
        raise RuntimeError(
            f"compact_parquet: stale swap residue at {back} (a prior run "
            f"was interrupted mid-swap). Recover manually: if {path} is "
            f"missing, rename {back} back to it; if {path} is current, "
            f"delete {back}. Refusing to guess — auto-deleting could "
            f"drop the only surviving copy.")
    shutil.move(path, back)
    try:
        shutil.move(tmp, path)
    except BaseException:
        shutil.move(back, path)
        raise
    shutil.rmtree(back)
    return n_written


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
    Pure bitwise column expression — codegen'd, no UDF.

    PRECONDITION: inputs must already fit in ``bits`` bits — higher bits
    are silently discarded, which destroys the locality property (0 and
    2^bits contribute identical code bits). :func:`write_zordered`
    min-max-normalizes raw columns into the domain before calling this."""
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
    sortWithinPartitions makes every row-group monotone in z.

    Raw columns are min-max-normalized into the ``bits``-bit domain first
    (one 4-scalar aggregate — a driver action, but constant-sized):
    :func:`morton_code` discards bits above 2^``bits``, so feeding it a
    raw wide-domain column (customer ids in the millions) would interleave
    only the low bits and the layout would stop correlating with the
    column at all. Normalization is rank-preserving, which is all the
    curve needs."""
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(F.col(col_a).cast("double")),
        F.max(F.col(col_a).cast("double")),
        F.min(F.col(col_b).cast("double")),
        F.max(F.col(col_b).cast("double"))).collect()[0]
    top = (1 << bits) - 1

    def scaled(c, lo, hi):
        col = F.col(c).cast("double")
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("long")
        return F.floor((col - F.lit(lo)) * top / F.lit(hi - lo)) \
            .cast("long")

    zdf = df.withColumn("__z", morton_code(
        scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b), bits))
    (zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(path))
