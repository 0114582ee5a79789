"""Loaders for the driver's TPC-H-ish parquet tables (see TESTDATA.md).

All queries in the engine take ``(spark, sf_dir)`` and pull tables through
``load``; at cluster scale the same call reads a partitioned table from object
storage — Catalyst pushes filters/pruning into the parquet scan either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune_for_session

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension-sized tables: always broadcast-joinable against facts.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. UTC session TZ is pinned so timestamp columns
    collect identically regardless of host timezone.

    The ``events`` table stores TIMESTAMP(NANOS), which different Spark
    versions surface differently: as a rejected type (older vectorized
    reader — ``legacy.parquet.nanosAsLong`` reads it as bigint we rebuild
    from), or as micro-truncated TIMESTAMP_NTZ (4.1+). Both are normalized
    to a session-TZ TIMESTAMP here so every downstream query sees ONE type
    (unix_micros and friends reject NTZ) with the same micro-truncation
    DuckDB applies; with the UTC pin the wall-clock values are identical
    either way.
    """
    tune_for_session(spark)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Ensure at least ``defaultParallelism`` partitions before CPU-heavy
    per-row expressions (shingling, n-gram construction, signatures).

    A small local parquet file scans as ONE partition, serializing all
    downstream expression work onto one core; a round-robin repartition
    costs one cheap shuffle of the raw rows and unlocks every core. At
    cluster scale this is a NO-OP: a 100 TB table scans as tens of
    thousands of partitions, so the condition never triggers and no
    shuffle is added.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              num_partitions: int = 32,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              **properties: str) -> DataFrame:
    """JDBC scan of a legacy warehouse table (the reconciliation source in
    the reference, `migration_validation/reconciliation.py:189`).

    Without ``partition_column`` the whole table arrives through ONE
    connection — fine for a dim, fatal for a fact. For anything large, pass
    a numeric/date column plus bounds so Spark opens ``num_partitions``
    parallel range-partitioned cursors.
    """
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JDBC source as the literal "None"
            # and die in a JVM NumberFormatException — fail clearly here
            raise ValueError(
                "partition_column requires lower_bound and upper_bound")
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register the driver tables as temp views for the SQL entry points."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
