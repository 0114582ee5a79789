"""Window-function queries.

The reference has no window operators (SURVEY §2.5) — it sidesteps them with
Delta MERGE for SCD2 and full overwrites for latest-record semantics. These
are the standard Spark expressions of those same semantics, and the engine's
pure-Spark SCD2 (``redshift_to_lakehouse_migration_spark.scd2``) builds on them:

- dedup-to-latest: row_number() over (partition by key order by ts desc)
- SCD2 interval derivation: lead() over the version sequence
- running / moving aggregates with deterministic frame ordering

Every window orders by a unique key suffix (date, order_id) so frames are
deterministic — required both for oracle parity and for reproducible results
across cluster sizes (ties + nondeterministic partition order otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import d2d_sql
from ..tables import load


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-to-latest: the engine's standard alternative to the reference's
    MERGE-based 'current version' semantics (SURVEY §2.5)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderkey").alias("latest_order_id"),
            F.col("o_orderdate").cast("date").alias("latest_order_date"),
            F.col("o_totalprice").alias("latest_total_price"),
            F.col("o_orderstatus").alias("latest_status"),
        )
    )


def order_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval derivation via lead(): each order of a customer becomes a
    version row [effective_start, effective_end), open-ended current row —
    the window-based twin of `gold/dim_policy.py:98-148`'s MERGE."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey"))
    nxt = F.lead(F.col("o_orderdate").cast("date")).over(w)
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("effective_start_date"),
        nxt.alias("effective_end_date"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w).alias("version_number"),
    )


def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + moving average with explicit frames (deterministic
    unique ordering)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey"))
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    move = w.rowsBetween(-2, W.currentRow)
    price_dec = F.col("o_totalprice").cast("decimal(24,2)")
    return o.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_totalprice").alias("total_price"),
        F.sum(price_dec).over(run).cast("double").alias("running_revenue"),
        (F.sum(price_dec).over(move).cast("double")
         / F.count("*").over(move)).alias("moving_avg_3"),
        F.row_number().over(w).alias("order_seq"),
    )


def order_rank_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / lag across a joined dimension attribute."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # customer is corpus-proportional: no broadcast hint — the threshold
    # path picks the same BHJ at bench scales and degrades at 100 TB.
    j = o.join(c, F.col("o_custkey") == F.col("c_custkey"), "inner")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        j.select(
            F.col("c_mktsegment").alias("market_segment"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("total_price"),
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
            F.ntile(10).over(w).alias("price_decile"),
            # lead over the DESC window = the NEXT (lower-or-equal) price
            # — lag here returned the PREVIOUS (higher) price under a
            # column name promising the opposite, identically in the
            # oracle, so the hash gate couldn't see it
            F.lead("o_totalprice", 1).over(w).alias("next_lower_price"),
        )
        .filter(F.col("price_rank") <= 100)
    )


QUERIES = {
    "latest_order_per_customer": latest_order_per_customer,
    "order_version_history": order_version_history,
    "customer_running_revenue": customer_running_revenue,
    "order_rank_in_segment": order_rank_in_segment,
}

ORACLES = {
    "latest_order_per_customer": """
        SELECT o_custkey AS customer_id,
               o_orderkey AS latest_order_id,
               CAST(o_orderdate AS DATE) AS latest_order_date,
               o_totalprice AS latest_total_price,
               o_orderstatus AS latest_status
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC) AS rn
              FROM orders)
        WHERE rn = 1
    """,
    "order_version_history": """
        SELECT o_custkey AS customer_id,
               o_orderkey AS order_id,
               CAST(o_orderdate AS DATE) AS effective_start_date,
               lead(CAST(o_orderdate AS DATE)) OVER w AS effective_end_date,
               lead(CAST(o_orderdate AS DATE)) OVER w IS NULL AS is_current,
               row_number() OVER w AS version_number
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
    "customer_running_revenue": f"""
        SELECT o_custkey AS customer_id,
               o_orderkey AS order_id,
               CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice AS total_price,
               {d2d_sql('''SUM(CAST(o_totalprice AS DECIMAL(24,2))) OVER (
                   PARTITION BY o_custkey
                       ORDER BY o_orderdate NULLS FIRST, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')}
                   AS running_revenue,
               {d2d_sql('''SUM(CAST(o_totalprice AS DECIMAL(24,2))) OVER (
                   PARTITION BY o_custkey
                       ORDER BY o_orderdate NULLS FIRST, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)''')}
               / COUNT(*) OVER (
                   PARTITION BY o_custkey
                       ORDER BY o_orderdate NULLS FIRST, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3,
               row_number() OVER (
                   PARTITION BY o_custkey
                       ORDER BY o_orderdate NULLS FIRST, o_orderkey)
                   AS order_seq
        FROM orders
    """,
    "order_rank_in_segment": """
        SELECT * FROM (
            SELECT c.c_mktsegment AS market_segment,
                   o.o_orderkey AS order_id,
                   o.o_totalprice AS total_price,
                   rank() OVER w AS price_rank,
                   dense_rank() OVER w AS price_dense_rank,
                   ntile(10) OVER w AS price_decile,
                   lead(o.o_totalprice, 1) OVER w AS next_lower_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WINDOW w AS (PARTITION BY c.c_mktsegment
                         ORDER BY o.o_totalprice DESC, o.o_orderkey)
        ) WHERE price_rank <= 100
    """,
}


def order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows over order value per market segment: quartile
    (ntile), percent_rank, and cume_dist for each order — the ranking
    trio the reference's window-free dbt SQL cannot express. One window
    partition per segment; deterministic total order (value, then key).
    Emitted as integer basis points (floor) so both engines agree
    bit-for-bit on the boundary rows."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    j = (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
         .select("o_orderkey", "c_mktsegment", "o_totalprice"))
    w = (W.partitionBy("c_mktsegment")
         .orderBy(F.col("o_totalprice"), F.col("o_orderkey")))
    return (
        j.select(
            F.col("o_orderkey").alias("order_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice").alias("total_price"),
            F.ntile(4).over(w).alias("value_quartile"),
            F.floor(F.percent_rank().over(w) * 10000).cast("long")
            .alias("pct_rank_bps"),
            F.floor(F.cume_dist().over(w) * 10000).cast("long")
            .alias("cume_dist_bps"),
        )
        .orderBy("segment", "total_price", "order_id")
        .limit(1000)
    )


QUERIES["order_value_distribution"] = order_value_distribution

ORACLES["order_value_distribution"] = """
    SELECT o_orderkey AS order_id,
           c_mktsegment AS segment,
           o_totalprice AS total_price,
           NTILE(4) OVER w AS value_quartile,
           CAST(FLOOR(PERCENT_RANK() OVER w * 10000) AS BIGINT)
               AS pct_rank_bps,
           CAST(FLOOR(CUME_DIST() OVER w * 10000) AS BIGINT)
               AS cume_dist_bps
    FROM orders JOIN customer ON o_custkey = c_custkey
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY segment, total_price, order_id
    LIMIT 1000
"""


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram — the numeric companion of the
    categorical frequency distribution (A7). Bucket arithmetic is plain
    floor-division by a constant width (portable; DuckDB has no
    width_bucket), so the plan is one map-side expression + one hash
    aggregate."""
    o = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(11))
    return (
        o.groupBy(bucket.cast("int").alias("price_bucket"))
        .agg(F.count("*").alias("n_orders"),
             F.min("o_totalprice").alias("min_price"),
             F.max("o_totalprice").alias("max_price"))
        .orderBy("price_bucket")
    )


QUERIES["order_price_histogram"] = order_price_histogram

ORACLES["order_price_histogram"] = """
    SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 11) AS INTEGER)
               AS price_bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1
    ORDER BY price_bucket
"""
