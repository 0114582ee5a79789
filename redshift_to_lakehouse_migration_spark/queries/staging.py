"""Silver-layer staging transforms over the driver tables.

Parity targets: the reference's `silver/clean_*.py` / `stg_*.sql` models —
NOT-NULL key filters (P1), numeric-range predicates (P2), trim/upper
normalization, empty-string→NULL, string→typed casts (SURVEY §2.2, §2.8,
§2.12). All transforms are single wide ``select``s so Catalyst emits one
Project over the scan with full column pruning + predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import empty_to_null, norm_str
from ..tables import load


def stg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_policies analog: key filter + normalize + typed casts
    (`silver/clean_policies.py:32-75` / `stg_policies.sql:5-33`)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey").isNotNull()
                 & F.col("o_orderdate").isNotNull())
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            norm_str("o_orderstatus").alias("order_status"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            norm_str("o_orderpriority").alias("order_priority"),
            F.split(F.col("o_orderpriority"), "-").getItem(0)
             .alias("priority_code"),
        )
    )


def stg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_claims/premiums analog: composite key filter + amount>0 +
    empty→null (`silver/clean_claims.py:29-54`, `silver/clean_premiums.py:15-31`)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey").isNotNull()
                  & F.col("l_linenumber").isNotNull()
                  & (F.col("l_quantity") > 0))
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_partkey").alias("part_id"),
            F.col("l_suppkey").alias("supplier_id"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extended_price"),
            F.col("l_discount").alias("discount"),
            F.col("l_tax").alias("tax"),
            empty_to_null(norm_str("l_returnflag")).alias("return_flag"),
            norm_str("l_linestatus").alias("line_status"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("net_price"),
        )
    )


def stg_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_properties analog: trim/upper + typed casts
    (`silver/clean_properties.py:15-38` / `stg_properties.sql:5-34`)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey").isNotNull())
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.trim("c_name").alias("customer_name"),
            F.col("c_nationkey").alias("nation_id"),
            # kept as double: a decimal(12,2) cast here rounds half-way cents
            # differently in Spark (HALF_UP) vs DuckDB, so the driver oracle
            # hash-mismatched in round 1. Exact-decimal money handling is
            # exercised by agg_pricing_summary; the raw passthrough is
            # bit-identical across engines.
            F.col("c_acctbal").alias("account_balance"),
            norm_str("c_mktsegment").alias("market_segment"),
        )
    )


QUERIES = {
    "stg_orders": stg_orders,
    "stg_lineitem": stg_lineitem,
    "stg_customer": stg_customer,
}

ORACLES = {
    "stg_orders": """
        SELECT
            o_orderkey AS order_id,
            o_custkey AS customer_id,
            upper(trim(o_orderstatus, ' ')) AS order_status,
            CAST(o_orderdate AS DATE) AS order_date,
            o_totalprice AS total_price,
            upper(trim(o_orderpriority, ' ')) AS order_priority,
            string_split(o_orderpriority, '-')[1] AS priority_code
        FROM orders
        WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL
    """,
    "stg_lineitem": """
        SELECT
            l_orderkey AS order_id,
            l_linenumber AS line_number,
            l_partkey AS part_id,
            l_suppkey AS supplier_id,
            l_quantity AS quantity,
            l_extendedprice AS extended_price,
            l_discount AS discount,
            l_tax AS tax,
            CASE WHEN trim(upper(trim(l_returnflag, ' ')), ' ') = '' THEN NULL
                 ELSE upper(trim(l_returnflag, ' ')) END AS return_flag,
            upper(trim(l_linestatus, ' ')) AS line_status,
            CAST(l_shipdate AS DATE) AS ship_date,
            l_extendedprice * (1 - l_discount) AS net_price
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
          AND l_quantity > 0
    """,
    "stg_customer": """
        SELECT
            c_custkey AS customer_id,
            trim(c_name, ' ') AS customer_name,
            c_nationkey AS nation_id,
            c_acctbal AS account_balance,
            upper(trim(c_mktsegment, ' ')) AS market_segment
        FROM customer
        WHERE c_custkey IS NOT NULL
    """,
}
