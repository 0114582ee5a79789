"""Gold-layer fact builds — the engine's flagship star-schema queries.

Parity targets: `gold/fact_claims.py:18-79` (inner join J1 + left join J2 +
wide computed projection P4 + LEAST cap + null-guarded ratio + boolean flags +
datediff) and `gold/fact_premiums.py:14-52` (left join + manual column pruning
P3 + conditional measures). Role mapping per FIXTURES.md §6: lineitem≈claims,
orders≈policies, customer/nation≈properties.

Scale notes: the fact side streams; nation/region are fixed-cardinality
(25/5 rows at any SF) and carry explicit ``F.broadcast`` hints. customer is
corpus-PROPORTIONAL, so it goes through the size-checked
``autoBroadcastJoinThreshold`` path instead: the engine picks the identical
BroadcastHashJoin at bench scales and degrades gracefully to sort-merge once
customer outgrows the threshold — a hint there would pin a broadcast that
OOMs at 100 TB (the r8 sf8.0 q5 lesson, CHANGES_r8 §9d). The
orders⋈lineitem join is a co-partitioned shuffle join on the join key; AQE
handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load


def fact_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: lineitem ⋈ orders ⟕ customer ⟕ nation with the reference's
    fact_claims measure set (capped amount, null-guarded ratio, day-interval,
    boolean flags)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    joined = (
        li.filter(F.col("l_orderkey").isNotNull() & (F.col("l_quantity") > 0))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"),
              "left")
    )

    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_partkey").alias("part_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("market_segment"),
        F.col("n_name").alias("nation_name"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("l_quantity").alias("quantity"),
        # LEAST cap (`gold/fact_claims.py:55`)
        F.least(F.col("l_quantity"), F.lit(30.0)).alias("capped_quantity"),
        F.col("l_extendedprice").alias("extended_price"),
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charged_price"),
        # null-guarded ratio (`gold/fact_claims.py:61-64` / NULLIF twin)
        (F.col("l_extendedprice")
         / F.when(F.col("o_totalprice") == 0, None)
            .otherwise(F.col("o_totalprice"))).alias("price_to_order_ratio"),
        # DATEDIFF day interval (`gold/fact_claims.py:66-67`)
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_ship"),
        # boolean flags (`gold/fact_claims.py:73-76`)
        (F.col("l_returnflag") == "R").alias("is_returned"),
        (F.col("l_quantity") > 30).alias("is_bulk"),
        (F.col("l_discount") >= 0.05).alias("is_discounted"),
    )


def fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_premiums analog: orders ⟕ pruned customer projection, conditional
    measures + late/flag logic (`gold/fact_premiums.py:14-52`)."""
    o = load(spark, sf_dir, "orders")
    # manual column pruning before join (P3, `gold/fact_premiums.py:20-22`)
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )

    return (
        o.filter(F.col("o_orderkey").isNotNull())
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            F.trim(F.col("c_name")).alias("customer_name"),
            F.col("c_mktsegment").alias("market_segment"),
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
             .otherwise(F.lit(0.0)).alias("fulfilled_amount"),
            F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
             .otherwise(F.lit(0.0)).alias("open_amount"),
            (F.col("o_orderpriority") <= "2-HIGH").alias("is_high_priority"),
            (F.col("o_totalprice") > F.coalesce(F.col("c_acctbal"),
                                                F.lit(0.0)))
            .alias("exceeds_balance"),
        )
    )


QUERIES = {
    "fact_lineitem": fact_lineitem,
    "fact_orders": fact_orders,
}

ORACLES = {
    "fact_lineitem": """
        SELECT
            l.l_orderkey AS order_id,
            l.l_linenumber AS line_number,
            l.l_partkey AS part_id,
            o.o_custkey AS customer_id,
            c.c_mktsegment AS market_segment,
            n.n_name AS nation_name,
            o.o_orderstatus AS order_status,
            l.l_quantity AS quantity,
            least(l.l_quantity, 30.0) AS capped_quantity,
            l.l_extendedprice AS extended_price,
            l.l_extendedprice * (1 - l.l_discount) AS net_price,
            (l.l_extendedprice * (1 - l.l_discount)) * (1 + l.l_tax)
                AS charged_price,
            l.l_extendedprice / nullif(o.o_totalprice, 0)
                AS price_to_order_ratio,
            date_diff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS days_to_ship,
            l.l_returnflag = 'R' AS is_returned,
            l.l_quantity > 30 AS is_bulk,
            l.l_discount >= 0.05 AS is_discounted
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_orderkey IS NOT NULL AND l.l_quantity > 0
    """,
    "fact_orders": """
        SELECT
            o.o_orderkey AS order_id,
            o.o_custkey AS customer_id,
            trim(c.c_name, ' ') AS customer_name,
            c.c_mktsegment AS market_segment,
            o.o_orderstatus AS order_status,
            CAST(o.o_orderdate AS DATE) AS order_date,
            o.o_totalprice AS total_price,
            CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice
                 ELSE 0.0 END AS fulfilled_amount,
            CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice
                 ELSE 0.0 END AS open_amount,
            o.o_orderpriority <= '2-HIGH' AS is_high_priority,
            o.o_totalprice > coalesce(c.c_acctbal, 0.0) AS exceeds_balance
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderkey IS NOT NULL
    """,
}
