"""Classic decision-support join pipelines (TPC-H Q3/Q5/Q10 shapes).

The reference's gold marts are star-join aggregates (`gold/agg_claims.py`,
`gold/dim_policy.py`); these three queries exercise the same shapes at
their canonical hardest: 3-to-6-way joins with selective date/segment
predicates and revenue aggregation. Adapted to the driver's trimmed
TPC-H-ish schemas (no commit/receipt dates, no order comments).

Scale shape: all dimension sides (region, nation, customer, supplier) are
broadcast so the only shuffles are the final aggregates on their group
keys; date predicates sit directly on the parquet scans (pushed filters).
Revenue sums are decimal-cast before summation (exact, order-independent)
and surfaced as DOUBLE — see ``functions.dsum``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import d2d_sql, dsum
from ..tables import load

_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2)) "
            "* (1 - CAST(l_discount AS DECIMAL(4,2)))")


def _rev() -> F.Column:
    """l_extendedprice * (1 - l_discount) with exact decimal arithmetic:
    raw doubles carry 2-decimal money values, so cast-then-multiply is exact
    in both engines (same rationale as queries/analytics.py revenue fixes).
    Built lazily — Column construction needs an active session."""
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: unshipped-revenue top-10 for one market segment.
    customer(BUILDING) joined into orders(before pivot) joined to
    lineitem(shipped after pivot); one aggregate on the order key.

    Hint discipline: customer is corpus-proportional, so it carries NO
    ``F.broadcast`` hint — the size-checked ``autoBroadcastJoinThreshold``
    path picks the identical BroadcastHashJoin at bench scales and
    degrades gracefully to sort-merge once the segment slice outgrows
    the threshold (the r8 sf8.0 q5 lesson, CHANGES_r8 §9d)."""
    pivot = "1998-06-01"
    c = load(spark, sf_dir, "customer") \
        .filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = load(spark, sf_dir, "orders") \
        .filter(F.col("o_orderdate") < F.lit(pivot).cast("timestamp")) \
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    l = load(spark, sf_dir, "lineitem") \
        .filter(F.col("l_shipdate") > F.lit(pivot).cast("timestamp")) \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        l.join(o.join(c, F.col("o_custkey") == F.col("c_custkey")),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), scale=4, precision=30).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: per-nation revenue inside one region for one year, with
    the local-supplier constraint (c_nationkey = s_nationkey). Five joins;
    the fact stream shuffles once — for the final nation aggregate —
    while every dimension side broadcasts at the scales where that is
    SAFE.

    Hint discipline (the r8 sf8.0 probe lesson): ``F.broadcast`` pins
    only the genuinely-bounded dims — nation⋈region is fixed-cardinality
    (25×5 rows at every scale factor).  customer and supplier are
    corpus-PROPORTIONAL, so their joins go through the size-checked
    `autoBroadcastJoinThreshold` path (64 MB engine default): identical
    BroadcastHashJoin plans at every bench scale, but a graceful
    sort-merge degrade once the side outgrows the threshold.  A hint
    there is not an optimization, it is a deferred crash: hints bypass
    the size check, and the previously-hinted customer broadcast OOM'd
    the probe harness at sf8.0 — at 100 TB (15G-row customer) it is
    unbuildable on any driver."""
    r = load(spark, sf_dir, "region") \
        .filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n = load(spark, sf_dir, "nation") \
        .select("n_nationkey", "n_name", "n_regionkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders") \
        .filter((F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))) \
        .select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    asia_nations = n.join(F.broadcast(r),
                          F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s,
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(asia_nations),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(_rev(), scale=4, precision=30).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by lost revenue from returned items in
    one quarter. lineitem(R) ⋈ orders(quarter) shuffle once for the
    customer aggregate; nation (fixed 25 rows) is hint-broadcast onto
    the result, while customer — corpus-proportional — goes through the
    size-checked threshold path (same BHJ at bench scales, graceful SMJ
    degrade at 100 TB; CHANGES_r8 §9d)."""
    c = load(spark, sf_dir, "customer") \
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders") \
        .filter((F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))) \
        .select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem") \
        .filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    per_cust = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(_rev(), scale=4, precision=30).alias("revenue"))
    )
    return (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("c_custkey").alias("customer_id"),
                F.col("c_name").alias("customer_name"),
                F.col("n_name").alias("nation"),
                F.col("c_acctbal").alias("account_balance"),
                F.col("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("customer_id"))
        .limit(20)
    )


QUERIES = {
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_supplier_volume": q5_region_supplier_volume,
    "q10_returned_items": q10_returned_items,
}

_DSUM_REV = d2d_sql(f"SUM(CAST({_REV_SQL} AS DECIMAL(30,4)))")

ORACLES = {
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {_DSUM_REV} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_region_supplier_volume": f"""
        SELECT n_name, {_DSUM_REV} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q10_returned_items": f"""
        WITH per_cust AS (
            SELECT o_custkey, {_DSUM_REV} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1998-01-01'
              AND o_orderdate < TIMESTAMP '1998-04-01'
            GROUP BY o_custkey
        )
        SELECT c_custkey AS customer_id,
               c_name AS customer_name,
               n_name AS nation,
               c_acctbal AS account_balance,
               revenue
        FROM per_cust
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue DESC, customer_id
        LIMIT 20
    """,
}
