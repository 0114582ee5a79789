"""Gold-layer dimension builds.

Parity targets (SURVEY §2.12): `dim_policy` (`gold/dim_policy.py:38-95` —
group-agg summary A1–A3, left join J2/J5, COALESCE defaults, status CASE,
datediff tenure, md5 surrogate key, SCD2 fields), `dim_property`
(`dim_property.sql:9-53` — risk-tier CASEs), `dim_coverage`
(`dim_coverage.sql:5-41` — DISTINCT + simple-CASE lookups), and `dim_date`
(`dim_date.sql:5-43` — date spine + calendar attributes + season flags).

SCD2 effective dates use a fixed ``AS_OF`` literal rather than
``current_date()`` so outputs are reproducible (SURVEY §7.3 risk 3); the
pipeline-level SCD2 in ``redshift_to_lakehouse_migration_spark.scd2`` takes ``as_of`` as a
parameter the same way.

Scale: each dim is built from a single shuffle (the summary groupBy); the
dimension-side joins are broadcast. Output cardinality is dimension-sized,
so these plans are scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    calendar_columns,
    count_if,
    davg,
    davg_sql,
    dsum_sql,
    lookup_case,
    norm_str,
    sum_if,
    surrogate_key,
    tier_case,
)
from ..tables import load

AS_OF = "2026-01-01"

BALANCE_TIERS = [(7500, "PLATINUM"), (5000, "GOLD"), (2500, "SILVER")]

PRIORITY_NAMES = {
    "1-URGENT": "Expedite immediately",
    "2-HIGH": "Expedite within 24 hours",
    "3-MEDIUM": "Standard handling",
    "4-NOT SPECIFIED": "No SLA specified",
    "5-LOW": "Deferred handling",
}


def dim_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_policy analog: per-customer order summary (A1–A3) ⟕ customer
    ⟕ nation, with COALESCE defaults, tier/status CASEs, tenure datediff,
    md5 SK, and fixed-as-of SCD2 columns."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")

    summary = o.groupBy("o_custkey").agg(
        F.count("*").alias("order_count"),
        sum_if(F.col("o_orderstatus") == "F", "o_totalprice")
            .alias("fulfilled_total"),
        sum_if(F.col("o_orderstatus") == "O", "o_totalprice")
            .alias("open_total"),
        count_if(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .alias("urgent_order_count"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_order_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order_date"),
        davg("o_totalprice").alias("avg_order_value"),
    )

    balance_tier = (
        F.when(F.col("c_acctbal") >= BALANCE_TIERS[0][0], BALANCE_TIERS[0][1])
         .when(F.col("c_acctbal") >= BALANCE_TIERS[1][0], BALANCE_TIERS[1][1])
         .when(F.col("c_acctbal") >= BALANCE_TIERS[2][0], BALANCE_TIERS[2][1])
         .otherwise("BRONZE")
    )
    activity = (
        F.when(F.col("order_count").isNull(), "INACTIVE")
         .when(F.col("order_count") >= 15, "FREQUENT")
         .otherwise("STANDARD")
    )

    return (
        c.join(summary, F.col("c_custkey") == F.col("o_custkey"), "left")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"),
              "left")
        .select(
            surrogate_key("c_custkey", "c_name").alias("customer_sk"),
            F.col("c_custkey").alias("customer_id"),
            F.trim("c_name").alias("customer_name"),
            F.col("n_name").alias("nation_name"),
            norm_str("c_mktsegment").alias("market_segment"),
            F.col("c_acctbal").alias("account_balance"),
            F.coalesce("order_count", F.lit(0).cast("long"))
                .alias("order_count"),
            F.coalesce("fulfilled_total", F.lit(0.0)).alias("fulfilled_total"),
            F.coalesce("open_total", F.lit(0.0)).alias("open_total"),
            F.coalesce("urgent_order_count", F.lit(0).cast("long"))
                .alias("urgent_order_count"),
            F.col("first_order_date"),
            F.col("last_order_date"),
            F.col("avg_order_value"),
            balance_tier.alias("customer_tier"),
            activity.alias("activity_status"),
            F.datediff("last_order_date", "first_order_date")
                .alias("tenure_days"),
            F.lit(AS_OF).cast("date").alias("effective_start_date"),
            F.lit(None).cast("date").alias("effective_end_date"),
            F.lit(True).alias("is_current"),
        )
    )


def dim_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_property analog: attribute normalization + 3 tier CASEs + md5 SK
    (`dim_property.sql:9-53`)."""
    p = load(spark, sf_dir, "part")
    type_tier = tier_case(
        norm_str("p_type"),
        [(("PROMO", "ECONOMY"), "VALUE"),
         (("STANDARD", "MEDIUM"), "CORE"),
         (("LARGE", "SMALL"), "SPECIALTY")],
    )
    size_tier = (
        F.when(F.col("p_size") <= 10, "COMPACT")
         .when(F.col("p_size") <= 25, "MID")
         .when(F.col("p_size") <= 40, "LARGE")
         .otherwise("OVERSIZE")
    )
    price_band = (
        F.when(F.col("p_retailprice") < 500, "BUDGET")
         .when(F.col("p_retailprice") < 1200, "STANDARD")
         .otherwise("PREMIUM")
    )
    return p.select(
        surrogate_key("p_partkey", "p_brand").alias("part_sk"),
        F.col("p_partkey").alias("part_id"),
        F.trim("p_name").alias("part_name"),
        norm_str("p_brand").alias("brand"),
        norm_str("p_type").alias("part_type"),
        F.col("p_size").alias("part_size"),
        F.col("p_retailprice").alias("retail_price"),
        type_tier.alias("type_tier"),
        size_tier.alias("size_tier"),
        price_band.alias("price_band"),
        (F.col("p_retailprice") > 1500).alias("is_premium"),
    )


def dim_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_coverage analog: DISTINCT codes + simple-CASE name lookup + md5 SK
    (`dim_coverage.sql:5-41`)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(norm_str("o_orderpriority").alias("priority_code"))
        .distinct()
        .select(
            surrogate_key("priority_code").alias("priority_sk"),
            F.col("priority_code"),
            # try_cast: a priority without the NN- shape ('NOPRIORITY',
            # free text) is raw-edge data — rank NULL, not a job abort
            # under ANSI (CHANGES_r6 §22 discipline; TRY_CAST in the twin)
            F.split("priority_code", "-").getItem(0).try_cast("int")
                .alias("priority_rank"),
            lookup_case("priority_code", PRIORITY_NAMES, "Unknown")
                .alias("priority_name"),
            F.col("priority_code").isin("1-URGENT", "2-HIGH")
                .alias("is_expedited"),
        )
    )


def dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date spine + calendar attributes (`dim_date.sql:5-43`), generated with
    explode(sequence(...)) — no driver-side loop, parallelizable."""
    spine = spark.sql(
        "SELECT explode(sequence(to_date('1995-01-01'), "
        "to_date('2001-12-31'), interval 1 day)) AS date_key"
    )
    cal = calendar_columns("date_key")
    return spine.select(
        surrogate_key("date_key").alias("date_sk"),
        F.col("date_key"),
        *[c.alias(n) for n, c in cal.items()],
    )


QUERIES = {
    "dim_customer": dim_customer,
    "dim_part": dim_part,
    "dim_priority": dim_priority,
    "dim_date": dim_date,
}

_SK = "md5(concat_ws('|', {parts}))"


def _sk_sql(*cols: str) -> str:
    parts = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), '_null_')" for c in cols)
    return _SK.format(parts=parts)


ORACLES = {
    "dim_customer": f"""
        WITH s AS (
            SELECT
                o_custkey,
                COUNT(*) AS order_count,
                {dsum_sql("CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0 END")}
                    AS fulfilled_total,
                {dsum_sql("CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0 END")}
                    AS open_total,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT)
                    AS urgent_order_count,
                MIN(CAST(o_orderdate AS DATE)) AS first_order_date,
                MAX(CAST(o_orderdate AS DATE)) AS last_order_date,
                {davg_sql("o_totalprice")} AS avg_order_value
            FROM orders GROUP BY o_custkey
        )
        SELECT
            {_sk_sql("c.c_custkey", "c.c_name")} AS customer_sk,
            c.c_custkey AS customer_id,
            trim(c.c_name, ' ') AS customer_name,
            n.n_name AS nation_name,
            upper(trim(c.c_mktsegment, ' ')) AS market_segment,
            c.c_acctbal AS account_balance,
            COALESCE(s.order_count, 0) AS order_count,
            COALESCE(s.fulfilled_total, 0.0) AS fulfilled_total,
            COALESCE(s.open_total, 0.0) AS open_total,
            COALESCE(s.urgent_order_count, 0) AS urgent_order_count,
            s.first_order_date,
            s.last_order_date,
            s.avg_order_value,
            CASE WHEN c.c_acctbal >= 7500 THEN 'PLATINUM'
                 WHEN c.c_acctbal >= 5000 THEN 'GOLD'
                 WHEN c.c_acctbal >= 2500 THEN 'SILVER'
                 ELSE 'BRONZE' END AS customer_tier,
            CASE WHEN s.order_count IS NULL THEN 'INACTIVE'
                 WHEN s.order_count >= 15 THEN 'FREQUENT'
                 ELSE 'STANDARD' END AS activity_status,
            date_diff('day', s.first_order_date, s.last_order_date)
                AS tenure_days,
            DATE '{AS_OF}' AS effective_start_date,
            CAST(NULL AS DATE) AS effective_end_date,
            TRUE AS is_current
        FROM customer c
        LEFT JOIN s ON c.c_custkey = s.o_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    "dim_part": f"""
        SELECT
            {_sk_sql("p_partkey", "p_brand")} AS part_sk,
            p_partkey AS part_id,
            trim(p_name, ' ') AS part_name,
            upper(trim(p_brand, ' ')) AS brand,
            upper(trim(p_type, ' ')) AS part_type,
            p_size AS part_size,
            p_retailprice AS retail_price,
            CASE WHEN upper(trim(p_type, ' ')) IN ('PROMO','ECONOMY') THEN 'VALUE'
                 WHEN upper(trim(p_type, ' ')) IN ('STANDARD','MEDIUM') THEN 'CORE'
                 WHEN upper(trim(p_type, ' ')) IN ('LARGE','SMALL') THEN 'SPECIALTY'
                 ELSE 'UNKNOWN' END AS type_tier,
            CASE WHEN p_size <= 10 THEN 'COMPACT'
                 WHEN p_size <= 25 THEN 'MID'
                 WHEN p_size <= 40 THEN 'LARGE'
                 ELSE 'OVERSIZE' END AS size_tier,
            CASE WHEN p_retailprice < 500 THEN 'BUDGET'
                 WHEN p_retailprice < 1200 THEN 'STANDARD'
                 ELSE 'PREMIUM' END AS price_band,
            p_retailprice > 1500 AS is_premium
        FROM part
    """,
    "dim_priority": f"""
        SELECT
            {_sk_sql("priority_code")} AS priority_sk,
            priority_code,
            TRY_CAST(string_split(priority_code, '-')[1] AS INTEGER)
                AS priority_rank,
            CASE priority_code
                 WHEN '1-URGENT' THEN 'Expedite immediately'
                 WHEN '2-HIGH' THEN 'Expedite within 24 hours'
                 WHEN '3-MEDIUM' THEN 'Standard handling'
                 WHEN '4-NOT SPECIFIED' THEN 'No SLA specified'
                 WHEN '5-LOW' THEN 'Deferred handling'
                 ELSE 'Unknown' END AS priority_name,
            priority_code IN ('1-URGENT','2-HIGH') AS is_expedited
        FROM (SELECT DISTINCT upper(trim(o_orderpriority, ' ')) AS priority_code
              FROM orders)
    """,
    "dim_date": f"""
        SELECT
            {_sk_sql("date_key")} AS date_sk,
            date_key,
            year(date_key) AS year,
            quarter(date_key) AS quarter,
            month(date_key) AS month,
            day(date_key) AS day_of_month,
            dayofweek(date_key) + 1 AS day_of_week,
            dayofyear(date_key) AS day_of_year,
            strftime(date_key, '%Y-%m') AS year_month,
            monthname(date_key) AS month_name,
            dayname(date_key) AS day_name,
            dayofweek(date_key) IN (0, 6) AS is_weekend,
            month(date_key) BETWEEN 6 AND 11 AS is_hurricane_season,
            month(date_key) BETWEEN 3 AND 5 AS is_tornado_season,
            month(date_key) IN (12, 1, 2) AS is_winter_season
        FROM (SELECT unnest(generate_series(DATE '1995-01-01',
                                            DATE '2001-12-31',
                                            INTERVAL 1 DAY))::DATE AS date_key)
    """,
}
