"""Event-stream analytics (batch expressions of the streaming operators).

The reference's only streaming use is ingestion (SURVEY §2.9: Auto Loader +
checkpoint, no watermarks/windows). The engine adds the standard Spark
event-time operators over the driver's `events` table; the same expressions
run under Structured Streaming in ``redshift_to_lakehouse_migration_spark.streaming``
(readStream + withWatermark), which shares this logic.

JSON scalar functions (absent from the reference, §2.8) are exercised on the
`props` JSON-string column.

Semantics notes for oracle parity:
- tumbling windows: ``F.window(ts, '1 hour')`` aligns to the epoch, identical
  to ``date_trunc('hour', ts)`` for hour grain.
- session windows: Spark merges events whose gap is strictly < the timeout
  (half-open [ts, ts+gap) windows); the SQL twin marks a new session when
  ``ts - prev_ts >= 30 minutes``. Session end = last event + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import count_if, davg, davg_sql, dsum, dsum_sql
from ..tables import load

SESSION_GAP_MIN = 30


def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per event type (ST-extension; the
    streaming twin adds withWatermark over the same expression)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            dsum("value").alias("total_value"),
            davg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "event_count", "unique_users",
            "total_value", "avg_value",
        )
    )


def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via
    ``F.session_window`` — the engine's stateful-session capability."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("s"),
            F.col("user_id"),
        )
        .agg(
            F.count("*").alias("event_count"),
            dsum("value").alias("session_value"),
            count_if(F.col("event_type") == "purchase")
                .alias("purchase_count"),
        )
        .select(
            F.col("user_id"),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "event_count", "session_value", "purchase_count",
        )
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the props column (get_json_object) with a
    bucketed aggregate on the extracted value."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select(F.col("event_type"), k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"),
             F.min("k").alias("min_k"),
             F.max("k").alias("max_k"))
    )


def user_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-day conditional counts (pivot-style A2 over event time)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.col("user_id"),
            F.col("ts").cast("date").alias("activity_date"),
        )
        .agg(
            F.count("*").alias("event_count"),
            count_if(F.col("event_type") == "click").alias("clicks"),
            count_if(F.col("event_type") == "view").alias("views"),
            count_if(F.col("event_type") == "purchase").alias("purchases"),
            count_if(F.col("event_type") == "error").alias("errors"),
            dsum("value").alias("total_value"),
        )
    )


QUERIES = {
    "events_hourly_by_type": events_hourly_by_type,
    "events_sessionized": events_sessionized,
    "events_json_props": events_json_props,
    "user_daily_activity": user_daily_activity,
}


def _cif(cond: str) -> str:
    return f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"


ORACLES = {
    "events_hourly_by_type": f"""
        SELECT
            date_trunc('hour', ts) AS window_start,
            date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
            event_type,
            COUNT(*) AS event_count,
            COUNT(DISTINCT user_id) AS unique_users,
            {dsum_sql("value")} AS total_value,
            {davg_sql("value")} AS avg_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "events_sessionized": f"""
        WITH flagged AS (
            SELECT *,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL {SESSION_GAP_MIN} MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ), numbered AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT
            user_id,
            MIN(ts) AS session_start,
            MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
            COUNT(*) AS event_count,
            {dsum_sql("value")} AS session_value,
            {_cif("event_type = 'purchase'")} AS purchase_count
        FROM numbered
        GROUP BY user_id, session_id
    """,
    "events_json_props": """
        SELECT event_type, k % 10 AS k_bucket, COUNT(*) AS n,
               MIN(k) AS min_k, MAX(k) AS max_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events)
        WHERE k IS NOT NULL
        GROUP BY event_type, k % 10
    """,
    "user_daily_activity": f"""
        SELECT
            user_id,
            CAST(ts AS DATE) AS activity_date,
            COUNT(*) AS event_count,
            {_cif("event_type = 'click'")} AS clicks,
            {_cif("event_type = 'view'")} AS views,
            {_cif("event_type = 'purchase'")} AS purchases,
            {_cif("event_type = 'error'")} AS errors,
            {dsum_sql("value")} AS total_value
        FROM events
        GROUP BY 1, 2
    """,
}


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length / 30 min slide): every event counts in
    exactly 2 windows; epoch-aligned identically in Spark and the oracle."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                  F.col("event_type"))
        .agg(F.count("*").alias("event_count"),
             dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "event_count", "total_value")
    )


QUERIES["events_sliding_windows"] = events_sliding_windows

ORACLES["events_sliding_windows"] = f"""
    SELECT
        ws AS window_start,
        ws + INTERVAL 1 HOUR AS window_end,
        event_type,
        COUNT(*) AS event_count,
        {dsum_sql("value")} AS total_value
    FROM (
        SELECT *, unnest([
            time_bucket(INTERVAL '30 minutes', ts),
            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE
        ]) AS ws
        FROM events
    )
    GROUP BY 1, 2, 3
"""


def events_salted_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage (salted) aggregate over the low-cardinality
    ``event_type`` key — the hot-key pattern at 100 TB. The oracle is the
    plain GROUP BY, proving the salted plan is semantics-identical
    (decimal sums keep it order-independent)."""
    from ..skew import salted_groupby
    e = load(spark, sf_dir, "events")
    raw = salted_groupby(
        e, ["event_type"], 32,
        event_count=("*", "count"),
        total_value=(F.col("value").cast("decimal(24,2)"), "sum"),
        min_value=("value", "min"),
        max_value=("value", "max"),
    )
    return raw.select(
        "event_type",
        "event_count",
        F.col("total_value").cast("double").alias("total_value"),
        (F.col("total_value").cast("double") / F.col("event_count"))
        .alias("avg_value"),
        "min_value", "max_value",
    ).orderBy("event_type")


QUERIES["events_salted_type_totals"] = events_salted_type_totals

ORACLES["events_salted_type_totals"] = f"""
    SELECT
        event_type,
        COUNT(*) AS event_count,
        {dsum_sql("value")} AS total_value,
        {dsum_sql("value")} / COUNT(*) AS avg_value,
        MIN(value) AS min_value,
        MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""
