"""Governance / audit-log queries.

Re-expresses the reference's audit suite (`governance/audit_queries.sql:9-70`
— table-access audit and anomalous-access top-k over a trailing 7-day
window) against the driver's `events` table, treated as an access-audit log:
``user_id`` is the principal, ``event_type`` the action, ``props.$.k`` the
accessed object (table) id, ``ts`` the access time.

Scale notes: every query is one hash aggregate over the log plus, where a
global scalar is needed (log high-water mark, mean access count), a
broadcast of a one-row aggregate — no window over an unpartitioned frame,
no driver-side collect. At 100 TB the log scan dominates and each query is
a single shuffle on its group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import utc_ntz
from ..tables import load


def _audit_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → audit-log projection (principal, action, object, ts)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").alias("principal_id"),
        F.col("event_type").alias("action"),
        # try_cast: raw-edge JSON scalar — a non-integer object id in the
        # log yields a NULL object, not a job abort (§22 discipline)
        F.get_json_object("props", "$.k").try_cast("int").alias("object_id"),
        F.col("ts"),
    ).filter(F.col("principal_id").isNotNull() & F.col("ts").isNotNull())


def audit_object_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-object access audit: who touched which object how often
    (reference `governance/audit_queries.sql:9-28`). One hash aggregate."""
    log = _audit_log(spark, sf_dir)
    return utc_ntz(
        log.groupBy("object_id", "action")
        .agg(
            F.count("*").alias("access_count"),
            F.countDistinct("principal_id").alias("distinct_principals"),
            F.min("ts").alias("first_access_ts"),
            F.max("ts").alias("last_access_ts"),
        )
        .orderBy("object_id", "action")
    )


def audit_principal_last7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-principal activity over the trailing 7 days of the log
    (reference `governance/audit_queries.sql:31-49`). The high-water mark
    is a one-row aggregate broadcast against the log — not a global
    window — so the plan is scan → broadcast-filter → one hash aggregate."""
    log = _audit_log(spark, sf_dir)
    hwm = log.agg(F.max("ts").alias("max_ts"))
    return utc_ntz(
        log.crossJoin(F.broadcast(hwm))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 7 DAYS"))
        .groupBy("principal_id")
        .agg(
            F.count("*").alias("actions_7d"),
            F.countDistinct("object_id").alias("objects_7d"),
            F.sum(F.when(F.col("action") == "error", 1).otherwise(0))
            .cast("long").alias("errors_7d"),
            F.max("ts").alias("last_seen_ts"),
        )
        .orderBy("principal_id")
    )


def audit_anomalous_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous-access top-k (reference `governance/audit_queries.sql:52-70`):
    principals whose trailing-7-day action count exceeds 2× the mean
    per-principal count. Integer-exact anomaly gate (cnt * n_principals >
    2 * total_actions) so borderline principals can't flip between engines."""
    log = _audit_log(spark, sf_dir)
    hwm = log.agg(F.max("ts").alias("max_ts"))
    recent = (
        log.crossJoin(F.broadcast(hwm))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    per_principal = recent.groupBy("principal_id").agg(
        F.count("*").alias("actions_7d"),
        F.countDistinct("object_id").alias("objects_7d"),
    )
    totals = per_principal.agg(
        F.sum("actions_7d").alias("total_actions"),
        F.count("*").alias("n_principals"),
    )
    return (
        per_principal.crossJoin(F.broadcast(totals))
        .filter(F.col("actions_7d") * F.col("n_principals")
                > 2 * F.col("total_actions"))
        .select(
            "principal_id", "actions_7d", "objects_7d",
            (F.col("actions_7d") * F.col("n_principals"))
            .alias("weighted_actions"),
            (2 * F.col("total_actions")).alias("threshold"),
        )
        .orderBy(F.col("actions_7d").desc(), F.col("principal_id"))
        .limit(20)
    )


def masked_dim_customer_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secure masked VIEW over the customer dim — the registered twin of
    `v_dim_policy_masked` (`governance/access_controls.sql:76-105`): the
    full gold dim goes through ``create_masked_view`` (SQL mask functions +
    CREATE VIEW, role flag off) and the consumer reads the VIEW, not the
    base table. PII (customer_name) is masked; everything else passes
    through unchanged. Plan cost = the dim build; masking is one
    expression layer on top, no extra shuffle."""
    from ..masking import create_masked_view
    from .dims import dim_customer
    dim = dim_customer(spark, sf_dir)
    create_masked_view(spark, dim, "v_dim_customer_masked",
                       name_cols=("customer_name",), unmasked=False)
    return spark.sql("SELECT * FROM v_dim_customer_masked") \
        .orderBy("customer_id")


QUERIES = {
    "audit_object_access": audit_object_access,
    "audit_principal_last7d": audit_principal_last7d,
    "audit_anomalous_access": audit_anomalous_access,
    "masked_dim_customer_view": masked_dim_customer_view,
}

# Exact twin of get_json_object + try_cast(int) — same guard stack as
# the events_json_props oracle (json_valid for corrupt docs, integral
# regex because DuckDB TRY_CAST rounds '2.5'), proven on the hostile
# random-db differential. On the driver's uniformly well-formed
# {"k": int} props the guards are no-ops.
_LOG = """
    SELECT user_id AS principal_id,
           event_type AS action,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                AND regexp_matches(
                    trim(json_extract_string(props, '$.k'),
                         ' \t\n\r' || chr(11) || chr(12)),
                    '^[+-]?[0-9]+$')
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS object_id,
           ts
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
"""

ORACLES = {
    "audit_object_access": f"""
        WITH log AS ({_LOG})
        SELECT object_id, action,
               COUNT(*) AS access_count,
               COUNT(DISTINCT principal_id) AS distinct_principals,
               MIN(ts) AS first_access_ts,
               MAX(ts) AS last_access_ts
        FROM log
        GROUP BY object_id, action
        ORDER BY object_id, action
    """,
    "audit_principal_last7d": f"""
        WITH log AS ({_LOG}),
        hwm AS (SELECT MAX(ts) AS max_ts FROM log)
        SELECT principal_id,
               COUNT(*) AS actions_7d,
               COUNT(DISTINCT object_id) AS objects_7d,
               CAST(SUM(CASE WHEN action = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors_7d,
               MAX(ts) AS last_seen_ts
        FROM log, hwm
        WHERE ts >= max_ts - INTERVAL 7 DAY
        GROUP BY principal_id
        ORDER BY principal_id
    """,
    "audit_anomalous_access": f"""
        WITH log AS ({_LOG}),
        hwm AS (SELECT MAX(ts) AS max_ts FROM log),
        recent AS (
            SELECT log.* FROM log, hwm WHERE ts >= max_ts - INTERVAL 7 DAY
        ),
        per_principal AS (
            SELECT principal_id, COUNT(*) AS actions_7d,
                   COUNT(DISTINCT object_id) AS objects_7d
            FROM recent GROUP BY principal_id
        ),
        totals AS (
            SELECT SUM(actions_7d) AS total_actions,
                   COUNT(*) AS n_principals
            FROM per_principal
        )
        SELECT principal_id, actions_7d, objects_7d,
               actions_7d * n_principals AS weighted_actions,
               CAST(2 * total_actions AS BIGINT) AS threshold
        FROM per_principal, totals
        WHERE actions_7d * n_principals > 2 * total_actions
        ORDER BY actions_7d DESC, principal_id
        LIMIT 20
    """,
}

# The masked view replays the dim_customer oracle (already driver-green)
# with the mask_name twin applied to the one PII column.
from .dims import ORACLES as _DIM_ORACLES  # noqa: E402

ORACLES["masked_dim_customer_view"] = f"""
    WITH dim AS ({_DIM_ORACLES["dim_customer"]})
    SELECT customer_sk, customer_id,
           CASE WHEN customer_name IS NULL OR length(customer_name) = 0
                THEN NULL
                ELSE concat(substr(customer_name, 1, 1),
                            repeat('*', greatest(length(customer_name) - 1,
                                                 0)))
           END AS customer_name,
           nation_name, market_segment, account_balance, order_count,
           fulfilled_total, open_total, urgent_order_count,
           first_order_date, last_order_date, avg_order_value,
           customer_tier, activity_status, tenure_days,
           effective_start_date, effective_end_date, is_current
    FROM dim
    ORDER BY customer_id
"""
