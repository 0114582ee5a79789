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

from ..functions import count_if, davg, davg_sql, dsum, dsum_sql, utc_ntz
from ..tables import load

SESSION_GAP_MIN = 30


def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per event type (ST-extension; the
    streaming twin adds withWatermark over the same expression)."""
    e = load(spark, sf_dir, "events")
    return utc_ntz(
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
    return utc_ntz(
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
    bucketed aggregate on the extracted value.

    ``try_cast``, not ``cast``: the extracted scalar is raw-edge data, and
    under the engine's ANSI default a single non-integer ``$.k`` in 100 TB
    of props would abort the whole job (CAST_INVALID_INPUT) where Spark 3
    — and this query's declared semantics — treat it as unparseable and
    drop it via the existing ``k IS NOT NULL`` filter. The DuckDB twin
    uses TRY_CAST for the same declared behavior; on well-formed props the
    two forms are value-identical."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
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
        WHERE ts IS NOT NULL  -- F.window drops NULL event-time (pinned
                              -- batch/stream drop parity, CHANGES_r6)
        GROUP BY 1, 2, 3
    """,
    "events_sessionized": f"""
        -- ORDER BY ts, event_id (total order), NOT ORDER BY ts: is_new is
        -- assigned in one window pass and cumulatively summed in ANOTHER,
        -- and with tied ts the two passes need not agree on row order —
        -- DuckDB's parallel window execution then attaches a tied row's
        -- is_new to a DIFFERENT neighbor than the one lag() diffed
        -- against, splitting sessions at the wrong row. Measured: the
        -- ts-only form returned 2 distinct result sets in 60 runs on the
        -- seed-20260817 hostile DB (r10; this was r9's only red gate —
        -- the engine side was correct both times). The tiebreaker column
        -- does not change session SEMANTICS (tied rows always share a
        -- session: their gap is 0), it only pins both passes to one order.
        WITH flagged AS (
            SELECT *,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                             >= INTERVAL {SESSION_GAP_MIN} MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                             IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WHERE ts IS NOT NULL  -- session_window drops NULL event-time
        ), numbered AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
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
                     -- exact twin of get_json_object + try_cast(int):
                     -- json_extract_string ERRORS on malformed JSON where
                     -- get_json_object yields NULL (json_valid guard), and
                     -- DuckDB TRY_CAST rounds '2.5' to 3 where Spark's
                     -- accepts integral strings only (regex guard)
                     -- guard trims the full cast-agreement whitespace set
                     -- (space tab nl cr vt ff): Spark's string->int
                     -- try_cast trims all Java whitespace, and DuckDB's
                     -- int cast itself skips exactly these six, so a
                     -- JSON-escaped "\t5" casts to 5 in BOTH engines --
                     -- the guard must not reject it (ADVICE r6; probed
                     -- char-by-char).  \x1c-\x1f stay pinned-divergent:
                     -- there the CASTS disagree, not the guard.
                     CASE WHEN props IS NOT NULL AND json_valid(props)
                          AND regexp_matches(
                              trim(json_extract_string(props, '$.k'),
                                   ' \t\n\r' || chr(11) || chr(12)),
                              '^[+-]?[0-9]+$')
                          THEN TRY_CAST(json_extract_string(props, '$.k')
                                        AS INTEGER) END AS k
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
    return utc_ntz(
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
        WHERE ts IS NOT NULL  -- F.window drops NULL event-time
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


def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each click event enriched with the user's
    most recent prior-or-simultaneous purchase — the point-in-time
    enrichment operator (union-window form, one shuffle; see asof.py).
    ``tie_break=event_id`` makes the carried payload deterministic when a
    user has two purchases at the identical timestamp (greatest event_id
    wins), mirrored in the oracle's window ordering — without it the
    result would depend on partitioning."""
    from ..asof import asof_join
    e = load(spark, sf_dir, "events")
    clicks = (e.filter(F.col("event_type") == "click")
              .select("event_id", "ts", "user_id",
                      F.col("value").alias("click_value")))
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value",
                         F.col("event_id").alias("purchase_id")))
    out = asof_join(clicks, purchases, by=["user_id"], ts_col="ts",
                    tie_break="purchase_id", prefix="p_")
    return utc_ntz(out.select(
        "event_id", "ts", "user_id", "click_value",
        F.col("p_ts").alias("last_purchase_ts"),
        F.col("p_value").alias("last_purchase_value"),
    ))


QUERIES["events_asof_purchase"] = events_asof_purchase

# window-form oracle (not DuckDB's native ASOF, which has no tie-break):
# greatest (ts, event_id) purchase at-or-before each click, NULLs kept for
# clicks with no prior purchase via the LEFT JOIN + rn=1
ORACLES["events_asof_purchase"] = """
    SELECT event_id, ts, user_id, click_value,
           last_purchase_ts, last_purchase_value
    FROM (
        SELECT c.event_id, c.ts, c.user_id, c.value AS click_value,
               p.ts AS last_purchase_ts, p.value AS last_purchase_value,
               ROW_NUMBER() OVER (
                   PARTITION BY c.event_id
                   ORDER BY p.ts DESC NULLS LAST, p.event_id DESC
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND p.ts <= c.ts
    )
    WHERE rn = 1
"""


def events_error_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: (click, error) pairs for the same user with the
    error in the 2 hours after the click — an interval join executed as an
    equality join on (user, time-bucket), never a per-key nested loop
    (see rangejoin.py). Gap is exact integer microseconds so the DuckDB
    twin hash-matches bit-for-bit."""
    from ..rangejoin import range_join_binned
    e = load(spark, sf_dir, "events")
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    errors = (e.filter(F.col("event_type") == "error")
              .select("user_id", F.col("event_id").alias("error_id"),
                      F.col("ts").alias("error_ts")))
    out = range_join_binned(clicks, errors, by=["user_id"],
                            left_ts="click_ts", right_ts="error_ts",
                            lower=0.0, upper=7200.0)
    return utc_ntz(out.select(
        "user_id", "click_id", "error_id", "click_ts", "error_ts",
        (F.unix_micros("error_ts") - F.unix_micros("click_ts"))
        .alias("gap_us"),
    ))


QUERIES["events_error_after_click"] = events_error_after_click

ORACLES["events_error_after_click"] = """
    SELECT c.user_id, c.event_id AS click_id, e.event_id AS error_id,
           c.ts AS click_ts, e.ts AS error_ts,
           epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id
     AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 120 MINUTE
"""


def events_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly partials rolled up to
    daily WITHOUT rescanning raw events (rollup.py). The oracle is the
    direct daily GROUP BY on raw rows — partial re-aggregation must be
    semantics-identical. Decimal sums keep it order-independent."""
    from ..rollup import finalize, reroll, time_rollup
    e = load(spark, sf_dir, "events")
    spec = {
        "event_count": ("*", "count"),
        "total_value": ("__dec_value", "sum"),
        "min_value": ("value", "min"),
        "max_value": ("value", "max"),
    }
    hourly = time_rollup(
        e.withColumn("__dec_value", F.col("value").cast("decimal(24,2)")),
        "ts", "hour", ["event_type"], spec)
    daily = finalize(
        reroll(hourly, "day", ["event_type"], spec, from_grain="hour"),
        spec)
    # avg finalized in double (dsum/count) to match the davg convention
    return utc_ntz(daily.select(
        F.col("bucket_ts").alias("day"),
        "event_type", "event_count",
        F.col("total_value").cast("double").alias("total_value"),
        "min_value", "max_value",
        (F.col("total_value").cast("double") / F.col("event_count"))
        .alias("avg_value"),
    ).orderBy("day", "event_type"))


QUERIES["events_daily_from_hourly"] = events_daily_from_hourly

ORACLES["events_daily_from_hourly"] = f"""
    SELECT
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        event_type,
        COUNT(*) AS event_count,
        {dsum_sql("value")} AS total_value,
        MIN(value) AS min_value,
        MAX(value) AS max_value,
        {dsum_sql("value")}/COUNT(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def events_daily_unique_users_hll(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Approx-distinct via mergeable HLL sketches: per-day sketches are
    built once, and the whole-month distinct comes from MERGING the daily
    sketches (hll_union_agg) — the continuous-aggregate pattern for
    COUNT(DISTINCT) at 100 TB, where exact distinct would shuffle every
    key. Rows-only correctness check (estimates are engine-specific);
    the unit test bounds the estimate against the exact count."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("user_sketch"),
             F.count("*").alias("n_events"))
    )
    per_day = daily.select(
        "day", "n_events",
        F.hll_sketch_estimate("user_sketch").alias("approx_users"))
    month = (
        daily.groupBy(F.date_trunc("month", F.col("day")).alias("day"))
        .agg(F.sum("n_events").alias("n_events"),
             F.hll_sketch_estimate(F.hll_union_agg("user_sketch"))
             .alias("approx_users"))
    )
    return utc_ntz(per_day.unionByName(month).orderBy("day", "n_events"))


QUERIES["events_daily_unique_users_hll"] = events_daily_unique_users_hll
# no ORACLE: HLL estimates are engine-specific; driver checks rows-only,
# tests/test_queries_oracle.py bounds the estimate vs exact distinct


def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step conversion funnel: signup → first click at-or-after
    the signup → first purchase at-or-after that click. Three equality
    joins on user_id (each a single shuffle on the same key — co-located
    under one partitioning at scale), min-timestamp semantics so each
    step anchors on the earliest qualifying event. Integer basis-point
    conversions (div) keep the output engine-exact."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    signup = (e.filter(F.col("event_type") == "signup")
              .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    click = (
        e.filter(F.col("event_type") == "click").alias("c")
        .join(signup.alias("s"), "user_id")
        .filter(F.col("c.ts") >= F.col("s.signup_ts"))
        .groupBy("user_id").agg(F.min("c.ts").alias("click_ts"))
    )
    purchase = (
        e.filter(F.col("event_type") == "purchase").alias("p")
        .join(click.alias("k"), "user_id")
        .filter(F.col("p.ts") >= F.col("k.click_ts"))
        .groupBy("user_id").agg(F.min("p.ts").alias("purchase_ts"))
    )
    totals = e.agg(F.countDistinct("user_id").alias("users_total"))
    return (
        totals
        .crossJoin(F.broadcast(
            signup.agg(F.count("*").alias("users_signup"))))
        .crossJoin(F.broadcast(
            click.agg(F.count("*").alias("users_click_after_signup"))))
        .crossJoin(F.broadcast(
            purchase.agg(F.count("*").alias("users_purchase_after_click"))))
        .select(
            "users_total", "users_signup", "users_click_after_signup",
            "users_purchase_after_click",
            F.expr("CASE WHEN users_signup > 0 THEN "
                   "users_click_after_signup * 10000 div users_signup "
                   "END").alias("click_conv_bps"),
            F.expr("CASE WHEN users_click_after_signup > 0 THEN "
                   "users_purchase_after_click * 10000 "
                   "div users_click_after_signup END")
            .alias("purchase_conv_bps"),
        )
    )


QUERIES["events_conversion_funnel"] = events_conversion_funnel

ORACLES["events_conversion_funnel"] = """
    WITH signup AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), click AS (
        SELECT e.user_id, MIN(e.ts) AS click_ts
        FROM events e JOIN signup s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts >= s.signup_ts
        GROUP BY e.user_id
    ), purchase AS (
        SELECT e.user_id, MIN(e.ts) AS purchase_ts
        FROM events e JOIN click k ON e.user_id = k.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= k.click_ts
        GROUP BY e.user_id
    )
    SELECT
        (SELECT COUNT(DISTINCT user_id) FROM events) AS users_total,
        (SELECT COUNT(*) FROM signup) AS users_signup,
        (SELECT COUNT(*) FROM click) AS users_click_after_signup,
        (SELECT COUNT(*) FROM purchase) AS users_purchase_after_click,
        CASE WHEN (SELECT COUNT(*) FROM signup) > 0 THEN
            (SELECT COUNT(*) FROM click) * 10000
                // (SELECT COUNT(*) FROM signup) END AS click_conv_bps,
        CASE WHEN (SELECT COUNT(*) FROM click) > 0 THEN
            (SELECT COUNT(*) FROM purchase) * 10000
                // (SELECT COUNT(*) FROM click) END AS purchase_conv_bps
"""


def events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing at scale: `from_json` with an explicit schema
    parses the props document ONCE into a struct (vs per-path
    `get_json_object` re-parsing in `events_json_props`), then aggregates
    by a derived bucket.

    Corrupt-document accounting: PERMISSIVE `from_json` never returns a
    NULL struct for malformed input — it returns a struct of NULL fields —
    so `p IS NULL` undercounts. The reliable signal is the corrupt-record
    column: malformed documents land verbatim in `_corrupt` while valid
    ones leave it NULL. `unparseable` therefore counts rows where props
    exists but failed to parse (the DuckDB oracle's twin predicate is
    `NOT json_valid(props)`).

    The DuckDB twin is the full schema-aware mirror, pinned case-by-case
    (CHANGES_r6, hostile-random-db differential): blank/NULL props →
    NULL struct, never corrupt; valid non-object JSON (`"5"`, `[1]`) and
    objects whose `k` is mistyped (`{"k":"abc"}`, `{"k":2.5}`) or
    overflows INT → k NULL and corrupt; `k` null-or-missing in a valid
    object → clean NULL. An earlier `json_valid`-only oracle silently
    diverged on every schema-violating-but-well-formed document."""
    e = load(spark, sf_dir, "events")
    parsed = e.withColumn(
        "p",
        F.from_json("props", "k INT, _corrupt STRING",
                    {"columnNameOfCorruptRecord": "_corrupt"}))
    return (
        parsed.groupBy((F.col("p.k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n_events"),
             F.min("p.k").alias("min_k"),
             F.max("p.k").alias("max_k"),
             F.sum(F.when(F.col("props").isNotNull()
                          & F.col("p._corrupt").isNotNull(), 1).otherwise(0))
             .cast("long").alias("unparseable"))
        .orderBy(F.col("k_bucket").asc_nulls_first())
    )


QUERIES["events_json_typed"] = events_json_typed

# json_valid guards every extraction: DuckDB's json_extract_string ERRORS
# on malformed JSON rather than returning NULL, so the unguarded form
# can't even run on a corpus with corrupt documents.
ORACLES["events_json_typed"] = """
    WITH typed AS (
        -- exact twin of from_json('k INT') with corrupt-record accounting,
        -- pinned case-by-case (CHANGES_r6: blank/NULL props -> NULL struct,
        -- never corrupt; valid non-object or mistyped/overflowing k ->
        -- corrupt; k null-or-missing in a valid object -> clean NULL)
        SELECT props,
               CASE WHEN props IS NULL
                         OR trim(props, ' \t\n\r') = '' THEN NULL
                    ELSE TRY_CAST(props AS JSON) END AS doc
        FROM events
    ), parsed AS (
        SELECT CASE WHEN json_type(doc) = 'OBJECT'
                    AND json_type(doc, '$.k') IN ('UBIGINT', 'BIGINT')
                    AND TRY_CAST(json_extract(doc, '$.k') AS BIGINT)
                        BETWEEN -2147483648 AND 2147483647
                    THEN CAST(TRY_CAST(json_extract(doc, '$.k') AS BIGINT)
                              AS INTEGER) END AS k,
               CASE WHEN props IS NOT NULL
                    AND trim(props, ' \t\n\r') <> ''
                    AND (doc IS NULL                      -- invalid JSON
                         OR json_type(doc) <> 'OBJECT'    -- valid non-object
                         OR (json_type(doc, '$.k') IS NOT NULL
                             AND json_type(doc, '$.k') <> 'NULL'
                             AND NOT COALESCE(        -- NULL-safe: a
                                 json_type(doc, '$.k')  -- UBIGINT beyond
                                     IN ('UBIGINT', 'BIGINT')  -- BIGINT
                                 AND TRY_CAST(json_extract(doc, '$.k')
                                              AS BIGINT)
                                     BETWEEN -2147483648 AND 2147483647,
                                 FALSE)))
                    THEN 1 ELSE 0 END AS is_corrupt
        FROM typed
    )
    SELECT k % 10 AS k_bucket,
           COUNT(*) AS n_events,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           CAST(SUM(is_corrupt) AS BIGINT) AS unparseable
    FROM parsed
    GROUP BY 1
    ORDER BY k_bucket ASC NULLS FIRST
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen WEEK, distinct
    active users per (cohort week, weeks-since). Week index is exact
    integer arithmetic on epoch days (unix_date div 7) so both engines
    bucket identically; one groupBy for the cohort assignment, one
    equality join back to the log, one distinct-aggregate — all keyed on
    user_id/cohort."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    week_idx = F.expr("unix_date(cast(ts as date)) div 7")
    firsts = (e.groupBy("user_id")
              .agg(F.min(week_idx).alias("cohort_week")))
    return (
        e.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_week"),
            (week_idx - F.col("cohort_week")).alias("weeks_since"))
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


QUERIES["events_retention_cohorts"] = events_retention_cohorts

ORACLES["events_retention_cohorts"] = """
    WITH log AS (
        SELECT user_id,
               (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS week_idx
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(week_idx) AS cohort_week
        FROM log GROUP BY user_id
    )
    SELECT f.cohort_week,
           l.week_idx - f.cohort_week AS weeks_since,
           COUNT(DISTINCT l.user_id) AS active_users
    FROM log l JOIN firsts f ON l.user_id = f.user_id
    GROUP BY f.cohort_week, l.week_idx - f.cohort_week
    ORDER BY cohort_week, weeks_since
"""


def events_rolling_hour_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (the frame type rowsBetween can't express):
    per event, how many of the SAME user's events landed in the preceding
    hour — event-time ordering on integer epoch-microseconds, so the
    frame bound is exact in both engines. One window partition per user."""
    from pyspark.sql import Window as W
    e = load(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts",
                F.unix_micros("ts").alias("ts_us"))
    hour_us = 3_600_000_000
    w = (W.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-hour_us, 0))
    return (
        e.select("event_id", "user_id",
                 F.count("*").over(w).alias("events_last_hour"))
        .orderBy("event_id")
    )


QUERIES["events_rolling_hour_range"] = events_rolling_hour_range

ORACLES["events_rolling_hour_range"] = """
    SELECT event_id, user_id,
           COUNT(*) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS events_last_hour
    FROM events
    ORDER BY event_id
"""


def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical monitoring: flag days whose per-type event count
    exceeds mean + 2 population-stddev for that type. The z-score gate is
    INTEGER-exact — x > mu + 2*sigma  ⇔  (n*x - S) > 0 AND
    (n*x - S)^2 > 4*(n*Q - S^2), with S = sum of counts, Q = sum of
    squared counts — so borderline days can never flip between engines.
    Two hash aggregates (day-counts, then per-type moments broadcast)."""
    e = load(spark, sf_dir, "events")
    daily = (e.groupBy("event_type",
                       F.date_trunc("day", "ts").alias("day"))
             .agg(F.count("*").alias("x")))
    moments = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"))
    dev = F.col("n") * F.col("x") - F.col("s")
    var_term = 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return utc_ntz(
        daily.join(F.broadcast(moments), "event_type")
        .filter((dev > 0) & (dev * dev > var_term))
        .select("event_type", "day", F.col("x").alias("event_count"),
                F.col("s").alias("type_total"),
                F.col("n").alias("n_days"))
        .orderBy("event_type", "day")
    )


QUERIES["events_daily_anomalies"] = events_daily_anomalies

ORACLES["events_daily_anomalies"] = """
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2
    ), moments AS (
        SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x*x) AS q
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.x AS event_count,
           CAST(m.s AS BIGINT) AS type_total, m.n AS n_days
    FROM daily d JOIN moments m ON d.event_type = m.event_type
    WHERE (m.n * d.x - m.s) > 0
      AND (m.n * d.x - m.s) * (m.n * d.x - m.s)
          > 4 * (m.n * m.q - m.s * m.s)
    ORDER BY d.event_type, d.day
"""


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining: top-20 3-step event-type paths across
    per-user daily journeys. Each journey is one ordered array built by a
    single hash aggregate (array_sort over (ts, event_id) structs — the
    deterministic order), trigrams come from a map-side transform (no
    second explode-shuffle of raw events), and one final count ranks the
    paths. The funnel-discovery complement of `events_conversion_funnel`."""
    e = load(spark, sf_dir, "events")
    journeys = (
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.array_sort(F.collect_list(
            F.struct("ts", "event_id", "event_type"))).alias("seq"))
        .select(F.transform("seq", lambda s: s["event_type"])
                .alias("types"))
    )
    tri = F.transform(
        F.sequence(F.lit(1), F.size("types") - 2),
        lambda i: F.concat_ws(">", F.slice(F.col("types"), i, 3)))
    return (
        journeys.filter(F.size("types") >= 3)
        .select(F.explode(tri).alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n_journeys"))
        .orderBy(F.col("n_journeys").desc(), F.col("path"))
        .limit(20)
    )


QUERIES["event_path_trigrams"] = event_path_trigrams

ORACLES["event_path_trigrams"] = """
    WITH journeys AS (
        SELECT list(event_type ORDER BY ts, event_id) AS types
        FROM events
        GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT path, COUNT(*) AS n_journeys
    FROM (
        SELECT unnest(list_transform(
                   generate_series(1, len(types) - 2),
                   i -> array_to_string(types[i:i+2], '>'))) AS path
        FROM journeys
        WHERE len(types) >= 3
    )
    GROUP BY path
    ORDER BY n_journeys DESC, path
    LIMIT 20
"""
