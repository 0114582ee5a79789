"""Watermarked event-time aggregation (engine additions beyond the
reference, which has ingestion-only streaming — SURVEY §2.9 note).

These share expression logic with the batch twins in
``queries/events.py`` — including `dsum` for the value sums, so the
stream and batch forms agree bit-for-bit under any partial-aggregate
ordering (a plain double `F.sum` would drift in low-order bits); under streaming they add watermarks for state
eviction (late data beyond the watermark is dropped, state is bounded —
the property that keeps a 100 TB/day stream's state finite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dsum


def hourly_event_counts(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type. ``events`` may be
    a streaming DataFrame (readStream) or batch (same plan either way)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("event_count"),
             dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "event_count", "total_value")
    )


def sliding_value_sums(events: DataFrame, watermark: str = "2 hours"
                       ) -> DataFrame:
    """Sliding windows (1 h length, 15 min slide) — each event contributes
    to 4 windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                 F.col("event_type"))
        .agg(F.count("*").alias("event_count"),
             dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "event_count", "total_value")
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes",
                  watermark: str = "2 hours") -> DataFrame:
    """Stateful session windows per user (`F.session_window`); under
    streaming this is the merging-session-state operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count("*").alias("event_count"),
             dsum("value").alias("session_value"))
        .select("user_id",
                F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"),
                "event_count", "session_value")
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame,
                    on: str) -> DataFrame:
    """Stream-static enrichment: join a (possibly streaming) event frame
    against a static dimension. The dim side broadcasts, so each
    micro-batch joins map-side with no shuffle and no streaming state —
    the standard shape for attaching user/customer attributes at 100
    TB/day (state-free, unlike a stream-stream join)."""
    from pyspark.sql.functions import broadcast
    return events.join(broadcast(dim), on, "left")
