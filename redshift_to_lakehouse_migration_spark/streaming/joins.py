"""Stream-stream joins with watermark-bounded state.

The stateful streaming operator the stream-static path (`windows.py:
enrich_with_dim`) cannot express: correlating two live streams (click →
purchase attribution) inside an event-time window. Both sides carry
watermarks AND the join condition carries a time interval, so Spark can
expire state: each side buffers only rows younger than
watermark + interval — bounded per key-time bucket regardless of stream
length, which is what makes this run indefinitely at cluster scale.

Without the interval bound the state store grows without limit; this
module makes the bound part of the operator's signature rather than a
caller convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(events: DataFrame, keys: list[str], ts_col: str,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once dedup: at-least-once sources (Kafka
    redeliveries, retried file lands) emit the same event twice across
    micro-batches; `dropDuplicatesWithinWatermark` keeps state only for
    ``watermark`` of event time, so the state store stays bounded while
    duplicates inside the redelivery horizon collapse to one row. Batch
    frames fall back to plain dropDuplicates (same key semantics)."""
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str, right_ts: str,
                  within: str = "1 hour",
                  watermark: str = "2 hours",
                  how: str = "inner") -> DataFrame:
    """Join two (streaming) frames on ``key`` where the right event lands
    in ``[left_ts, left_ts + within]``. Columns are prefixed ``l_``/``r_``
    to keep both timestamps addressable in the result.

    Works identically on batch frames (watermarks are a no-op there),
    which is how the test proves the streaming result equals the batch
    join — the Structured Streaming unification this engine relies on.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    l = lw.select(F.col(key).alias("l_key"),
                  F.col(left_ts).alias("l_ts"),
                  *[F.col(c).alias(f"l_{c}") for c in left.columns
                    if c not in (key, left_ts)])
    r = rw.select(F.col(key).alias("r_key"),
                  F.col(right_ts).alias("r_ts"),
                  *[F.col(c).alias(f"r_{c}") for c in right.columns
                    if c not in (key, right_ts)])
    cond = ((F.col("l_key") == F.col("r_key"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")))
    return l.join(r, cond, how)
