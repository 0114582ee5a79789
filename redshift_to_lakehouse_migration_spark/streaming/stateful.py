"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in windowed aggregation can't express per-key state that depends on
event ordering across micro-batches — e.g. "largest gap between
consecutive events per user", which needs the previous batch's last
timestamp. This is the Arrow-batched stateful path the engine uses when
``groupBy().agg()`` + watermark genuinely can't express the semantics
(the escalation order SURVEY §7.0 prescribes: built-ins → Pandas-UDF
state → never row-at-a-time).

State is one tuple per user — bounded by key cardinality, not stream
length, so a 100 TB/day stream holds state proportional to its user
population only. Pair with a state-store provider (RocksDB at scale) and
``GroupStateTimeout`` eviction for unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, event_count bigint, total_value double, "
                 "max_gap_seconds double")
STATE_SCHEMA = ("event_count bigint, total_value double, "
                "last_ts_epoch double, max_gap_seconds double")


def _update_user_stats(key: tuple, pdfs: Iterable[pd.DataFrame],
                       state: GroupState) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch into (count, total, last_ts, max_gap) state.

    The group's rows arrive as MULTIPLE Arrow chunks in arbitrary order
    (chunking is by arrow.maxRecordsPerBatch, not by time), so the whole
    micro-batch is concatenated and sorted ONCE before computing gaps —
    a per-chunk sort would corrupt last_ts/max_gap whenever a group spans
    chunks. Memory is one group's slice of one micro-batch (bounded by
    trigger sizing, the standard applyInPandasWithState envelope).

    The cross-batch boundary gap compares against the stored last
    timestamp — the piece no stateless window can see; last_ts is kept
    MONOTONE (a replayed/late batch older than stored state can neither
    move it backwards nor mint a negative gap).
    """
    count, total, last_ts, max_gap = (
        state.get if state.exists else (0, 0.0, None, 0.0))
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if chunks:
        pdf = (pd.concat(chunks, ignore_index=True) if len(chunks) > 1
               else chunks[0]).sort_values("ts")
        epochs = pdf["ts"].astype("int64") / 1e9
        gaps = epochs.diff()                       # intra-batch gaps
        if last_ts is not None:
            boundary = epochs.iloc[0] - last_ts    # cross-batch gap
            if boundary >= 0:                      # late replay: no gap
                max_gap = max(max_gap, boundary)
        if len(gaps.dropna()):
            max_gap = max(max_gap, float(gaps.max()))
        count += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        last_epoch = float(epochs.iloc[-1])
        last_ts = last_epoch if last_ts is None else max(last_ts, last_epoch)
    state.update((count, total, last_ts, max_gap))
    yield pd.DataFrame({
        "user_id": [key[0]], "event_count": [count],
        "total_value": [total], "max_gap_seconds": [max_gap],
    })


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, total value, max inter-event gap) over a
    streaming DataFrame; emits the updated row for each user seen in the
    micro-batch (`update` output mode).

    Only the three columns the state function reads cross the state
    shuffle and the Arrow boundary — `applyInPandasWithState` is opaque
    to Catalyst, so without the explicit projection every input column
    (including the `props` JSON payload) would be shuffled to the state
    partitioning and serialized to Python per micro-batch."""
    return events.select("user_id", "ts", "value") \
        .groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
