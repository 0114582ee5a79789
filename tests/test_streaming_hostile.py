"""Stream≡batch equivalence on HOSTILE events.

`test_streaming.py` proves the unified-semantics contract on the clean
driver events; the r6 NULL-event-time pin proves one hostile row class.
This module runs the full hostility envelope of the relational
differential's event generator — NULL ts / user_id / event_type / value,
corrupt and typed-wrong JSON props, exact (user, ts) ties — through the
REAL streaming path (file source → watermark → availableNow → memory
sink) for all three window operators, and requires bit-exact equality
with the batch plan, dsum money columns included.

This is the streaming twin of the hostile-db differential: a divergence
here means the same expression silently forks between the batch backfill
and the live stream exactly on the rows a 100 TB producer fleet emits
when it misbehaves.
"""

from __future__ import annotations

import random

import pytest

from redshift_to_lakehouse_migration_spark.streaming import windows as sw

from test_oracle_differential_relational import _money
from test_queries_oracle import _norm


def _rows(df_rows):
    return sorted(tuple(_norm(v) for v in r) for r in map(tuple, df_rows))

_TS_POOL = [f"2024-03-0{d} 0{h}:{m:02d}:00"
            for d in (1, 2) for h in (0, 3, 9) for m in (0, 17, 59)]


def _hostile_events(seed: int, n: int = 300):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((
            i,
            None if rng.random() < 0.06 else rng.choice(_TS_POOL),
            None if rng.random() < 0.06 else rng.randrange(12),
            rng.choice(["view", "click", "purchase", "error", None, "odd"]),
            None if rng.random() < 0.06 else _money(rng, -50, 500),
            rng.choice(['{"k": 7}', '{"k": -13}', '{"k": "abc"}',
                        "not json", None]),
        ))
    # exact (user, ts) ties — the session-merge and window-group hazard
    rows += [(9001, _TS_POOL[0], 7, "click", 1.25, None),
             (9002, _TS_POOL[0], 7, "view", -1.25, None),
             (9003, _TS_POOL[0], 7, "purchase", 0.0, None)]
    return rows


@pytest.fixture(scope="module")
def hostile_events(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile_stream")
    df = spark.createDataFrame(
        _hostile_events(20260818),
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
                 "event_type", "value", "props")
    df.coalesce(3).write.parquet(str(d / "events_pq"))
    return df, str(d)


@pytest.mark.parametrize("op,name", [
    (sw.hourly_event_counts, "tumbling"),
    (sw.sliding_value_sums, "sliding"),
    (sw.user_sessions, "session"),
])
def test_hostile_stream_equals_batch(op, name, spark, hostile_events,
                                     tmp_path):
    df, d = hostile_events
    src = spark.readStream.schema(df.schema).parquet(f"{d}/events_pq")
    sink = f"hostile_{name}"
    q = (op(src).writeStream.format("memory").queryName(sink)
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = _rows(spark.sql(f"SELECT * FROM {sink}").collect())
    batch = _rows(op(df).collect())
    assert streamed == batch  # bit-exact, dsum columns included
    assert len(batch) > 0
