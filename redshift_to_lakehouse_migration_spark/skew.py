"""Skew mitigation: salted two-stage aggregation and salted joins.

At 100 TB a handful of hot keys (one event type, one customer) can pin a
single reducer while the rest of the cluster idles. Two standard fixes,
both expressed declaratively so Catalyst still sees one plan:

- **Salted aggregation** (`salted_groupby`): split each hot group across
  ``n_salts`` sub-groups in a first shuffle, then combine the decomposable
  partials in a second, tiny shuffle. Only decomposable aggregates qualify
  (sum/count/min/max, avg = sum÷count); the two-stage plan is
  semantics-identical to the direct groupBy — the oracle-checked
  ``events_salted_type_totals`` query proves it.
- **Salted join** (`salted_join`): replicate the small side once per salt
  so the big side's hot key fans out over ``n_salts`` reducers. Prefer
  ``F.broadcast`` when the small side fits in memory (no shuffle at all);
  salting is for the in-between case. AQE's skew-join split
  (`spark.sql.adaptive.skewJoin`, on in `session.py`) handles the same
  problem adaptively at runtime — these helpers are the explicit form for
  when you know the skew ahead of time.

The salt is `pmod(xxhash64(salt_from..., spark_partition_id()), n_salts)`
— deterministic under task retry (a recomputed partition re-reads the
same rows with the same partition id; F.rand would break exactly-once
sinks on retry), and the partition-id term keeps the split honest on
BYTE-IDENTICAL hot rows (at-least-once redelivery, boilerplate spam),
which a pure content hash would re-collapse onto a single salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggspec import check_decomposable, partial_columns, recombine_columns


def add_salt(df: DataFrame, n_salts: int,
             salt_from: list[str] | None = None,
             col_name: str = "__salt") -> DataFrame:
    """Salt column in [0, n_salts): hash of ``salt_from`` columns
    (default: ALL columns plus the input partition id).

    The partition-id term exists for the mass-duplicate case: a hot key
    whose rows are byte-identical across every column (at-least-once
    redelivery, boilerplate rows) hashes to ONE salt under a pure content
    hash, silently re-concentrating the exact group the salt was meant to
    split. Mixing `spark_partition_id()` spreads those copies across the
    partitions they arrived in.

    Retry-determinism caveat (ADVICE r7): `spark_partition_id()` is
    Catalyst-nondeterministic, so the retry-stability argument (a
    recomputed task re-reads the same rows with the same id — unlike
    F.rand, which re-rolls per attempt) holds only when the UPSTREAM
    partitioning is itself deterministic: a file scan, a hash
    repartition on deterministic keys, or a deterministic transform
    chain.  After a round-robin `repartition(n)` or an AQE replan of an
    indeterminate stage, a recomputed map task can receive different
    rows than the attempt whose shuffle outputs were already fetched;
    Spark handles that case by resubmitting the whole stage
    (indeterminate-stage rollback, SPARK-23207), which keeps results
    consistent but is a heavier recovery than per-task retry.  Callers
    feeding a salted agg from a round-robin repartition who need cheap
    per-task retry should pass an explicit ``salt_from`` instead.
    Residual bound: identical rows WITHIN one input partition still share
    a salt, so the worst straggler is one scan partition's worth of rows
    (~maxPartitionBytes), not the whole hot key.

    An explicit ``salt_from`` trades that coverage for salt values that
    are stable across repartitionings of the same rows."""
    if salt_from is None:
        src = [*(F.col(c) for c in df.columns), F.spark_partition_id()]
    else:
        src = [F.col(c) for c in salt_from]
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*src), F.lit(n_salts)))


def salted_groupby(df: DataFrame, keys: list[str], n_salts: int,
                   **aggs: tuple[str | Column, str]) -> DataFrame:
    """Two-stage skew-safe groupBy.

    ``aggs`` maps output column name → (source column, fn) with fn one of
    ``sum|count|min|max|avg``. Example::

        salted_groupby(events, ["event_type"], 32,
                       event_count=("*", "count"),
                       total_value=("value", "sum"))

    Stage 1 groups on (keys, salt) — hot keys split n_salts ways; stage 2
    groups on keys alone over at most ``n_salts × |groups|`` rows.
    """
    check_decomposable(
        aggs, "is not decomposable; salting would change "
              "semantics (use the direct groupBy for holistic aggs)")

    # avg decomposes into sum + count combined in the final stage
    partial_cols = partial_columns(aggs)
    salted = add_salt(df, n_salts, salt_from=None)
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partial_cols.items()])
    # finalize_avg=True: nothing chains past the second stage; the
    # partial schema lets DECIMAL means land on native-avg dtype
    return stage1.groupBy(*keys).agg(
        *recombine_columns(aggs, finalize_avg=True,
                           partial_schema=stage1.schema))


_SALT_SAFE_JOINS = {"inner", "left", "left_outer", "leftouter",
                    "left_semi", "leftsemi", "semi",
                    "left_anti", "leftanti", "anti"}


def salted_join(large: DataFrame, small: DataFrame, on: list[str],
                n_salts: int, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the large side, explode the small side
    once per salt value, join on (keys, salt). The small side grows
    ``n_salts``× — use only when it is too big to broadcast but far
    smaller than the large side.

    Only large-side-preserving joins are allowed: each large row carries
    exactly one salt, but small rows are replicated per salt, so a
    right/full outer join would emit every unmatched small row
    ``n_salts`` times. Raises ValueError for those."""
    if how.lower().replace("_", "") not in {
            h.replace("_", "") for h in _SALT_SAFE_JOINS}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            f"replicated {n_salts}x, so right/full outer joins would "
            f"duplicate unmatched small-side rows (use a direct join or "
            f"AQE skew handling instead)")
    # salt from ALL columns, not the join keys: rows sharing a hot key must
    # scatter across salts (keys-only hashing would re-collapse them)
    salted_large = add_salt(large, n_salts, salt_from=None)
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(
            F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))))
    out = salted_large.join(exploded_small, [*on, "__salt"], how)
    return out.drop("__salt")
