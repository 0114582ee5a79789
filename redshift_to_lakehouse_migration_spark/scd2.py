"""Slowly-changing dimension Type 2 (SURVEY §2.3 J6 / §2.12).

The reference implements SCD2 with Delta ``MERGE`` (`gold/dim_policy.py:98-148`:
match on key AND is_current, close the old version when any tracked column
changed, insert the new version). This module provides:

- ``scd2_merge``: the pure-Spark equivalent — changed-row detection join →
  close-old ∪ keep-unchanged ∪ insert-new, returned as a new DataFrame the
  caller overwrites with. Works on plain parquet; no Delta required.
  (On a Delta deployment the same semantics map 1:1 onto
  ``DeltaTable.merge`` exactly as the reference writes it; this repo ships
  only the executable pure-Spark path — delta-spark is not available in
  the test environment, and untestable code stays out of the tree.)
- ``scd2_from_history``: rebuild a full version history from an event log
  with window functions (the standard Spark expression the reference lacks,
  SURVEY §2.5).

Correctness beyond the reference (SURVEY §7.3 risk 4): when ``order_col``
is provided, updates are deduped to the latest row per key before merging,
so a batch containing several updates for one key cannot produce
overlapping versions. ``order_col=None`` is the caller's assertion that
the batch is already ≤1 row per key (see :func:`scd2_merge`).
The reference hardcodes ``current_date()``; we take ``as_of`` as a parameter
so runs are reproducible.

Scale: one shuffle on the business key for the dedup window + one for the
changed-row join; history rows pass through untouched (no rewrite of closed
versions — at 100 TB the dim history never re-shuffles).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

START, END, CURRENT = ("effective_start_date", "effective_end_date",
                       "is_current")


def init_scd2(snapshot: DataFrame, as_of: str) -> DataFrame:
    """Open an initial SCD2 table from a snapshot (all rows current)."""
    return (
        snapshot
        .withColumn(START, F.lit(as_of).cast("date"))
        .withColumn(END, F.lit(None).cast("date"))
        .withColumn(CURRENT, F.lit(True))
    )


def _latest_per_key(updates: DataFrame, key_cols: list[str],
                    order_col: str | None) -> DataFrame:
    if order_col is None:
        return updates
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def _any_changed(tracked_cols: list[str]) -> F.Column:
    """NULL-safe 'any tracked column differs' (`gold/dim_policy.py:117-127`
    builds the same OR-of-inequalities condition)."""
    return reduce(
        lambda a, b: a | b,
        [~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
         for c in tracked_cols],
    )


def scd2_merge(dim: DataFrame, updates: DataFrame, key_cols: list[str],
               tracked_cols: list[str], as_of: str,
               order_col: str | None = None) -> DataFrame:
    """Pure-Spark SCD2 merge. ``dim`` must carry the SCD2 columns
    (see :func:`init_scd2`); ``updates`` carries key + payload columns.

    Returns the full new dimension table:
    history ∪ still-current-unchanged ∪ closed-old ∪ new-versions ∪ brand-new.

    ``order_col=None`` asserts the CALLER guarantees at most one update
    row per key (e.g. a pre-deduped CDC feed); with several undeduped
    updates for one key and no order column there is no defined "latest"
    and the merge would insert overlapping current versions — pass
    ``order_col`` whenever the batch can carry multiple updates per key.

    Every key routing join is NULL-SAFE (eqNullSafe), matching the
    change-detection join: a NULL-valued business key is a real key value
    here, not a non-match — plain equality would leave its old row open
    forever while re-inserting a second current row.
    """
    payload_cols = [c for c in dim.columns if c not in (START, END, CURRENT)]
    upd = _latest_per_key(updates, key_cols, order_col).select(payload_cols)

    def route(left: DataFrame, right: DataFrame, how: str) -> DataFrame:
        """Null-safe semi/anti join on the business key."""
        cond = reduce(
            lambda a, b: a & b,
            [left[k].eqNullSafe(right[k]) for k in key_cols])
        return left.join(right, cond, how)

    history = dim.filter(~F.col(CURRENT))
    current = dim.filter(F.col(CURRENT))

    cur = current.alias("cur")
    u = upd.alias("upd")
    key_cond = reduce(
        lambda a, b: a & b,
        [F.col(f"cur.{k}").eqNullSafe(F.col(f"upd.{k}")) for k in key_cols])

    changed_keys = (
        cur.join(u, key_cond, "inner")
        .filter(_any_changed(tracked_cols))
        .select(*[F.col(f"cur.{k}").alias(k) for k in key_cols])
    )

    closed = (
        route(current, changed_keys, "left_semi")
        .withColumn(END, F.lit(as_of).cast("date"))
        .withColumn(CURRENT, F.lit(False))
    )
    unchanged = route(current, changed_keys, "left_anti")

    new_versions = route(upd, changed_keys, "left_semi")
    current_keys = current.select(*key_cols)
    brand_new = route(upd, current_keys, "left_anti")
    inserts = init_scd2(new_versions.unionByName(brand_new), as_of)

    return (
        history
        .unionByName(unchanged)
        .unionByName(closed)
        .unionByName(inserts.select(*history.columns))
    )


def scd2_from_history(events: DataFrame, key_cols: list[str],
                      order_col: str) -> DataFrame:
    """Rebuild the full SCD2 table from an append-only change log in one
    window pass: version intervals via lead(), open-ended current rows."""
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col))
    nxt = F.lead(F.col(order_col).cast("date")).over(w)
    return (
        events
        .withColumn(START, F.col(order_col).cast("date"))
        .withColumn(END, nxt)
        .withColumn(CURRENT, nxt.isNull())
    )
