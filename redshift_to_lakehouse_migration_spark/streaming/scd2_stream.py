"""Streaming SCD2: incremental dimension maintenance from a change stream.

The reference's incremental mode runs Delta MERGE per scheduled batch
(`gold/dim_policy.py:98-148`); here the same semantics ride Structured
Streaming via ``foreachBatch`` — each micro-batch of change rows merges
into the persisted dimension with :func:`scd2.scd2_merge`, then the
updated table atomically replaces the old (write-aside + swap, since the
pure-parquet path cannot rewrite in place while reading).

Exactly-once: the stream checkpoint fences micro-batch replays, and the
merge itself is idempotent for replayed batches (a replay carries no
tracked-column change against the already-merged dim, so it produces the
identical table).

Scale: per micro-batch cost is the scd2_merge cost — one shuffle on the
business key over (dim ∪ batch); closed history passes through. For very
large dims, partition the dim by key range and merge only touched
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..scd2 import scd2_merge


def stream_scd2(spark: SparkSession, changes: DataFrame, dim_path: str,
                key_cols: list[str], tracked_cols: list[str],
                as_of: str, checkpoint: str,
                order_col: str | None = None) -> None:
    """Drain ``changes`` (a streaming DataFrame) into the SCD2 dimension
    parquet at ``dim_path`` with an availableNow one-shot trigger."""
    import shutil

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os
        old = dim_path.rstrip("/") + "__old"
        if os.path.exists(old):
            # A prior batch was hard-killed mid-swap: the dim lives intact
            # at `__old` (and possibly nothing at dim_path).  Fail the
            # stream loudly with the recovery step — proceeding would
            # either nest the live table inside the stale dir or merge
            # against a missing path; after manual recovery the
            # checkpoint replays this batch deterministically.
            raise RuntimeError(
                f"stream_scd2: stale swap residue at {old} (a prior "
                f"micro-batch was interrupted mid-swap). Recover "
                f"manually: if {dim_path} is missing, rename {old} back "
                f"to it; if {dim_path} is current, delete {old}. The "
                f"checkpoint will replay this batch after recovery.")
        if batch_df.isEmpty():
            return
        dim = spark.read.parquet(dim_path)
        merged = scd2_merge(dim, batch_df, key_cols, tracked_cols,
                            as_of, order_col=order_col)
        tmp = dim_path.rstrip("/") + f"__b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        # swap with crash-restore (same discipline as compact_parquet):
        # if the second move fails, restore the original so a dataset
        # always exists at dim_path — otherwise the checkpointed replay
        # of this batch would fail forever on a missing read path.
        # Local-filesystem swap only (shutil); on object storage the
        # equivalent is the Delta/Iceberg transactional commit.  A hard
        # kill between the two moves leaves the dim intact at `old` —
        # the guard at the top of this function makes the replay fail
        # loudly with the recovery step instead of nesting directories.
        shutil.move(dim_path, old)
        try:
            shutil.move(tmp, dim_path)
        except BaseException:
            shutil.move(old, dim_path)
            raise
        shutil.rmtree(old)

    (changes.writeStream
     .foreachBatch(merge_batch)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())
