"""As-of (point-in-time) join — an operator Spark's join zoo lacks.

Semantics: for every left row, attach the single right row with the
greatest ``ts`` satisfying ``right.ts <= left.ts`` within the same ``by``
group (direction="backward"; "forward" mirrors with the smallest
``right.ts >= left.ts``). The canonical time-series enrichment: trades →
most recent quote, event → last prior purchase, reading → latest config.

Implementation is the union-window form, NOT a range join:

1. tag left/right rows and union them (right payload packed in a struct),
2. one window per ``by`` key ordered by (ts, tag) carries the last
   non-null right payload forward (``F.last(ignorenulls=True)``),
3. keep left rows, unpack the payload.

Cost model at 100 TB: exactly ONE shuffle (hash partition on ``by``) and
one sort within partitions — the same price as a sort-merge join, with no
row-pair explosion and no per-row range probe. A bucketed/binned range
join would multiply rows by bin fan-out; the union-window form never
multiplies. Skewed ``by`` keys (one user = half the stream) are the one
hazard — pre-split such keys with `skew.add_salt` on a coarse time bucket
if profiling shows a straggler.

Ties (two right rows at the exact same ts in one group) are broken by
``tie_break`` (ascending; the LAST one wins) to keep results
deterministic — pass the right table's unique id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, by: list[str],
              ts_col: str, direction: str = "backward",
              tolerance: Column | float | None = None,
              tie_break: str | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Point-in-time join; right columns (except ``by``) come back
    ``prefix``-renamed. ``tolerance`` is a bound in SECONDS (a numeric
    literal or numeric Column — the match age is computed as a double of
    epoch seconds, so an INTERVAL column is not accepted); matches
    older/newer than the bound null out.

    NULL semantics match an SQL join's, not the window's: a right row
    with NULL ``ts_col`` or a NULL ``by`` key can never be a match
    (without this, NULL ts sorts FIRST under the ascending union window,
    so one corrupt "unknown-time" right row would become the backward
    match for every left row predating the first real right row), and a
    left row with NULL ``ts_col`` or a NULL ``by`` key keeps its row but
    matches nothing — NULL never equals NULL."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    payload_cols = [c for c in right.columns if c not in by]
    joinable = F.col(ts_col).isNotNull()
    for k in by:
        joinable = joinable & F.col(k).isNotNull()
    right = right.filter(joinable)
    r = right.select(
        *by,
        F.col(ts_col).alias("__ts"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("__r"),
        F.lit(0).alias("__tag"),
        (F.col(tie_break) if tie_break else F.lit(0)).alias("__tie"),
    )
    l = left.select(
        "*",
        F.col(ts_col).alias("__ts"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left at equal ts → inclusive <=;
        # among tied right rows the greatest tie_break is carried last
        order = [F.col("__ts").asc(), F.col("__tag").asc(),
                 F.col("__tie").asc()]
        frame = W.partitionBy(*by).orderBy(*order) \
            .rowsBetween(W.unboundedPreceding, 0)
        carried = F.last("__r", ignorenulls=True).over(frame)
    else:
        order = [F.col("__ts").asc(), F.col("__tag").desc(),
                 F.col("__tie").desc()]
        frame = W.partitionBy(*by).orderBy(*order) \
            .rowsBetween(0, W.unboundedFollowing)
        carried = F.first("__r", ignorenulls=True).over(frame)

    # a left row with NULL ts or a NULL by key keeps its row but matches
    # nothing (the window would otherwise group NULL by-keys together
    # and hand NULL-ts left rows whatever sorts adjacent to them)
    out = (unioned.withColumn("__match", F.when(joinable, carried))
           .filter(F.col("__tag") == 1))
    if tolerance is not None:
        age = (F.col("__ts").cast("double")
               - F.col(f"__match.{ts_col}").cast("double"))
        if direction == "forward":
            age = -age
        out = out.withColumn(
            "__match",
            F.when(age <= tolerance, F.col("__match")))
    keep = [c for c in left.columns]
    matched = [F.col(f"__match.{c}").alias(f"{prefix}{c}")
               for c in payload_cols]
    return out.select(*keep, *matched)
