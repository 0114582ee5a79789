"""Binned range join — interval predicates without going quadratic.

``left ⋈ right ON left.by = right.by AND right.ts ∈ (left.ts + lower,
left.ts + upper]`` — "errors within 2 h after a click", "readings during
a maintenance window". Spark plans a bare inequality join as a nested
loop per key; this form turns it into an equality join:

1. bucket right rows by ``floor(ts_us / w)`` where ``w = upper - lower``
   (integer microseconds — exact, no float boundary drift),
2. each left row can only match buckets ``b0 = floor((ts+lower)/w)`` and
   ``b0+1`` (the window spans exactly one bucket width), so the left side
   explodes to exactly TWO rows,
3. equality join on (by, bucket), then the exact interval filter.

Cost at 100 TB: one shuffle on (by, bucket); row growth is a fixed 2× on
the left side — never data-dependent, never quadratic. Narrower windows
make buckets smaller and candidates fewer; the classic alternative
(join on ``by`` alone, filter after) explodes with per-key row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(left: DataFrame, right: DataFrame, by: list[str],
                      left_ts: str, right_ts: str,
                      lower: float, upper: float) -> DataFrame:
    """Inner range join: ``right_ts - left_ts ∈ (lower, upper]`` seconds
    (lower exclusive, upper inclusive), equal ``by`` keys. Both ts columns
    must be timestamps; all arithmetic runs in integer microseconds."""
    lower_us = int(round(lower * 1_000_000))
    upper_us = int(round(upper * 1_000_000))
    # guard on the ROUNDED microsecond bounds: a sub-microsecond window
    # (e.g. upper=4e-7) passes a float upper > lower check but rounds to
    # zero width, and the bucket division below would divide by zero
    if not upper_us > lower_us:
        raise ValueError(
            f"need upper > lower by at least 1 microsecond, got "
            f"({lower}, {upper}] = ({lower_us}us, {upper_us}us]")
    w = upper_us - lower_us

    r = right.withColumn("__r_us", F.unix_micros(F.col(right_ts)))
    r = r.withColumn("__bucket", F.floor(F.col("__r_us") / F.lit(w)))
    l = left.withColumn("__l_us", F.unix_micros(F.col(left_ts)))
    b0 = F.floor((F.col("__l_us") + F.lit(lower_us)) / F.lit(w))
    l = l.withColumn("__bucket", F.explode(F.array(b0, b0 + 1)))

    joined = l.join(r, [*by, "__bucket"], "inner").filter(
        (F.col("__r_us") > F.col("__l_us") + F.lit(lower_us))
        & (F.col("__r_us") <= F.col("__l_us") + F.lit(upper_us)))
    return joined.drop("__bucket", "__l_us", "__r_us")
