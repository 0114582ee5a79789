"""Property-based check of the binned range join (rangejoin.py) against a
brute-force reference: randomized timestamps stress bucket boundaries
(the exact bin-edge cases where a candidate straddles two buckets),
duplicate timestamps, and empty sides. Contract: inner join on equal
keys with right_ts - left_ts in (lower, upper] seconds.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from redshift_to_lakehouse_migration_spark.rangejoin import range_join_binned

KEYS = st.integers(min_value=0, max_value=1)
SECS = st.integers(min_value=0, max_value=30)
BOUNDS = st.sampled_from([(0.0, 3.0), (1.0, 4.0), (0.0, 7.0)])


def _ts(s: int) -> datetime:
    return datetime.fromtimestamp(1_700_000_000 + s, tz=timezone.utc) \
        .replace(tzinfo=None)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=st.lists(st.tuples(KEYS, SECS), max_size=10),
       right=st.lists(st.tuples(KEYS, SECS), max_size=10),
       bounds=BOUNDS)
def test_range_join_matches_bruteforce(spark, left, right, bounds):
    lower, upper = bounds
    ldf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left)],
        "lid long, k long, lts timestamp")
    rdf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(right)],
        "rid long, k long, rts timestamp")
    got = {(r.lid, r.rid) for r in
           range_join_binned(ldf, rdf, by=["k"], left_ts="lts",
                             right_ts="rts", lower=lower, upper=upper)
           .select("lid", "rid").collect()}
    expected = {(i, j)
                for i, (lk, ls) in enumerate(left)
                for j, (rk, rs) in enumerate(right)
                if lk == rk and lower < (rs - ls) <= upper}
    assert got == expected
