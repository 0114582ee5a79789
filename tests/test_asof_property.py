"""Property-based check of the as-of join (asof.py) against a brute-force
Python reference over randomized inputs — hypothesis explores key skew,
duplicate timestamps, empty sides, and boundary equality, the cases
hand-written fixtures under-sample. Semantics under test: backward = the
latest right row with ts_r <= ts_l per key (min tie_break id on equal
timestamps the GREATEST tie_break wins — the operator's documented
contract, asof.py:66-68); forward mirrors it.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from redshift_to_lakehouse_migration_spark.asof import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=20)

left_rows = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12)
right_rows = st.lists(st.tuples(KEYS, TS, st.integers(0, 99)),
                      min_size=0, max_size=12)


def _brute(left, right, direction):
    out = {}
    for i, (k, tl) in enumerate(left):
        best = None
        for rid, (rk, tr, _val) in enumerate(right):
            ok = (rk == k) and (tr <= tl if direction == "backward"
                                else tr >= tl)
            if not ok:
                continue
            if best is None:
                best = rid
                continue
            bt = right[best][1]
            if direction == "backward":
                better = tr > bt or (tr == bt and rid > best)
            else:
                better = tr < bt or (tr == bt and rid > best)
            if better:
                best = rid
        out[i] = None if best is None else best
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=left_rows, right=right_rows,
       direction=st.sampled_from(["backward", "forward"]))
def test_asof_matches_bruteforce(spark, left, right, direction):
    ldf = spark.createDataFrame(
        [(i, k, float(t)) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts double")
    rdf = spark.createDataFrame(
        [(i, k, float(t), v) for i, (k, t, v) in enumerate(right)],
        "rid long, k long, ts double, val long")
    got = asof_join(ldf, rdf, by=["k"], ts_col="ts",
                    direction=direction, tie_break="rid")
    got_map = {r.lid: r.asof_rid for r in got.collect()}
    expected = _brute(left, right, direction)
    assert set(got_map) == set(expected)
    for lid, rid in expected.items():
        assert got_map[lid] == rid, (lid, direction)
