"""Property-based check of the SCD2 merge (scd2.py) against a Python
dictionary-model reference over randomized update sequences: hypothesis
explores new keys, unchanged re-sends, value flips, flip-backs, and
multiple updates to the same key in one batch (dedup-to-latest). The
invariants after every merge:

- exactly one current row per key, matching the model's latest value;
- history rows are closed (end date set, not current);
- version count per key equals the model's change count;
- total rows = sum of versions (nothing lost, nothing duplicated).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from redshift_to_lakehouse_migration_spark.scd2 import init_scd2, scd2_merge

# a batch: list of (key, value, seq) — seq orders same-key updates
batch_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 2)),
    min_size=0, max_size=6)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(batches=st.lists(batch_st, min_size=1, max_size=4))
def test_scd2_matches_dictionary_model(spark, batches):
    dim = init_scd2(
        spark.createDataFrame([(0, 0)], "k long, v long"), "2024-01-01")
    model = {0: [0]}  # key -> list of versions in order

    for day, batch in enumerate(batches, start=2):
        if not batch:
            continue
        rows = [(k, v, i) for i, (k, v) in enumerate(batch)]
        updates = spark.createDataFrame(rows, "k long, v long, seq long")
        as_of = f"2024-01-{day:02d}"
        dim = scd2_merge(dim, updates, key_cols=["k"], tracked_cols=["v"],
                         as_of=as_of, order_col="seq")
        dim = dim.localCheckpoint(eager=True)  # keep the loop's plan flat
        # model: last update per key wins within the batch
        latest = {k: v for k, v, _ in rows}
        for k, v in latest.items():
            if k not in model:
                model[k] = [v]
            elif model[k][-1] != v:
                model[k].append(v)

    rows = dim.collect()
    cur = {r.k: r.v for r in rows if r.is_current}
    assert cur == {k: vs[-1] for k, vs in model.items()}
    # one current row per key; history closed; version counts match
    assert len([r for r in rows if r.is_current]) == len(model)
    for r in rows:
        if not r.is_current:
            assert r.effective_end_date is not None
    per_key = {}
    for r in rows:
        per_key[r.k] = per_key.get(r.k, 0) + 1
    assert per_key == {k: len(vs) for k, vs in model.items()}
