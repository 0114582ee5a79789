"""Randomized differential for the STREAMING ingest path (ST1–ST4).

Extends round 7's hostile raw-CSV generator (`test_medallion_differential`)
through `streaming.ingest` — the one ingest surface the medallion
differential does not cover.  The claims being proven, each on two
independent seeds of hostile data (corrupt CSV fields, NaN/Inf money,
malformed dates, whitespace-padded ids):

1. **Stream ≡ batch, bit-for-bit, corruption accounting included**: the
   availableNow file-stream ingest of a hostile CSV must produce exactly
   the rows `bronze.read_csv` produces — same salvage, same
   `_corrupt_record` raw lines — because the streaming path PROMISES
   batch parity (its corruption accounting exists so it doesn't re-open
   the batch path's closed blind spot).
2. **Exactly-once under split delivery**: the same rows landing as two
   waves against one checkpoint equal the one-shot ingest — no
   duplicates, no losses, hostile rows included.
3. **The stream-fed bronze feeds silver identically**: running
   `transform_policies` on the stream-ingested table matches the
   medallion differential's independent pure-Python cleaning twin — the
   streaming path plugs into the same independently-verified pipeline.
4. **Schema-evolution restart from an ingested table's own schema**: the
   documented restart flow derives the reader schema from the already-
   ingested target (which carries `_corrupt_record`); `corrupt_schema`
   must not duplicate the column (the ADVICE-r6 idempotency fix,
   exercised here end-to-end in the real restart, not just unit-tested).

NaN-bearing rows make naive tuple comparison lie (NaN != NaN), so the
comparator maps NaN to a sentinel first.
"""

from __future__ import annotations

import csv
import math

import pytest

from redshift_to_lakehouse_migration_spark import schemas as S
from redshift_to_lakehouse_migration_spark.medallion import bronze, silver
from redshift_to_lakehouse_migration_spark.streaming.ingest import (
    ingest_stream,
    read_ingested,
)

from test_medallion_differential import _gen, expect_silver

import os

# Default two independent draws per run; a SWEEP overrides via
# SPARK_GRAFT_DIFF_SEEDS="s1,s2,..." (tools/seed sweeps hunt the rarer
# divergences the fixed pair can't hit; the default stays deterministic
# for CI).
_ENV_SEEDS = tuple(int(s) for s in
                   os.environ.get("SPARK_GRAFT_DIFF_SEEDS", "").split(",")
                   if s.strip())
SEEDS = _ENV_SEEDS or (20260818, 20260819)

LINEAGE = ("_ingestion_timestamp", "_source_file", "_batch_id")


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "__nan__"
    return v


def _rowset(df, cols):
    """Multiset of normalized row tuples (Counter: rows carry NULLs of
    mixed types, which Python tuples refuse to sort)."""
    from collections import Counter
    return Counter(tuple(_norm(r[c]) for c in cols)
                   for r in df.select(*cols).collect())


@pytest.fixture(scope="module", params=SEEDS)
def hostile_csvs(request, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"stream_raw_{request.param}")
    models = _gen(request.param, str(d))
    return request.param, str(d), models


def test_hostile_stream_ingest_equals_batch(hostile_csvs, spark, tmp_path):
    import shutil

    seed, raw_dir, models = hostile_csvs
    for table, schema in (("policies", S.RAW_POLICIES),
                          ("claims", S.RAW_CLAIMS)):
        landing = tmp_path / f"landing_{table}"  # stream source needs a dir
        landing.mkdir()
        shutil.copy(f"{raw_dir}/raw_{table}.csv", landing / "data.csv")
        target = str(tmp_path / f"t_{table}")
        ingest_stream(spark, str(landing), schema, target,
                      str(tmp_path / f"ckpt_{table}"))
        streamed = read_ingested(spark, target)
        batch = bronze.read_csv(spark, f"{raw_dir}/raw_{table}.csv", schema)
        cols = [c for c in streamed.columns if c not in LINEAGE]
        assert set(cols) == set(batch.columns)
        s_rows = _rowset(streamed, cols)
        b_rows = _rowset(batch, cols)
        assert sum(s_rows.values()) == len(models[table])
        assert s_rows == b_rows, table
        # corruption accounting carried identically
        n_corrupt = sum(1 for r in models[table] if r["corrupt"])
        assert streamed.filter("_corrupt_record IS NOT NULL").count() \
            == n_corrupt, table


def test_split_delivery_exactly_once_and_silver_parity(hostile_csvs, spark,
                                                       tmp_path):
    seed, raw_dir, models = hostile_csvs
    rows = list(csv.reader(open(f"{raw_dir}/raw_policies.csv")))
    header, body = rows[0], rows[1:]
    landing = tmp_path / "landing"
    landing.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def write_wave(name, chunk):
        with open(landing / name, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(chunk)

    write_wave("wave1.csv", body[: len(body) // 2])
    ingest_stream(spark, str(landing), S.RAW_POLICIES, target, ckpt)
    n1 = read_ingested(spark, target).count()
    assert n1 == len(body) // 2

    write_wave("wave2.csv", body[len(body) // 2:])
    ingest_stream(spark, str(landing), S.RAW_POLICIES, target, ckpt)
    streamed = read_ingested(spark, target)
    assert streamed.count() == len(body)  # wave1 NOT re-ingested

    # the stream-fed bronze feeds silver identically to the one-shot
    # batch path AND to the independent Python twin
    batch = bronze.read_csv(spark, f"{raw_dir}/raw_policies.csv",
                            S.RAW_POLICIES)
    cols = [c for c in streamed.columns if c not in LINEAGE]
    assert _rowset(streamed, cols) == _rowset(batch, cols)

    got = silver.transform_policies(streamed)
    exp = expect_silver(models)["silver_policies"]
    sil_cols = [c for c in got.columns if c != "_cleaned_timestamp"
                and not got.schema[c].dataType.typeName().startswith(
                    "timestamp")]
    from collections import Counter
    g = _rowset(got, sil_cols)
    e = Counter(tuple(_norm(r[c]) for c in sil_cols) for r in exp)
    assert g == e


def test_schema_evolution_restart_from_ingested_schema(hostile_csvs, spark,
                                                       tmp_path):
    """The documented restart flow: derive the reader schema from the
    already-ingested target (it carries _corrupt_record) and re-ingest
    with the SAME checkpoint after new files land.  Before the
    corrupt_schema idempotency fix this crashed with a duplicate
    _corrupt_record column; now the restart picks up exactly the
    unprocessed files."""
    seed, raw_dir, models = hostile_csvs
    rows = list(csv.reader(open(f"{raw_dir}/raw_premiums.csv")))
    header, body = rows[0], rows[1:]
    landing = tmp_path / "landing"
    landing.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    with open(landing / "wave1.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(body[:100])
    ingest_stream(spark, str(landing), S.RAW_PREMIUMS, target, ckpt)

    # restart schema derived from the ingested table itself — source
    # columns + _corrupt_record, minus lineage
    ingested = read_ingested(spark, target)
    derived = ",".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in ingested.schema.fields if f.name not in LINEAGE)
    assert "_corrupt_record" in derived

    with open(landing / "wave2.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(body[100:])
    ingest_stream(spark, str(landing), derived, target, ckpt)

    final = read_ingested(spark, target)
    assert final.count() == len(body)
    assert final.columns.count("_corrupt_record") == 1
    batch = bronze.read_csv(spark, f"{raw_dir}/raw_premiums.csv",
                            S.RAW_PREMIUMS)
    cols = [c for c in final.columns if c not in LINEAGE]
    assert _rowset(final, cols) == _rowset(batch, cols)
