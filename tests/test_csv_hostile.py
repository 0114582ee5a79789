"""Hostile-CSV envelope for the bronze ingest (S1).

The medallion tests ingest CLEAN fixture CSVs; a 100 TB raw zone does
not stay clean. This suite pins how `bronze.read_csv` behaves on every
malformation class a real feed produces — and, critically, that each one
is ACCOUNTED FOR in `_corrupt_record` rather than silently nulled
(PERMISSIVE mode's default failure mode, which makes bad input
indistinguishable from legitimately-NULL data):

- type-mismatched fields (non-numeric id)
- short rows (missing trailing columns)
- long rows (extra columns)
- quoted embedded newlines under multiLine=false — the scale-correct
  splittable setting — shred into shards, BOTH flagged
- RFC-4180 doubled quotes vs Spark's backslash-escape default (a
  declared per-file dialect, `rfc4180=True`)
- quoted delimiters, CRLF line endings, UTF-8 BOM: parse clean
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from redshift_to_lakehouse_migration_spark.medallion import bronze

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("amount", T.DoubleType()),
])

HOSTILE = (
    "id,name,amount\n"
    "1,alice,10.5\n"
    '2,"bob,comma",20\n'           # quoted delimiter: clean
    '3,"line\nbreak",30\n'         # quoted newline: shreds into 2 shards
    '4,"quote""inside",40\n'       # RFC-4180 doubled quote
    "notanint,carol,60\n"          # type mismatch
    "7,dave\n"                     # short row
    "8,eve,80,extra\n"             # long row
)


@pytest.fixture(scope="module")
def hostile_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "hostile.csv"
    p.write_text(HOSTILE)
    return str(p)


def test_every_malformation_is_accounted_not_silent(spark, hostile_path):
    df = bronze.read_csv(spark, hostile_path, SCHEMA)
    rows = {r.id: r for r in df.collect() if r.id is not None}
    corrupt = [r for r in df.collect() if r._corrupt_record is not None]

    # clean rows parse clean
    assert rows[1].name == "alice" and rows[1]._corrupt_record is None
    assert rows[2].name == "bob,comma" and rows[2]._corrupt_record is None

    # each malformation class carries its raw line in _corrupt_record:
    # 2 newline shards + 1 type mismatch + 1 short + 1 long = 5
    raw = sorted(r._corrupt_record for r in corrupt)
    assert len(corrupt) == 5
    assert '3,"line' in raw and 'break",30' in raw          # both shards
    assert "notanint,carol,60" in raw
    assert "7,dave" in raw
    assert "8,eve,80,extra" in raw

    # and PERMISSIVE still salvages what it can alongside the flag
    assert rows[7].name == "dave" and rows[7].amount is None
    assert rows[8].amount == 80.0


def test_rfc4180_dialect_unescapes_doubled_quotes(spark, hostile_path):
    """Spark's default escape is backslash: a doubled quote parses
    LITERALLY into the value. rfc4180=True restores standard semantics.
    Both directions pinned so a silent default change surfaces."""
    default = bronze.read_csv(spark, hostile_path, SCHEMA)
    r = default.filter("id = 4").collect()[0]
    assert r.name == '"quote""inside"'      # the hazard, pinned

    rfc = bronze.read_csv(spark, hostile_path, SCHEMA, rfc4180=True)
    r = rfc.filter("id = 4").collect()[0]
    assert r.name == 'quote"inside' and r._corrupt_record is None


def test_crlf_and_bom_parse_clean(spark, tmp_path):
    p = tmp_path / "crlf_bom.csv"
    p.write_bytes(b"\xef\xbb\xbfid,name,amount\r\n1,alice,10.5\r\n"
                  b"2,bob,20\r\n")
    df = bronze.read_csv(spark, str(p), SCHEMA)
    out = sorted(map(tuple, df.collect()))
    assert out == [(1, "alice", 10.5, None), (2, "bob", 20.0, None)]


def test_clean_file_has_zero_corrupt_rows(spark, tmp_path):
    p = tmp_path / "clean.csv"
    p.write_text("id,name,amount\n1,alice,10.5\n2,bob,20\n")
    # full-row collect: Spark refuses a CSV query whose referenced
    # columns are ONLY the internal corrupt-record column
    rows = bronze.read_csv(spark, str(p), SCHEMA).collect()
    assert len(rows) == 2
    assert all(r._corrupt_record is None for r in rows)


def test_ingest_batch_carries_corruption_into_bronze(spark, tmp_path,
                                                     hostile_path):
    """End-to-end: the bronze table preserves the corrupt-row accounting
    next to the lineage columns, so quarantine-routing can happen
    DOWNSTREAM of the append-only raw layer (same flow as read_jsonl)."""
    target = str(tmp_path / "bronze_hostile")
    n = bronze.ingest_batch(spark, hostile_path, SCHEMA, target, batch_id=1)
    back = spark.read.parquet(target)
    assert n == back.count()
    assert {"_corrupt_record", "_ingestion_timestamp", "_source_file",
            "_batch_id"} <= set(back.columns)
    assert back.filter("_corrupt_record IS NOT NULL").count() == 5
    # quarantine split downstream: good rows are whole, bad rows carry
    # their raw lines for replay
    good = back.filter(F.col("_corrupt_record").isNull())
    assert good.count() == back.count() - 5


def test_ingest_stream_corruption_accounting_matches_batch(spark, tmp_path,
                                                           hostile_path):
    """Stream≡batch parity for corrupt-row accounting: the streaming
    ingest must flag exactly the rows the batch reader flags — without
    the PERMISSIVE + ``_corrupt_record`` options it silently NULLed the
    fields of malformed landing rows, re-opening on the streaming path
    the blind spot the batch accounting closed."""
    import shutil

    from redshift_to_lakehouse_migration_spark.streaming.ingest import (
        ingest_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(hostile_path, landing / "hostile.csv")
    target = str(tmp_path / "bronze_stream")
    ingest_stream(spark, str(landing), SCHEMA, target,
                  str(tmp_path / "ckpt"))
    back = spark.read.parquet(target)
    # full-row collect on the raw-CSV side: Spark refuses a CSV query
    # whose referenced columns are ONLY the corrupt-record column
    batch_rows = bronze.read_csv(spark, hostile_path, SCHEMA).collect()
    assert back.count() == len(batch_rows)
    n_batch_bad = sum(r._corrupt_record is not None for r in batch_rows)
    assert back.filter("_corrupt_record IS NOT NULL").count() == \
        n_batch_bad == 5
    assert {"_corrupt_record", "_batch_id"} <= set(back.columns)
