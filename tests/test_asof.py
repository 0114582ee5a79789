"""As-of join semantics: backward/forward direction, inclusive-equality
match, tolerance null-out, tie-break determinism, and no-match nulls."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100.0), (2, "u1", 205.0), (3, "u2", 50.0),
         (4, "u3", 10.0)],
        "lid long, u string, lts double")
    right = spark.createDataFrame(
        [("u1", 90.0, "a"), ("u1", 205.0, "b"), ("u1", 300.0, "c"),
         ("u2", 60.0, "d")],
        "u string, rts double, tag string")
    return left, right


def test_backward_matches(spark, frames):
    left, right = frames
    r = right.withColumnRenamed("rts", "lts")
    out = {row.lid: row for row in asof_join(
        left, r, by=["u"], ts_col="lts", prefix="m_").collect()}
    assert out[1].m_tag == "a"            # 90 <= 100, not 205
    assert out[2].m_tag == "b"            # equality is inclusive
    assert out[3].m_tag is None           # u2's only right row is later
    assert out[4].m_tag is None           # u3 has no right rows


def test_forward_matches(spark, frames):
    left, right = frames
    r = right.withColumnRenamed("rts", "lts")
    out = {row.lid: row for row in asof_join(
        left, r, by=["u"], ts_col="lts", direction="forward",
        prefix="m_").collect()}
    assert out[1].m_tag == "b"            # next at-or-after 100 is 205
    assert out[2].m_tag == "b"            # inclusive equality
    assert out[3].m_tag == "d"            # 60 >= 50
    assert out[4].m_tag is None


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    r = right.withColumnRenamed("rts", "lts")
    out = {row.lid: row for row in asof_join(
        left, r, by=["u"], ts_col="lts", tolerance=F.lit(5.0),
        prefix="m_").collect()}
    assert out[1].m_tag is None           # age 10 > tolerance 5
    assert out[2].m_tag == "b"            # age 0


def test_null_ts_right_row_is_never_a_match(spark):
    """NULL ts sorts FIRST under the ascending union window — unguarded,
    a corrupt 'unknown-time' right row becomes the backward match for
    every left row predating the first real right row, and the first-
    right-row 'forward' match for NULL-ts left rows."""
    left = spark.createDataFrame(
        [(1, "u", 50.0), (2, "u", 150.0)], "lid long, u string, lts double")
    right = spark.createDataFrame(
        [("u", None, "corrupt"), ("u", 100.0, "real")],
        "u string, lts double, tag string")
    for direction, want in (("backward", {1: None, 2: "real"}),
                            ("forward", {1: "real", 2: None})):
        out = {r.lid: r.m_tag for r in asof_join(
            left, right, by=["u"], ts_col="lts", direction=direction,
            prefix="m_").collect()}
        assert out == want, (direction, out)


def test_null_keys_and_ts_match_nothing_but_keep_left_rows(spark):
    """SQL join semantics, not window-NULL-grouping semantics: NULL by
    keys never equal each other, NULL left ts matches nothing — and the
    left row always survives (as-of is a left enrichment)."""
    left = spark.createDataFrame(
        [(1, None, 100.0), (2, "u", None), (3, "u", 100.0)],
        "lid long, u string, lts double")
    right = spark.createDataFrame(
        [(None, 90.0, "nullkey"), ("u", 90.0, "real")],
        "u string, lts double, tag string")
    out = {r.lid: r.m_tag for r in asof_join(
        left, right, by=["u"], ts_col="lts", prefix="m_").collect()}
    assert out == {1: None, 2: None, 3: "real"}


def test_tie_break_deterministic(spark):
    left = spark.createDataFrame([(1, "u", 10.0)], "lid long, u string, lts double")
    right = spark.createDataFrame(
        [("u", 10.0, 7, "low"), ("u", 10.0, 9, "high")],
        "u string, lts double, rid long, tag string")
    out = asof_join(left, right, by=["u"], ts_col="lts",
                    tie_break="rid", prefix="m_").collect()
    assert out[0].m_tag == "high"         # greatest tie_break wins
