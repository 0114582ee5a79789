"""Shared fixtures: one session-scoped local SparkSession (reference pattern:
`tests/conftest.py:11-26` uses local[2] + tiny shuffle partitions)."""

from __future__ import annotations

import pytest

from redshift_to_lakehouse_migration_spark.session import get_spark

# Smallest driver-generated scale factor; the bloom-identity tests read the
# real documents/embeddings parquet rather than synthesizing rows.
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
