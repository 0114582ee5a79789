"""Driver-sample staleness invariant (VERDICT r7 directive #2).

`tools/staleness.py` derives, from git blame over each query's defining
source spans, whether any registered query's newest change post-dates its
newest green driver row.  The invariant enforced here: every such stale
query must sit inside the pending DRIVER_SAMPLE_PRIORITY (the first 50
registry entries the driver will sample next round), so the see-saw
remainder that slipped through three rounds of hand-rotation fails the
suite instead of surfacing in the next verdict.

These tests shell out to git; they are pure-metadata (no SparkSession).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import staleness  # noqa: E402


def _git_available() -> bool:
    try:
        subprocess.run(["git", "-C", staleness.REPO, "rev-parse", "HEAD"],
                       check=True, capture_output=True)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _git_available(), reason="not a git checkout")


@pytest.fixture(scope="module")
def audit_result():
    return staleness.audit()


def test_every_stale_query_is_in_pending_sample(audit_result):
    report, _ = audit_result
    from redshift_to_lakehouse_migration_spark.queries import (
        DRIVER_SAMPLE_PRIORITY)
    stale = {n for n, r in report.items() if r["stale"]}
    uncovered = stale - set(DRIVER_SAMPLE_PRIORITY)
    assert not uncovered, (
        f"{len(uncovered)} queries changed after their newest driver row "
        f"but are not in the pending 50-slot sample: {sorted(uncovered)}; "
        f"rotate them into DRIVER_SAMPLE_PRIORITY (tools/staleness.py "
        f"--suggest) before the snapshot commit")


def test_every_query_has_a_driver_row(audit_result):
    report, _ = audit_result
    missing = [n for n, r in report.items() if r["newest_round"] is None]
    assert not missing, f"queries never green in any round: {missing}"


def test_span_mapping_is_nontrivial(audit_result):
    """Every query must resolve to at least one non-global source span —
    an empty span set would make it vacuously fresh forever."""
    report, _ = audit_result
    empty = [n for n, r in report.items() if r["n_spans"] == 0]
    assert not empty, f"queries with no blamable spans: {empty}"


def test_global_spans_are_the_expected_infra(audit_result):
    """Global spans (coverage > sample size, replica-gated) should stay a
    short infra list; growth means a helper quietly became load-bearing
    for >50 queries and per-query staleness no longer sees it."""
    _, global_report = audit_result
    files = {s.split(":")[0] for s in global_report["spans"]}
    allowed = {
        "redshift_to_lakehouse_migration_spark/session.py",
        "redshift_to_lakehouse_migration_spark/tables.py",
        "redshift_to_lakehouse_migration_spark/functions.py",
        "redshift_to_lakehouse_migration_spark/schemas.py",
    }
    assert files <= allowed, (
        f"unexpected global-span files {sorted(files - allowed)}; either "
        f"add to the allowed infra list deliberately or narrow the helper")
