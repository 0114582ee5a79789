"""Legacy-vs-target reconciliation harness (SURVEY §2.11, the reference's
correctness centerpiece: `migration_validation/reconciliation.py`).

Compares any two DataFrames (e.g. a legacy extract vs the migrated table):
row counts (exact), per-column SUM aggregates (relative tolerance, default
1e-4 per `reconciliation.py:64` / `MIGRATION_PLAYBOOK.md:244`), categorical
distributions (exact histogram equality), and schema compatibility.

Scale fix over the reference: ``compare_aggregates`` computes ALL column sums
for each side in one aggregate pass (two scans total — one per side — instead
of 2×N); ``compare_distributions`` joins the two histograms instead of
collecting both to the driver and diffing in Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quality import SchemaValidation, compare_schemas

DEFAULT_TOLERANCE = 1e-4


@dataclass
class ReconResult:
    """One reconciliation outcome (`reconciliation.py:18-30` dataclass)."""
    check: str
    passed: bool
    legacy_value: object = None
    target_value: object = None
    details: str | None = None


def compare_row_counts(legacy: DataFrame, target: DataFrame) -> ReconResult:
    """Exact row-count match — zero tolerance (`reconciliation.py:39-56`)."""
    nl, nt = legacy.count(), target.count()
    return ReconResult("row_count", nl == nt, nl, nt)


def compare_aggregates(legacy: DataFrame, target: DataFrame,
                       columns: list[str] | None = None,
                       tolerance: float = DEFAULT_TOLERANCE,
                       ) -> list[ReconResult]:
    """Per-column SUM within relative tolerance (`reconciliation.py:58-92`),
    all columns fused into one aggregate job per side."""
    if columns is None:
        numeric = {"int", "bigint", "double", "float", "smallint", "tinyint"}
        columns = [c for c, t in legacy.dtypes
                   if t in numeric or t.startswith("decimal")]
        tcols = {c for c, _ in target.dtypes}
        columns = [c for c in columns if c in tcols]
    if not columns:
        return []

    def sums(df: DataFrame) -> dict[str, float]:
        row = df.agg(*[
            F.sum(F.col(c).cast("decimal(30,6)")).cast("double").alias(c)
            for c in columns]).collect()[0]
        return {c: row[c] for c in columns}

    ls, ts = sums(legacy), sums(target)
    out = []
    for c in columns:
        lv, tv = ls[c], ts[c]
        if lv is None and tv is None:
            ok, detail = True, "both null"
        elif lv is None or tv is None:
            ok, detail = False, "one side null"
        elif lv == 0:
            ok, detail = tv == 0, "zero base"
        else:
            rel = abs(lv - tv) / abs(lv)
            ok, detail = rel <= tolerance, f"rel_diff={rel:.2e}"
        out.append(ReconResult(f"aggregate_sum_{c}", ok, lv, tv, detail))
    return out


def compare_distributions(legacy: DataFrame, target: DataFrame,
                          column: str) -> ReconResult:
    """Exact categorical histogram equality (`reconciliation.py:94-130`),
    computed distributively: full-outer join of the two histograms, count
    mismatched buckets (no driver-side dict diff)."""
    lh = legacy.groupBy(F.col(column).alias("v")).agg(
        F.count("*").alias("n_legacy"))
    th = target.groupBy(F.col(column).alias("v")).agg(
        F.count("*").alias("n_target"))
    # eqNullSafe: NULL is a real histogram bucket (silver deliberately
    # nullifies some columns) — a plain equality join would leave the two
    # NULL buckets unmatched and report matching data as 2 mismatches.
    diff = (
        lh.join(th, lh["v"].eqNullSafe(th["v"]), "full_outer")
        .filter(F.coalesce("n_legacy", F.lit(-1))
                != F.coalesce("n_target", F.lit(-1)))
    )
    n_bad = diff.count()
    return ReconResult(f"distribution_{column}", n_bad == 0,
                       details=f"mismatched_buckets={n_bad}")


def compare_schemas_recon(legacy: DataFrame,
                          target: DataFrame) -> SchemaValidation:
    """Column-set compatibility ignoring `_` metadata cols
    (`reconciliation.py:132-155`)."""
    return compare_schemas(legacy, target, ignore_metadata_cols=True)


def reconcile(legacy: DataFrame, target: DataFrame,
              distribution_columns: list[str] | None = None,
              tolerance: float = DEFAULT_TOLERANCE) -> list[ReconResult]:
    """Full go/no-go suite (`MIGRATION_PLAYBOOK.md:239-248`): row counts,
    schema, per-column sums, optional categorical distributions."""
    results = [compare_row_counts(legacy, target)]
    sv = compare_schemas_recon(legacy, target)
    results.append(ReconResult(
        "schema_compatibility", sv.is_valid,
        details=(f"missing={sv.missing_columns} extra={sv.extra_columns} "
                 f"mismatched={sv.type_mismatches}")))
    results.extend(compare_aggregates(legacy, target, tolerance=tolerance))
    for c in distribution_columns or []:
        results.append(compare_distributions(legacy, target, c))
    return results
