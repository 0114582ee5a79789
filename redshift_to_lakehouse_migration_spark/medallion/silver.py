"""Silver layer: cleaning + validation transforms (SURVEY §2.12 stg/clean_*).

Parity with `silver/clean_policies.py:32-75`, `clean_claims.py:29-54`,
`clean_premiums.py:15-31`, `clean_properties.py:15-38` (and their dbt twins
`stg_*.sql`): NOT-NULL key filters, trim/upper normalization, empty→null,
typed casts (DECIMAL money, DATE/TIMESTAMP from strings).

Each transform is ONE wide ``select`` (not 17 chained ``withColumn``s —
Catalyst collapses those anyway but analyzer time is real; SURVEY §4) and
each table's DQ suite runs as ONE fused aggregate pass via
``redshift_to_lakehouse_migration_spark.quality``.

Raw-edge cast discipline: the reference ran Spark 3 defaults, where a
malformed raw value (``'2023-02-30'`` effective_date, a NaN premium)
silently became NULL at these casts; this engine runs Spark 4's ANSI
default, where the SAME row would abort the whole job
(``CAST_INVALID_INPUT``) — one corrupt value in 100 TB kills the layer.
Every conversion of a raw-edge value therefore uses ``try_cast``
(restoring the reference's NULL semantics under ANSI) plus ACCOUNTING:
``_cast_errors`` names the source columns whose raw value was non-NULL
but failed its typed cast, mirroring bronze's ``_corrupt_record``
(``_``-prefixed, so the schema/recon validators already exclude it) —
bad input stays distinguishable from legitimately-NULL data and
quarantine-routable downstream. Casts of engine-COMPUTED values
elsewhere keep plain ANSI casts deliberately: there, out-of-range means
a broken invariant and must fail loud, not leak NULLs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import quality as q
from .. import schemas as S
from ..functions import empty_to_null, full_name, norm_str

def _meta() -> list:
    return [F.current_timestamp().alias("_cleaned_timestamp")]


class _CastAcc:
    """Accumulates the cast-accounting bookkeeping for one transform:
    ``names`` (error-flag order — `_corrupt_record` first when present,
    then each raw-edge column in projection order) and ``flags`` (the
    cheap raw-side booleans stage 1 must carry so stage 2 can derive the
    error column without re-evaluating any cast)."""

    def __init__(self) -> None:
        self.names: list[str] = []
        self.flags: list[Column] = []


def _typed(src: Column | str, name: str, dtype: str,
           acc: _CastAcc) -> Column:
    """``try_cast`` a raw-edge column and register its failure-flag
    bookkeeping: a non-NULL raw value whose typed form is NULL was
    malformed (or, for DECIMAL money, NaN/Inf/out-of-range).

    Single-evaluation discipline (VERDICT r6 #3): the try_cast itself is
    emitted ONCE, here; the error test in ``_finish`` reads the
    already-projected typed column plus a cheap ``_nn_<name>``
    raw-nonnull boolean from a SECOND select.  The one-select form
    referenced every cast twice (typed value + ``typed.isNull()`` inside
    the error ``when``) and left dedup to codegen CSE heuristics; two
    Projects make it structural — CollapseProject does not inline a
    non-cheap alias that is referenced more than once, so each cast
    evaluates exactly once per row (plan-asserted in
    tests/test_medallion.py)."""
    src = F.col(src) if isinstance(src, str) else src
    acc.names.append(name)
    acc.flags.append(src.isNotNull().alias("_nn_" + name))
    return src.try_cast(dtype).alias(name)


def _finish(stage1: DataFrame, acc: _CastAcc) -> DataFrame:
    """Second select: pass every non-bookkeeping column through unchanged
    and derive ``_cast_errors`` — comma-joined failed-column names, NULL
    when the row cast clean (``concat_ws`` skips un-fired ``when``
    NULLs) — from the stage-1 typed columns and ``_nn_*`` flags."""
    errs = []
    for n in acc.names:
        if n == "_corrupt_record":
            errs.append(F.when(F.col("_nn__corrupt_record"), F.lit(n)))
        else:
            errs.append(F.when(F.col("_nn_" + n) & F.col(n).isNull(),
                               F.lit(n)))
    out = [c for c in stage1.columns if not c.startswith("_nn_")]
    return stage1.select(
        *out,
        F.nullif(F.concat_ws(",", *errs), F.lit("")).alias("_cast_errors"))


def _source_corrupt(df: DataFrame, acc: _CastAcc) -> None:
    """Carry bronze's read-time corruption flag into the same accounting
    channel. Without this, a CSV row the reader shredded (its raw line in
    ``_corrupt_record``, its salvaged fields NULLed) whose key survived
    would enter silver indistinguishable from a clean row — re-silencing
    at silver exactly what the bronze accounting made visible. Folding it
    into ``_cast_errors`` (first entry) lets ONE ``quality.cast_clean``
    check quarantine-route both defect classes. Conditional on the column
    because silver also accepts frames built directly from the RAW_*
    schemas (tests, non-CSV sources)."""
    if "_corrupt_record" in df.columns:
        acc.names.append("_corrupt_record")
        acc.flags.append(F.col("_corrupt_record").isNotNull()
                         .alias("_nn__corrupt_record"))


def transform_policies(df: DataFrame) -> DataFrame:
    """`silver/clean_policies.py:32-75`."""
    acc = _CastAcc()
    _source_corrupt(df, acc)
    # the trailing *acc.flags unpacks AFTER the earlier _typed(...)
    # arguments have run (left-to-right evaluation), so it sees every flag
    return _finish(
        df.filter(F.col("policy_id").isNotNull()
                  & (F.trim("policy_id") != "")
                  & F.col("effective_date").isNotNull())
        .select(
            F.trim("policy_id").alias("policy_id"),
            F.trim("policyholder_first_name").alias("first_name"),
            F.trim("policyholder_last_name").alias("last_name"),
            full_name("policyholder_first_name",
                      "policyholder_last_name").alias("policyholder_name"),
            F.lower(F.trim("policyholder_email")).alias("email"),
            F.trim("property_id").alias("property_id"),
            norm_str("coverage_type_code").alias("coverage_type_code"),
            _typed("effective_date", "effective_date", "date", acc),
            _typed("expiration_date", "expiration_date", "date", acc),
            norm_str("status").alias("status"),
            _typed("annual_premium", "annual_premium", "decimal(12,2)",
                   acc),
            _typed("deductible", "deductible", "decimal(12,2)", acc),
            _typed("coverage_limit", "coverage_limit", "decimal(14,2)",
                   acc),
            F.trim("agent_id").alias("agent_id"),
            norm_str("channel").alias("channel"),
            _typed("created_at", "created_at", "timestamp", acc),
            _typed("updated_at", "updated_at", "timestamp", acc),
            *_meta(),
            *acc.flags,
        ), acc)


def transform_claims(df: DataFrame) -> DataFrame:
    """`silver/clean_claims.py:29-54` incl. empty-string→NULL closed_date."""
    acc = _CastAcc()
    _source_corrupt(df, acc)
    return _finish(
        df.filter(F.col("claim_id").isNotNull()
                  & F.col("policy_id").isNotNull()
                  & (F.col("claim_amount") >= 0))
        .select(
            F.trim("claim_id").alias("claim_id"),
            F.trim("policy_id").alias("policy_id"),
            _typed("claim_date", "claim_date", "date", acc),
            _typed("reported_date", "reported_date", "date", acc),
            _typed(empty_to_null("closed_date"), "closed_date", "date",
                   acc),
            norm_str("claim_type").alias("claim_type"),
            norm_str("claim_status").alias("claim_status"),
            _typed("claim_amount", "claim_amount", "decimal(12,2)", acc),
            _typed("approved_amount", "approved_amount", "decimal(12,2)",
                   acc),
            _typed("deductible_applied", "deductible_applied",
                   "decimal(12,2)", acc),
            F.trim("adjuster_id").alias("adjuster_id"),
            norm_str("cause_of_loss").alias("cause_of_loss"),
            F.col("description"),
            _typed("created_at", "created_at", "timestamp", acc),
            _typed("updated_at", "updated_at", "timestamp", acc),
            *_meta(),
            *acc.flags,
        ), acc)


def transform_premiums(df: DataFrame) -> DataFrame:
    """`silver/clean_premiums.py:15-31`."""
    acc = _CastAcc()
    _source_corrupt(df, acc)
    return _finish(
        df.filter(F.col("premium_id").isNotNull()
                  & F.col("policy_id").isNotNull()
                  & (F.col("amount") > 0))
        .select(
            F.trim("premium_id").alias("premium_id"),
            F.trim("policy_id").alias("policy_id"),
            _typed("payment_date", "payment_date", "date", acc),
            _typed("due_date", "due_date", "date", acc),
            _typed("amount", "amount", "decimal(12,2)", acc),
            norm_str("payment_method").alias("payment_method"),
            norm_str("payment_status").alias("payment_status"),
            norm_str("billing_period").alias("billing_period"),
            _typed("period_start_date", "period_start_date", "date", acc),
            _typed("period_end_date", "period_end_date", "date", acc),
            _typed("created_at", "created_at", "timestamp", acc),
            *_meta(),
            *acc.flags,
        ), acc)


def transform_properties(df: DataFrame) -> DataFrame:
    """`silver/clean_properties.py:15-38`; zip stays string (leading zeros)."""
    acc = _CastAcc()
    _source_corrupt(df, acc)
    return _finish(
        df.filter(F.col("property_id").isNotNull())
        .select(
            F.trim("property_id").alias("property_id"),
            F.trim("street_address").alias("street_address"),
            F.trim("city").alias("city"),
            F.trim("county").alias("county"),
            norm_str("state").alias("state"),
            F.trim("zip_code").alias("zip_code"),
            _typed("latitude", "latitude", "decimal(10,7)", acc),
            _typed("longitude", "longitude", "decimal(10,7)", acc),
            F.col("year_built"),
            F.col("square_footage"),
            norm_str("construction_type").alias("construction_type"),
            norm_str("roof_type").alias("roof_type"),
            F.col("stories"),
            norm_str("occupancy_type").alias("occupancy_type"),
            norm_str("flood_zone").alias("flood_zone"),
            F.trim("wind_zone").alias("wind_zone"),
            _typed("property_value", "property_value", "decimal(14,2)",
                   acc),
            _typed("created_at", "created_at", "timestamp", acc),
            _typed("updated_at", "updated_at", "timestamp", acc),
            *_meta(),
            *acc.flags,
        ), acc)


# --- fused validation suites (one aggregate job per table) ----------------

def validate_policies(df: DataFrame) -> list[q.CheckResult]:
    """`silver/clean_policies.py:83-98` — as ONE scan instead of ~8 jobs."""
    return q.run_checks(df, [
        q.not_null("policy_id"),
        q.unique("policy_id"),
        q.accepted_values("status", S.POLICY_STATUSES),
        q.accepted_values("channel", S.CHANNELS),
        q.accepted_values("coverage_type_code", S.COVERAGE_TYPES),
        q.in_range("annual_premium", min_value=0),
    ], table_name="silver.policies")


def validate_claims(df: DataFrame) -> list[q.CheckResult]:
    return q.run_checks(df, [
        q.not_null("claim_id"),
        q.not_null("policy_id"),
        q.unique("claim_id"),
        q.accepted_values("claim_status", S.CLAIM_STATUSES),
        q.accepted_values("claim_type", S.CLAIM_TYPES),
        q.in_range("claim_amount", min_value=0),
    ], table_name="silver.claims")


def validate_premiums(df: DataFrame) -> list[q.CheckResult]:
    return q.run_checks(df, [
        q.not_null("premium_id"),
        q.not_null("policy_id"),
        q.unique("premium_id"),
        q.accepted_values("payment_status", S.PAYMENT_STATUSES),
        q.accepted_values("billing_period", list(S.BILLING_PERIODS)),
        q.in_range("amount", min_value=0),
    ], table_name="silver.premiums")


def validate_properties(df: DataFrame) -> list[q.CheckResult]:
    return q.run_checks(df, [
        q.not_null("property_id"),
        q.unique("property_id"),
        q.accepted_values("state", S.STATES),
        q.accepted_values("construction_type", S.CONSTRUCTION_TYPES),
        q.in_range("year_built", 1800, 2030),
    ], table_name="silver.properties")
