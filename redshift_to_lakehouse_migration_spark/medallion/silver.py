"""Silver layer: cleaning + validation transforms (SURVEY §2.12 stg/clean_*).

Parity with `silver/clean_policies.py:32-75`, `clean_claims.py:29-54`,
`clean_premiums.py:15-31`, `clean_properties.py:15-38` (and their dbt twins
`stg_*.sql`): NOT-NULL key filters, trim/upper normalization, empty→null,
typed casts (DECIMAL money, DATE/TIMESTAMP from strings).

Each transform is ONE wide ``select`` (not 17 chained ``withColumn``s —
Catalyst collapses those anyway but analyzer time is real; SURVEY §4) and
each table's DQ suite runs as ONE fused aggregate pass via
``redshift_to_lakehouse_migration_spark.quality``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import quality as q
from .. import schemas as S
from ..functions import empty_to_null, full_name, norm_str

def _meta() -> list:
    return [F.current_timestamp().alias("_cleaned_timestamp")]


def transform_policies(df: DataFrame) -> DataFrame:
    """`silver/clean_policies.py:32-75`."""
    return (
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
            F.col("effective_date").cast("date").alias("effective_date"),
            F.col("expiration_date").cast("date").alias("expiration_date"),
            norm_str("status").alias("status"),
            F.col("annual_premium").cast("decimal(12,2)")
                .alias("annual_premium"),
            F.col("deductible").cast("decimal(12,2)").alias("deductible"),
            F.col("coverage_limit").cast("decimal(14,2)")
                .alias("coverage_limit"),
            F.trim("agent_id").alias("agent_id"),
            norm_str("channel").alias("channel"),
            F.col("created_at").cast("timestamp").alias("created_at"),
            F.col("updated_at").cast("timestamp").alias("updated_at"),
            *_meta(),
        )
    )


def transform_claims(df: DataFrame) -> DataFrame:
    """`silver/clean_claims.py:29-54` incl. empty-string→NULL closed_date."""
    return (
        df.filter(F.col("claim_id").isNotNull()
                  & F.col("policy_id").isNotNull()
                  & (F.col("claim_amount") >= 0))
        .select(
            F.trim("claim_id").alias("claim_id"),
            F.trim("policy_id").alias("policy_id"),
            F.col("claim_date").cast("date").alias("claim_date"),
            F.col("reported_date").cast("date").alias("reported_date"),
            empty_to_null("closed_date").cast("date").alias("closed_date"),
            norm_str("claim_type").alias("claim_type"),
            norm_str("claim_status").alias("claim_status"),
            F.col("claim_amount").cast("decimal(12,2)")
                .alias("claim_amount"),
            F.col("approved_amount").cast("decimal(12,2)")
                .alias("approved_amount"),
            F.col("deductible_applied").cast("decimal(12,2)")
                .alias("deductible_applied"),
            F.trim("adjuster_id").alias("adjuster_id"),
            norm_str("cause_of_loss").alias("cause_of_loss"),
            F.col("description"),
            F.col("created_at").cast("timestamp").alias("created_at"),
            F.col("updated_at").cast("timestamp").alias("updated_at"),
            *_meta(),
        )
    )


def transform_premiums(df: DataFrame) -> DataFrame:
    """`silver/clean_premiums.py:15-31`."""
    return (
        df.filter(F.col("premium_id").isNotNull()
                  & F.col("policy_id").isNotNull()
                  & (F.col("amount") > 0))
        .select(
            F.trim("premium_id").alias("premium_id"),
            F.trim("policy_id").alias("policy_id"),
            F.col("payment_date").cast("date").alias("payment_date"),
            F.col("due_date").cast("date").alias("due_date"),
            F.col("amount").cast("decimal(12,2)").alias("amount"),
            norm_str("payment_method").alias("payment_method"),
            norm_str("payment_status").alias("payment_status"),
            norm_str("billing_period").alias("billing_period"),
            F.col("period_start_date").cast("date")
                .alias("period_start_date"),
            F.col("period_end_date").cast("date").alias("period_end_date"),
            F.col("created_at").cast("timestamp").alias("created_at"),
            *_meta(),
        )
    )


def transform_properties(df: DataFrame) -> DataFrame:
    """`silver/clean_properties.py:15-38`; zip stays string (leading zeros)."""
    return (
        df.filter(F.col("property_id").isNotNull())
        .select(
            F.trim("property_id").alias("property_id"),
            F.trim("street_address").alias("street_address"),
            F.trim("city").alias("city"),
            F.trim("county").alias("county"),
            norm_str("state").alias("state"),
            F.trim("zip_code").alias("zip_code"),
            F.col("latitude").cast("decimal(10,7)").alias("latitude"),
            F.col("longitude").cast("decimal(10,7)").alias("longitude"),
            F.col("year_built"),
            F.col("square_footage"),
            norm_str("construction_type").alias("construction_type"),
            norm_str("roof_type").alias("roof_type"),
            F.col("stories"),
            norm_str("occupancy_type").alias("occupancy_type"),
            norm_str("flood_zone").alias("flood_zone"),
            F.trim("wind_zone").alias("wind_zone"),
            F.col("property_value").cast("decimal(14,2)")
                .alias("property_value"),
            F.col("created_at").cast("timestamp").alias("created_at"),
            F.col("updated_at").cast("timestamp").alias("updated_at"),
            *_meta(),
        )
    )


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
