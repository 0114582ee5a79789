"""Explicit StructType contracts for the insurance-domain raw tables.

Schema-on-write at the edges, exactly like the reference's Bronze ingests
(`bronze/ingest_policies.py:28-47`, `ingest_claims.py:12-30`,
`ingest_premiums.py:12-26`, `ingest_properties.py:12-34`): inferSchema is
never used; dates/timestamps arrive as strings and are cast at Silver.
Column lists per FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*names: str) -> list[T.StructField]:
    return [T.StructField(n, T.StringType(), True) for n in names]


def _d(*names: str) -> list[T.StructField]:
    return [T.StructField(n, T.DoubleType(), True) for n in names]


def _i(*names: str) -> list[T.StructField]:
    return [T.StructField(n, T.IntegerType(), True) for n in names]


RAW_POLICIES = T.StructType(
    _s("policy_id", "policyholder_first_name", "policyholder_last_name",
       "policyholder_email", "property_id", "coverage_type_code",
       "effective_date", "expiration_date", "status")
    + _d("annual_premium", "deductible", "coverage_limit")
    + _s("agent_id", "channel", "created_at", "updated_at")
)

RAW_CLAIMS = T.StructType(
    _s("claim_id", "policy_id", "claim_date", "reported_date", "closed_date",
       "claim_type", "claim_status")
    + _d("claim_amount", "approved_amount", "deductible_applied")
    + _s("adjuster_id", "cause_of_loss", "description", "created_at",
         "updated_at")
)

RAW_PREMIUMS = T.StructType(
    _s("premium_id", "policy_id", "payment_date", "due_date")
    + _d("amount")
    + _s("payment_method", "payment_status", "billing_period",
         "period_start_date", "period_end_date", "created_at")
)

RAW_PROPERTIES = T.StructType(
    _s("property_id", "street_address", "city", "county", "state", "zip_code")
    + _d("latitude", "longitude")
    + _i("year_built", "square_footage")
    + _s("construction_type", "roof_type")
    + _i("stories")
    + _s("occupancy_type", "flood_zone", "wind_zone")
    + _d("property_value")
    + _s("created_at", "updated_at")
)

# Accepted-value vocabularies (`silver/clean_policies.py:28-29`,
# `silver/clean_claims.py:14-26`, FIXTURES.md domains)
POLICY_STATUSES = ["ACTIVE", "CANCELLED", "EXPIRED", "PENDING", "SUSPENDED"]
CHANNELS = ["ONLINE", "AGENT", "REFERRAL", "PARTNER", "DIRECT_MAIL"]
COVERAGE_TYPES = ["HO3", "HO5", "HO6", "DP1", "DP3", "HO4", "FLOOD", "WIND"]
CLAIM_STATUSES = ["OPEN", "UNDER_REVIEW", "APPROVED", "DENIED", "CLOSED",
                  "REOPENED"]
CLAIM_TYPES = ["PROPERTY_DAMAGE", "LIABILITY", "THEFT", "WATER_DAMAGE",
               "WIND_DAMAGE", "FIRE", "HAIL", "FLOOD", "MOLD", "OTHER"]
PAYMENT_STATUSES = ["COMPLETED", "FAILED", "PENDING"]
PAYMENT_METHODS = ["ACH", "CREDIT_CARD", "CHECK", "WIRE", "ESCROW"]
BILLING_PERIODS = {"MONTHLY": 12, "QUARTERLY": 4, "SEMI_ANNUAL": 2,
                   "ANNUAL": 1}
STATES = ["FL", "TX", "LA", "SC", "NC", "GA", "AL", "MS", "CA", "IL"]
CONSTRUCTION_TYPES = ["FRAME", "MASONRY", "CONCRETE", "STEEL", "WOOD",
                      "MANUFACTURED"]
FLOOD_ZONES = ["A", "AE", "V", "VE", "B", "C", "X", "X500"]
