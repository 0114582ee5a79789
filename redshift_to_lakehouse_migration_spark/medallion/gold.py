"""Gold layer: star-schema dims and facts for the insurance domain.

Parity (SURVEY §2.12): `gold/dim_policy.py:15-95` + `dim_policy.sql:13-53`,
`dim_property.sql:9-53`, `dim_coverage.sql:5-41`, `dim_date.sql:5-43`,
`gold/fact_claims.py:18-79` / `fact_claims.sql:5-67`,
`gold/fact_premiums.py:14-52` / `fact_premiums.sql:5-58`.

Where the reference's two implementations disagree we follow the PySpark twin
(SURVEY §7.3 risk 2): `concat_ws` NULL-skipping full names, `F.least` capping.
All dims take ``as_of`` instead of current_date() (risk 3). Join strategy
is left to the size-checked ``autoBroadcastJoinThreshold`` path: policies,
properties, and premium_summary are corpus-proportional, so hinting them
would pin a broadcast that OOMs at 100 TB (the r8 sf8.0 q5 lesson,
CHANGES_r8 §9d) — the engine picks the same BroadcastHashJoin at bench
scales and degrades gracefully to sort-merge beyond the threshold.
fact_claims partitions its output by state (`gold/fact_claims.py:99-104`)
and documents bucketing (``maintenance.write_bucketed``) as the declared
100-TB shuffle-free join path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    calendar_columns,
    count_if,
    lookup_case,
    norm_str,
    sum_if,
    surrogate_key,
    tier_case,
)
from ..scd2 import init_scd2

COVERAGE_NAMES = {
    "HO3": "Homeowners Special Form",
    "HO4": "Renters Insurance",
    "HO5": "Homeowners Comprehensive Form",
    "HO6": "Condo Insurance",
    "DP1": "Dwelling Fire Basic",
    "DP3": "Dwelling Fire Special",
    "FLOOD": "Flood Insurance",
    "WIND": "Windstorm Insurance",
}

COVERAGE_CATEGORY = {
    "HO3": "HOMEOWNER", "HO4": "TENANT", "HO5": "HOMEOWNER",
    "HO6": "CONDO", "DP1": "DWELLING", "DP3": "DWELLING",
    "FLOOD": "PERIL_SPECIFIC", "WIND": "PERIL_SPECIFIC",
}


def build_premium_summary(premiums: DataFrame) -> DataFrame:
    """Per-policy payment rollup (`gold/dim_policy.py:25-35` /
    `int_premium_summary.sql:10-22`) — conditional sums per status, late
    count, payment-lag average; one map-side-combinable shuffle."""
    late = F.col("payment_date") > F.col("due_date")
    lag = F.datediff("payment_date", "due_date")
    return premiums.groupBy("policy_id").agg(
        F.count("*").alias("payment_count"),
        sum_if(F.col("payment_status") == "COMPLETED", "amount")
            .alias("total_paid"),
        sum_if(F.col("payment_status") == "FAILED", "amount")
            .alias("total_failed"),
        sum_if(F.col("payment_status") == "PENDING", "amount")
            .alias("total_pending"),
        count_if(late).alias("late_payment_count"),
        F.min("payment_date").alias("first_payment_date"),
        F.max("payment_date").alias("last_payment_date"),
        F.avg(lag).alias("avg_payment_lag_days"),
    )


def build_dim_policy(policies: DataFrame, premium_summary: DataFrame,
                     as_of: str) -> DataFrame:
    """`gold/dim_policy.py:38-95` / `dim_policy.sql:13-53`: left join the
    premium summary, COALESCE defaults, status-category CASE, tenure
    datediff, md5 surrogate key, SCD2 columns.

    Hint discipline: premium_summary is policy-proportional (one row per
    paying policy), so it carries NO ``F.broadcast`` hint — the
    size-checked threshold path picks the same BroadcastHashJoin at
    bench scales and degrades to sort-merge at 100 TB instead of
    OOMing a pinned broadcast (CHANGES_r8 §9d)."""
    status_cat = (
        F.when(F.col("status") == "ACTIVE", "IN_FORCE")
         .when(F.col("status").isin("CANCELLED", "EXPIRED"), "TERMINATED")
         .when(F.col("status") == "PENDING", "PENDING")
         .otherwise("OTHER")
    )
    dim = (
        policies.join(premium_summary, "policy_id", "left")
        .select(
            surrogate_key("policy_id", "updated_at").alias("policy_sk"),
            "policy_id", "policyholder_name", "email", "property_id",
            "coverage_type_code", "effective_date", "expiration_date",
            "status",
            status_cat.alias("status_category"),
            "annual_premium", "deductible", "coverage_limit",
            "agent_id", "channel",
            F.coalesce("payment_count", F.lit(0).cast("long"))
                .alias("payment_count"),
            F.coalesce("total_paid", F.lit(0.0)).alias("total_paid"),
            F.coalesce("late_payment_count", F.lit(0).cast("long"))
                .alias("late_payment_count"),
            F.datediff("expiration_date", "effective_date")
                .alias("policy_term_days"),
            F.datediff(F.lit(as_of).cast("date"), F.col("effective_date"))
                .alias("days_in_force"),
            "updated_at",
        )
    )
    return init_scd2(dim, as_of)


def build_dim_property(properties: DataFrame, as_of: str) -> DataFrame:
    """`dim_property.sql:9-53`: age derivation + construction/flood/wind
    risk-tier CASEs + md5 SK."""
    construction_risk = tier_case("construction_type", [
        (("FRAME", "WOOD", "MANUFACTURED"), "HIGH"),
        (("MASONRY", "STEEL"), "MEDIUM"),
        (("CONCRETE",), "LOW"),
    ])
    flood_risk = tier_case("flood_zone", [
        (("V", "VE", "A", "AE"), "HIGH"),
        (("B", "X500"), "MEDIUM"),
        (("C", "X"), "LOW"),
    ])
    wind_risk = (
        F.when(F.col("wind_zone").isin("1", "2"), "HIGH")
         .when(F.col("wind_zone") == "3", "MEDIUM")
         .otherwise("LOW")
    )
    dim = properties.select(
        surrogate_key("property_id", "updated_at").alias("property_sk"),
        "property_id", "street_address", "city", "county", "state",
        "zip_code", "latitude", "longitude", "year_built",
        (F.year(F.lit(as_of).cast("date")) - F.col("year_built"))
            .alias("property_age_years"),
        "square_footage", "construction_type", "roof_type", "stories",
        "occupancy_type", "flood_zone", "wind_zone", "property_value",
        construction_risk.alias("construction_risk_tier"),
        flood_risk.alias("flood_risk_tier"),
        wind_risk.alias("wind_risk_tier"),
        "updated_at",
    )
    return init_scd2(dim, as_of)


def build_dim_coverage(policies: DataFrame) -> DataFrame:
    """`dim_coverage.sql:5-41`: DISTINCT codes + two simple-CASE lookups
    (the shared :func:`functions.lookup_case` builder)."""
    name_expr = lookup_case("coverage_type_code", COVERAGE_NAMES,
                            "Unknown Coverage")
    cat_expr = lookup_case("coverage_type_code", COVERAGE_CATEGORY, "OTHER")
    return (
        policies.select(norm_str("coverage_type_code")
                        .alias("coverage_type_code"))
        .distinct()
        .select(
            surrogate_key("coverage_type_code").alias("coverage_sk"),
            "coverage_type_code",
            name_expr.alias("coverage_name"),
            cat_expr.alias("coverage_category"),
        )
    )


def build_dim_date(spark: SparkSession, start: str = "2020-01-01",
                   end: str = "2030-12-31") -> DataFrame:
    """`dim_date.sql:5-43`: spine + calendar + season flags (the reference's
    2020→2030 range by default). Built from column expressions — no SQL
    string interpolation, so caller-supplied bounds need no quoting."""
    spine = spark.range(1).select(
        F.explode(F.sequence(F.lit(start).cast("date"),
                             F.lit(end).cast("date"),
                             F.expr("interval 1 day"))).alias("date_key"))
    cal = calendar_columns("date_key")
    return spine.select(
        surrogate_key("date_key").alias("date_sk"),
        F.col("date_key"),
        *[c.alias(n) for n, c in cal.items()],
    )


def build_fact_claims(claims: DataFrame, policies: DataFrame,
                      properties: DataFrame) -> DataFrame:
    """`gold/fact_claims.py:18-79`: inner join policies (enrichment J1) +
    left join properties (J2), LEAST cap, null-guarded ratio, day intervals,
    boolean flags. Policy/property sides are corpus-proportional: no
    broadcast hints (threshold path; CHANGES_r8 §9d). At 100 TB the
    declared shuffle-free path is bucketed silver tables — see
    ``maintenance.write_bucketed`` and tests/test_medallion.py's
    bucketed-join plan assert."""
    p = policies.select("policy_id", "property_id", "coverage_type_code",
                        "annual_premium", "deductible", "coverage_limit",
                        "agent_id")
    pr = properties.select("property_id", "state", "county",
                           "construction_type", "flood_zone")
    # Reference semantics exactly (`fact_claims.py:55-56`): the cap applies
    # to CLAIM amount vs coverage limit; the payout is raw approved −
    # deductible, so a NULL approved_amount yields a NULL payout (not a
    # coverage-limit-sized one — F.least skips NULLs, so capping approved
    # would turn an unadjudicated claim into a max-payout row).
    capped = F.least(F.col("claim_amount"), F.col("coverage_limit"))
    premium_guard = F.when(F.col("annual_premium") == 0, None) \
                     .otherwise(F.col("annual_premium"))
    return (
        claims.join(p, "policy_id", "inner")
        .join(pr, "property_id", "left")
        .select(
            surrogate_key("claim_id").alias("claim_sk"),
            "claim_id", "policy_id", "property_id",
            F.col("state").alias("property_state"),
            "county", "construction_type", "flood_zone",
            "coverage_type_code", "agent_id",
            "claim_date", "reported_date", "closed_date",
            "claim_type", "claim_status", "cause_of_loss",
            "claim_amount", "approved_amount", "deductible_applied",
            capped.alias("capped_claim_amount"),
            (F.col("approved_amount") - F.col("deductible_applied"))
                .alias("net_claim_payout"),
            (F.col("claim_amount") / premium_guard)
                .alias("claim_to_premium_ratio"),
            F.datediff("reported_date", "claim_date")
                .alias("days_to_report"),
            F.datediff("closed_date", "reported_date")
                .alias("days_to_close"),
            (F.col("claim_status").isin("APPROVED", "CLOSED")
             & (F.col("approved_amount") > 0)).alias("is_paid"),
            F.col("closed_date").isNotNull().alias("is_closed"),
            (F.col("claim_amount") > F.col("coverage_limit"))
                .alias("exceeds_coverage"),
        )
    )


def build_fact_claims_bucketed(spark: SparkSession, claims: DataFrame,
                               policies: DataFrame, properties: DataFrame,
                               n_buckets: int = 16,
                               table_prefix: str = "silver_bucketed_",
                               ) -> DataFrame:
    """The declared 100-TB path for fact_claims (SCALE.md trade-off #3):
    once policies outgrows the broadcast threshold, the plain build pays a
    full shuffle of BOTH sides of claims⋈policies on every gold rebuild.
    This variant persists the two join inputs bucketed (and bucket-sorted)
    by ``policy_id`` via :func:`..maintenance.write_bucketed` — the
    Redshift DISTKEY analog (`MIGRATION_PLAYBOOK.md:37`) — so the join
    runs exchange-free on co-located buckets: each rebuild reads the
    bucketed layout instead of re-shuffling the corpus. The properties
    join keys on ``property_id`` and stays on the size-checked threshold
    path. Plan-asserted by tests/test_medallion.py (zero
    ``Exchange hashpartitioning`` with broadcasts disabled)."""
    from ..maintenance import write_bucketed

    write_bucketed(claims, f"{table_prefix}claims", "policy_id",
                   n_buckets, sort_col="policy_id")
    write_bucketed(policies, f"{table_prefix}policies", "policy_id",
                   n_buckets, sort_col="policy_id")
    return build_fact_claims(spark.table(f"{table_prefix}claims"),
                             spark.table(f"{table_prefix}policies"),
                             properties)


def build_fact_claims_auto(spark: SparkSession, claims: DataFrame,
                           policies: DataFrame, properties: DataFrame,
                           n_buckets: int = 16,
                           table_prefix: str = "silver_bucketed_",
                           ) -> DataFrame:
    """Size-checked chooser between the plain and bucketed fact_claims
    builds (VERDICT r10 #5) — the measured SCALE.md #3 economics as an
    automatic policy instead of a doc the caller must read.

    Decision rule, same Catalyst-estimate pattern as the referential-
    integrity broadcast check (``quality._orphans``): when the POLICIES
    join input's optimizer size estimate fits the session broadcast
    budget, the claims⋈policies join is a BroadcastHashJoin — claims is
    never shuffled, so persisting a bucketed layout buys nothing and
    costs a table write (measured at 200k policies: plain 0.50 s vs
    bucketed 1.06 s). Past the budget every plain rebuild pays two
    ``Exchange hashpartitioning(policy_id`` shuffles, and the bucketed
    layout wins 1.29x at 6M policies / 1.45x at 12M with breakeven
    under 2 rebuilds at the larger point — at nightly-refresh cadence
    it pays for itself on the first re-run.

    An unavailable estimate falls back to the PLAIN build: it is the
    side-effect-free choice (bucketing persists two managed tables), and
    estimates are only unavailable for non-file relations where a silver
    layout decision does not apply anyway.
    """
    from ..quality import _estimated_plan_bytes, _session_broadcast_cap

    # Estimate the same projection the join consumes, not the full table:
    # column pruning reaches the scan, so the 7-column slice is what the
    # broadcast would actually hold.
    p = policies.select("policy_id", "property_id", "coverage_type_code",
                        "annual_premium", "deductible", "coverage_limit",
                        "agent_id")
    cap = _session_broadcast_cap(p)
    est = _estimated_plan_bytes(p)
    if est is None or (cap > 0 and est <= cap):
        return build_fact_claims(claims, policies, properties)
    return build_fact_claims_bucketed(spark, claims, policies, properties,
                                      n_buckets=n_buckets,
                                      table_prefix=table_prefix)


def build_fact_premiums(premiums: DataFrame,
                        policies: DataFrame) -> DataFrame:
    """`gold/fact_premiums.py:14-52`: left join pruned policy columns (P3),
    conditional measures, late flag + days_late."""
    p = policies.select("policy_id", "property_id", "coverage_type_code",
                        "channel", "agent_id")
    days_late = F.datediff("payment_date", "due_date")
    return (
        premiums.join(p, "policy_id", "left")
        .select(
            surrogate_key("premium_id").alias("premium_sk"),
            "premium_id", "policy_id", "property_id",
            "coverage_type_code", "channel", "agent_id",
            "payment_date", "due_date", "amount",
            "payment_method", "payment_status", "billing_period",
            F.when(F.col("payment_status") == "COMPLETED", F.col("amount"))
             .otherwise(F.lit(0).cast("decimal(12,2)"))
             .alias("collected_amount"),
            days_late.alias("days_late"),
            (days_late > 0).alias("is_late"),
            (F.col("payment_status") == "FAILED").alias("is_failed"),
        )
    )
