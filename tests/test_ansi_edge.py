"""Raw-edge ANSI cast hardening (CHANGES_r6 hostile-value lens).

The engine runs Spark 4's ANSI default, where a malformed raw value at a
silver typed cast — or a non-integer JSON scalar under
``events_json_props`` — aborts the WHOLE job (``CAST_INVALID_INPUT``)
instead of the reference's Spark-3 behavior (silent NULL). Pinned here:

1. every silver transform survives malformed dates/timestamps and
   NaN/Inf/out-of-range money under ANSI, yielding NULL like the
   reference;
2. unlike the reference, the failure is ACCOUNTED: ``_cast_errors``
   names exactly the source columns whose non-NULL raw value failed its
   cast (bronze's ``_corrupt_record`` discipline carried to silver);
3. legitimately-absent values (NULL raw, empty→null closed_date) are
   NOT flagged — corruption stays distinguishable from absence;
4. on clean rows the try_cast form is value-identical to the plain-cast
   form it replaced, and ``_cast_errors`` is NULL;
5. ``events_json_props`` drops an unparseable ``$.k`` through its
   existing NOT-NULL filter instead of aborting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark import schemas as S
from redshift_to_lakehouse_migration_spark.medallion import silver


def _raw(spark, schema, **overrides):
    cols = [f.name for f in schema.fields]
    row = {c: None for c in cols}
    row.update(overrides)
    return spark.createDataFrame([tuple(row[c] for c in cols)], schema)


def test_engine_session_is_ansi(spark):
    # the whole file proves ANSI survival — meaningless if ANSI is off
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_policies_malformed_values_survive_ansi_and_are_accounted(spark):
    df = _raw(
        spark, S.RAW_POLICIES,
        policy_id="P1", effective_date="2023-02-30",  # no Feb 30
        expiration_date="2024-01-01",
        annual_premium=float("nan"),
        deductible=123.45,
        coverage_limit=float("inf"),
        created_at="not a time",
        updated_at="2023-01-01 00:00:00",
    )
    out = silver.transform_policies(df).collect()  # must NOT raise
    assert len(out) == 1
    r = out[0]
    assert r.effective_date is None
    assert r.expiration_date is not None
    assert r.annual_premium is None
    assert float(r.deductible) == 123.45
    assert r.coverage_limit is None
    assert r.created_at is None
    assert r.updated_at is not None
    assert r._cast_errors == \
        "effective_date,annual_premium,coverage_limit,created_at"


def test_claims_empty_closed_date_is_absence_not_corruption(spark):
    df = _raw(
        spark, S.RAW_CLAIMS,
        claim_id="C1", policy_id="P1", claim_amount=10.0,
        claim_date="2023-01-01", reported_date="2023-01-02",
        closed_date="",  # reference empty→null semantics
    )
    r = silver.transform_claims(df).collect()[0]
    assert r.closed_date is None
    assert r._cast_errors is None


def test_claims_out_of_range_money_flagged_not_fatal(spark):
    # 1e11 exceeds decimal(12,2)'s 10-digit integral range; passes the
    # claim_amount >= 0 gate, so it reaches the cast
    df = _raw(
        spark, S.RAW_CLAIMS,
        claim_id="C1", policy_id="P1", claim_amount=1.0e11,
        claim_date="garbage",
    )
    r = silver.transform_claims(df).collect()[0]
    assert r.claim_amount is None
    assert r.claim_date is None
    assert r._cast_errors == "claim_date,claim_amount"


def test_premiums_and_properties_accounting(spark):
    p = _raw(spark, S.RAW_PREMIUMS,
             premium_id="M1", policy_id="P1", amount=50.0,
             payment_date="13/01/2023", due_date="2023-01-31")
    r = silver.transform_premiums(p).collect()[0]
    assert r.payment_date is None and r.due_date is not None
    assert r._cast_errors == "payment_date"

    q = _raw(spark, S.RAW_PROPERTIES,
             property_id="PR1", latitude=91.5, longitude=1000.0,
             property_value=2.5e5, created_at="2023-01-01 00:00:00")
    r = silver.transform_properties(q).collect()[0]
    # 1000.0 overflows decimal(10,7)'s 3 integral digits; 91.5 fits
    assert float(r.latitude) == 91.5
    assert r.longitude is None
    assert r._cast_errors == "longitude"


def test_clean_rows_unflagged_and_value_identical_to_plain_cast(spark):
    df = _raw(
        spark, S.RAW_POLICIES,
        policy_id="P1", policyholder_first_name=" Ann ",
        policyholder_last_name="Lee", policyholder_email="A@B.COM",
        effective_date="2023-01-01", expiration_date="2024-01-01",
        annual_premium=1234.567, deductible=500.0, coverage_limit=1e6,
        status="active", created_at="2023-01-01 10:00:00",
        updated_at="2023-06-01 10:00:00",
    )
    r = silver.transform_policies(df).collect()[0]
    assert r._cast_errors is None
    # the try_cast form must round/type exactly like the cast it replaced
    ref = df.select(
        F.col("effective_date").cast("date").alias("d"),
        F.col("annual_premium").cast("decimal(12,2)").alias("m"),
        F.col("created_at").cast("timestamp").alias("t"),
    ).collect()[0]
    assert r.effective_date == ref.d
    assert r.annual_premium == ref.m
    assert r.created_at == ref.t


def test_silver_dq_suite_unaffected_by_accounting_column(spark):
    df = _raw(
        spark, S.RAW_POLICIES,
        policy_id="P1", effective_date="2023-01-01",
        expiration_date="2024-01-01", annual_premium=10.0,
        status="ACTIVE", policyholder_email="a@b.com",
        created_at="2023-01-01 00:00:00", updated_at="2023-01-01 00:00:00",
    )
    results = silver.validate_policies(silver.transform_policies(df))
    assert all(r.passed for r in results)


def test_json_props_hostile_scalar_dropped_not_fatal(spark, tmp_path):
    from redshift_to_lakehouse_migration_spark.queries.events import (
        events_json_props,
    )
    rows = [
        (1, "click", '{"k": 7}'),
        (2, "click", '{"k": "abc"}'),      # non-integer scalar
        (3, "view", '{"k": 2.5}'),         # integral-only cast → NULL
        (4, "view", "not json at all"),
        (5, "view", None),
        (6, "click", '{"k": 17}'),
    ]
    spark.createDataFrame(
        rows, "event_id long, event_type string, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = events_json_props(spark, str(tmp_path)).collect()
    got = {(r.event_type, r.k_bucket): (r.n, r.min_k, r.max_k) for r in out}
    assert got == {("click", 7): (2, 7, 17)}


def test_cast_errors_route_to_quarantine(spark):
    """The full raw→silver→quarantine path for a cast-corrupt row: the
    engine's `cast_clean` check splits it out with its failed-column
    names intact, while clean rows flow on without the lineage column."""
    from redshift_to_lakehouse_migration_spark import quality as q

    good = dict(policy_id="P1", effective_date="2023-01-01",
                expiration_date="2024-01-01", annual_premium=10.0,
                status="ACTIVE",
                created_at="2023-01-01 00:00:00",
                updated_at="2023-01-01 00:00:00")
    bad = dict(good, policy_id="P2", effective_date="2023-02-30")
    cols = [f.name for f in S.RAW_POLICIES.fields]

    def tup(d):
        row = {c: None for c in cols}
        row.update(d)
        return tuple(row[c] for c in cols)

    df = spark.createDataFrame([tup(good), tup(bad)], S.RAW_POLICIES)
    out = silver.transform_policies(df)
    clean, bad_rows = q.quarantine(out, [q.cast_clean()])
    assert [r.policy_id for r in clean.collect()] == ["P1"]
    quarantined = bad_rows.collect()
    assert len(quarantined) == 1
    assert quarantined[0].policy_id == "P2"
    assert quarantined[0]._failed_checks == ["cast_clean"]
    assert quarantined[0]._cast_errors == "effective_date"


def test_read_time_corruption_survives_into_silver_accounting(spark,
                                                              tmp_path):
    """The bronze→silver seam: a CSV row the reader shredded (non-numeric
    annual_premium; raw line in ``_corrupt_record``, salvaged policy_id
    intact) must NOT enter silver as a clean row — its ``_cast_errors``
    carries ``_corrupt_record`` so the same `cast_clean` quarantine split
    catches read-time AND cast-time corruption."""
    from redshift_to_lakehouse_migration_spark import quality as q
    from redshift_to_lakehouse_migration_spark.medallion import bronze

    cols = [f.name for f in S.RAW_POLICIES.fields]
    clean = {c: "" for c in cols}
    clean.update(policy_id="P1", effective_date="2023-01-01",
                 expiration_date="2024-01-01", annual_premium="100.0",
                 deductible="50", coverage_limit="1000",
                 status="ACTIVE", created_at="2023-01-01 00:00:00",
                 updated_at="2023-01-01 00:00:00")
    shredded = dict(clean, policy_id="P2", annual_premium="NOT_A_NUMBER")
    csv = tmp_path / "raw_policies.csv"
    csv.write_text(",".join(cols) + "\n"
                   + ",".join(clean[c] for c in cols) + "\n"
                   + ",".join(shredded[c] for c in cols) + "\n")

    target = str(tmp_path / "bronze_policies")
    bronze.ingest_batch(spark, str(csv), S.RAW_POLICIES, target, batch_id=1)
    out = silver.transform_policies(spark.read.parquet(target))

    flagged = {r.policy_id: r._cast_errors for r in out.collect()}
    assert flagged["P1"] is None
    assert flagged["P2"] is not None
    assert "_corrupt_record" in flagged["P2"]

    clean_rows, bad_rows = q.quarantine(out, [q.cast_clean()])
    assert [r.policy_id for r in clean_rows.collect()] == ["P1"]
    assert [r.policy_id for r in bad_rows.collect()] == ["P2"]


def test_zero_revenue_region_yields_null_share_not_abort(spark, tmp_path):
    """A region whose revenue nets to exactly zero (refund-canceling
    order totals) makes the ratio-to-report share undefined. DuckDB and
    Spark 3 both say NULL; under the engine's ANSI default a plain
    division would abort the whole query on that one region. Pins the
    try_divide guard in nation_market_share."""
    from decimal import Decimal

    from redshift_to_lakehouse_migration_spark.queries.analytics import (
        nation_market_share,
    )

    spark.createDataFrame(
        [(0, "ZERO-LAND"), (1, "NORMAL")],
        "r_regionkey int, r_name string",
    ).write.parquet(str(tmp_path / "region.parquet"))
    spark.createDataFrame(
        [(10, "PROFITIA", 0), (12, "REFUNDIA", 0), (11, "SOLVENTIA", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(100, 10), (101, 12), (102, 11)],
        "c_custkey int, c_nationkey int",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 100, 500.0), (2, 101, -500.0),  # region nets to zero
         (3, 102, 250.0)],
        "o_orderkey int, o_custkey int, o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    rows = {r.nation: r for r in
            nation_market_share(spark, str(tmp_path)).collect()}
    assert rows["SOLVENTIA"].share_bps == 10000
    # PROFITIA earned 500 inside a region netting to zero: the share is
    # genuinely undefined (nonzero / zero) — NULL, not a job abort
    assert rows["PROFITIA"].nation_revenue == 500.0
    assert rows["PROFITIA"].region_revenue == 0.0
    assert rows["PROFITIA"].share_bps is None
    assert rows["REFUNDIA"].share_bps is None
