"""Randomized differential for the MEDALLION / recon / SCD2 surface.

The r6 differentials cover the 89 oracle pairs and the text surface; the
pipeline surfaces (bronze→silver→gold parity, reconciliation, SCD2
merge, quarantine routing) still ran on fixed fixtures — this suite
closes that gap (VERDICT r6 #4).  A seeded HOSTILE raw-CSV generator
(malformed dates/timestamps, NaN/Inf/overflow money, whitespace-padded
ids, out-of-vocab statuses, corrupt CSV fields, orphan foreign keys,
space-only values) feeds the real `build_medallion_pipeline`, and every
layer is asserted against an INDEPENDENTLY computed expectation:

- bronze→silver: a pure-Python twin of the cleaning semantics, built
  from per-value outcome POOLS.  Each pool entry declares the Spark
  outcome pinned by a one-off empirical probe (CHANGES_r7 §6): CSV
  PERMISSIVE salvage keeps well-formed fields of a corrupt row and nulls
  only the malformed one; NaN/±Infinity parse as doubles (no corrupt
  flag) and die at the silver decimal try_cast; Spark NaN compares
  GREATER than any number (so a NaN claim_amount PASSES `>= 0`);
  try_cast trims and accepts single-digit date components.
- silver→gold: full-row DuckDB SQL twins over the materialized silver
  parquet (surrogate md5 keys, LEAST caps, conditional decimal sums,
  datediffs, risk tiers, SCD2 init columns).
- recon + quarantine + SCD2 merge: outcome-level expectations computed
  in Python/DuckDB from the same materialized inputs.

Everything runs at two independent seeds.  A failure here means the
medallion layer would mis-clean, mis-aggregate, or mis-account a corpus
with these (entirely plausible) raw-edge properties.
"""

from __future__ import annotations

import csv
import math
import random
from datetime import date, datetime
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark import quality as q
from redshift_to_lakehouse_migration_spark import schemas as S
from redshift_to_lakehouse_migration_spark.medallion.flow import (
    build_medallion_pipeline,
)

import os

# Default two independent draws per run; a SWEEP overrides via
# SPARK_GRAFT_DIFF_SEEDS="s1,s2,..." (tools/seed sweeps hunt the rarer
# divergences the fixed pair can't hit; the default stays deterministic
# for CI).
_ENV_SEEDS = tuple(int(s) for s in
                   os.environ.get("SPARK_GRAFT_DIFF_SEEDS", "").split(",")
                   if s.strip())
SEEDS = _ENV_SEEDS or (20260818, 20260819)
AS_OF = "2024-06-01"

ERR = "ERR"  # raw value non-NULL but its typed cast fails -> _cast_errors


def _d(s):
    return date.fromisoformat(s)


def _ts(s):
    return datetime.fromisoformat(s)


def _dec(s):
    return Decimal(s).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


# --- value pools: (csv_text, expected_typed) ------------------------------
# expected_typed: the value silver must produce, None (clean NULL), or ERR.
# Every entry's Spark outcome was pinned by direct probe (see module doc).

DATES = [
    ("2023-03-15", _d("2023-03-15")),
    ("2023-1-5", _d("2023-01-05")),        # single-digit components OK
    (" 2023-03-15 ", _d("2023-03-15")),    # cast trims
    ("2023-03-15T10:00:00", _d("2023-03-15")),
    ("0001-01-01", _d("0001-01-01")),
    ("2023-02-30", ERR),                   # nonexistent day
    ("15/03/2023", ERR),                   # wrong format
    ("2023-13-01", ERR),                   # nonexistent month
    ("20230315", ERR),                     # no separators
    (" ", ERR),                            # space-only: non-NULL raw, bad cast
    ("", None),                            # CSV empty -> NULL raw, no error
]

TSS = [
    ("2023-01-01 10:00:00", _ts("2023-01-01 10:00:00")),
    ("2023-01-01T10:00:00", _ts("2023-01-01 10:00:00")),
    ("2023-01-01", _ts("2023-01-01 00:00:00")),
    ("not-a-ts", ERR),
    ("2023-01-01 25:00:00", ERR),
    ("", None),
]

# RAW money columns are DOUBLE (CSV-parsed); silver casts to DECIMAL.
# (csv_text, parsed_double, expected_decimal)
MONEYS = [
    ("1234.56", 1234.56, _dec("1234.56")),
    ("-50.25", -50.25, _dec("-50.25")),
    ("0.125", 0.125, _dec("0.13")),        # double->decimal HALF_UP
    ("9999999999.99", 9999999999.99, _dec("9999999999.99")),
    ("NaN", float("nan"), ERR),            # parses as double, dies at cast
    ("Infinity", float("inf"), ERR),
    ("10000000000000.0", 1e13, ERR),       # overflows decimal(12,2)
    ("", None, None),
]

# latitude/longitude cast to DECIMAL(10,7): max ±999.9999999, so values
# that are fine for money overflow here — own pool with own outcomes
LATLON = [
    ("25.7617", 25.7617, Decimal("25.7617")),
    ("-80.1918", -80.1918, Decimal("-80.1918")),
    ("91.5", 91.5, Decimal("91.5")),
    ("1234.56", 1234.56, ERR),             # overflows (10,7)
    ("NaN", float("nan"), ERR),
    ("", None, None),
]

STATUSES_POL = [("active", "ACTIVE"), (" Cancelled ", "CANCELLED"),
                ("PENDING", "PENDING"), ("bogus", "BOGUS"), ("", None)]
STATUSES_CLM = [("open", "OPEN"), (" Closed ", "CLOSED"),
                ("APPROVED", "APPROVED"), ("weird", "WEIRD"), ("", None)]
STATUSES_PAY = [("completed", "COMPLETED"), (" Failed ", "FAILED"),
                ("PENDING", "PENDING"), ("", None)]


def _pick(rng, pool):
    return pool[rng.randrange(len(pool))]


def _gen(seed: int, out_dir: str):
    """Write the four hostile raw CSVs; return per-table row models.

    Each model row is a dict: csv -> {col: text}, raw -> {col: parsed
    value as bronze sees it}, exp -> {col: expected silver typed value or
    ERR}, corrupt -> bool (a planted malformed DOUBLE field: PERMISSIVE
    nulls that field and sets _corrupt_record, keeping the rest).
    """
    rng = random.Random(seed)
    n_pol, n_prop, n_clm, n_prm = 150, 110, 200, 280

    def date_cell(row, col, p=0.35):
        t, e = _pick(rng, DATES) if rng.random() < p else ("2023-03-15",
                                                           _d("2023-03-15"))
        row["csv"][col] = t
        row["raw"][col] = t if t != "" else None
        row["exp"][col] = e

    def ts_cell(row, col, p=0.3):
        t, e = _pick(rng, TSS) if rng.random() < p else (
            "2023-01-01 10:00:00", _ts("2023-01-01 10:00:00"))
        row["csv"][col] = t
        row["raw"][col] = t if t != "" else None
        row["exp"][col] = e

    def money_cell(row, col, p=0.3, corrupt_p=0.03):
        if rng.random() < corrupt_p:
            # malformed double field: PERMISSIVE nulls it + flags the row
            row["csv"][col] = "xx"
            row["raw"][col] = None
            row["exp"][col] = None
            row["corrupt"] = True
            return
        t, dv, e = _pick(rng, MONEYS) if rng.random() < p else (
            "100.00", 100.0, _dec("100.00"))
        row["csv"][col] = t
        row["raw"][col] = dv if t != "" else None
        row["exp"][col] = e

    def str_cell(row, col, pool):
        t, e = _pick(rng, pool)
        row["csv"][col] = t
        row["raw"][col] = t if t != "" else None
        row["exp"][col] = e

    def latlon_cell(row, col):
        t, dv, e = _pick(rng, LATLON) if rng.random() < 0.5 else (
            "25.7617", 25.7617, Decimal("25.7617"))
        row["csv"][col] = t
        row["raw"][col] = dv if t != "" else None
        row["exp"][col] = e

    def new_row(schema):
        return {"csv": {c: "" for c in schema.fieldNames()},
                "raw": {c: None for c in schema.fieldNames()},
                "exp": {}, "corrupt": False}

    policies = []
    for i in range(n_pol):
        r = new_row(S.RAW_POLICIES)
        pid = rng.choice([f"POL-{i:05d}", f" POL-{i:05d} ", "", " "])
        r["csv"]["policy_id"] = pid
        r["raw"]["policy_id"] = pid or None
        r["exp"]["policy_id"] = pid.strip(" ") or None
        r["csv"]["policyholder_first_name"] = fn = rng.choice(
            ["John", " Ann ", "", "O'Brien, Jr"])
        r["exp"]["first_name"] = fn.strip(" ") or None
        r["csv"]["policyholder_last_name"] = ln = rng.choice(
            ["Smith", " Lee", ""])
        r["exp"]["last_name"] = ln.strip(" ") or None
        parts = [x for x in (fn.strip(" ") or None, ln.strip(" ") or None)
                 if x is not None]
        r["exp"]["policyholder_name"] = " ".join(parts)
        r["csv"]["policyholder_email"] = em = rng.choice(
            ["J@X.com", " Ann@Y.COM ", ""])
        r["exp"]["email"] = em.strip(" ").lower() or None
        r["csv"]["property_id"] = pr = rng.choice(
            [f"PR-{rng.randrange(n_prop):05d}", "PR-ORPHAN", ""])
        r["exp"]["property_id"] = pr or None
        r["csv"]["coverage_type_code"] = cv = rng.choice(
            ["ho3", " HO5 ", "DP1", "zz9", ""])
        r["exp"]["coverage_type_code"] = cv.strip(" ").upper() or None
        date_cell(r, "effective_date")
        date_cell(r, "expiration_date")
        str_cell(r, "status", STATUSES_POL)
        money_cell(r, "annual_premium")
        money_cell(r, "deductible")
        money_cell(r, "coverage_limit")
        r["csv"]["agent_id"] = ag = rng.choice(["AG-1", " AG-2 ", ""])
        r["exp"]["agent_id"] = ag.strip(" ") or None
        r["csv"]["channel"] = ch = rng.choice(["online", " Agent ", ""])
        r["exp"]["channel"] = ch.strip(" ").upper() or None
        ts_cell(r, "created_at")
        ts_cell(r, "updated_at")
        policies.append(r)

    properties = []
    for i in range(n_prop):
        r = new_row(S.RAW_PROPERTIES)
        pid = rng.choice([f"PR-{i:05d}", f" PR-{i:05d} ", ""])
        r["csv"]["property_id"] = pid
        r["raw"]["property_id"] = pid or None
        r["exp"]["property_id"] = pid.strip(" ") or None
        r["csv"]["street_address"] = "1 Main St, Apt 2"
        r["exp"]["street_address"] = "1 Main St, Apt 2"
        r["csv"]["city"] = " Miami "
        r["exp"]["city"] = "Miami"
        r["csv"]["county"] = "Dade"
        r["exp"]["county"] = "Dade"
        r["csv"]["state"] = st = rng.choice(["fl", " TX ", "zz", ""])
        r["exp"]["state"] = st.strip(" ").upper() or None
        r["csv"]["zip_code"] = "00123"
        r["exp"]["zip_code"] = "00123"
        latlon_cell(r, "latitude")
        latlon_cell(r, "longitude")
        yb = rng.choice(["1990", "2005", ""])
        r["csv"]["year_built"] = yb
        r["exp"]["year_built"] = int(yb) if yb else None
        sf = rng.choice(["1500", ""])
        r["csv"]["square_footage"] = sf
        r["exp"]["square_footage"] = int(sf) if sf else None
        r["csv"]["construction_type"] = ct = rng.choice(
            ["frame", " CONCRETE ", "MASONRY", "odd", ""])
        r["exp"]["construction_type"] = ct.strip(" ").upper() or None
        r["csv"]["roof_type"] = "SHINGLE"
        r["exp"]["roof_type"] = "SHINGLE"
        r["csv"]["stories"] = "2"
        r["exp"]["stories"] = 2
        r["csv"]["occupancy_type"] = "owner"
        r["exp"]["occupancy_type"] = "OWNER"
        r["csv"]["flood_zone"] = fz = rng.choice(["ae", " X ", "B", ""])
        r["exp"]["flood_zone"] = fz.strip(" ").upper() or None
        r["csv"]["wind_zone"] = wz = rng.choice(["1", "3", "9", ""])
        r["exp"]["wind_zone"] = wz or None
        money_cell(r, "property_value")
        ts_cell(r, "created_at")
        ts_cell(r, "updated_at")
        properties.append(r)

    claims = []
    for i in range(n_clm):
        r = new_row(S.RAW_CLAIMS)
        cid = rng.choice([f"CLM-{i:05d}", f" CLM-{i:05d} ", ""])
        r["csv"]["claim_id"] = cid
        r["raw"]["claim_id"] = cid or None
        r["exp"]["claim_id"] = cid.strip(" ") or None
        # ~12% orphan policy keys (fact_claims inner join must drop them)
        pid = (f"POL-{rng.randrange(n_pol):05d}"
               if rng.random() > 0.12 else "POL-GHOST")
        r["csv"]["policy_id"] = pid
        r["raw"]["policy_id"] = pid
        r["exp"]["policy_id"] = pid
        date_cell(r, "claim_date")
        date_cell(r, "reported_date")
        # closed_date goes through empty_to_null: space-only -> clean NULL
        t, e = _pick(rng, DATES + [(" ", None), ("  ", None)]) \
            if rng.random() < 0.5 else ("2023-04-01", _d("2023-04-01"))
        if t.strip(" ") == "":
            e = None                      # empty_to_null: no error either
        r["csv"]["closed_date"] = t
        r["raw"]["closed_date"] = t if t != "" else None
        r["exp"]["closed_date"] = e
        r["csv"]["claim_type"] = cty = rng.choice(["fire", " THEFT ", "odd"])
        r["exp"]["claim_type"] = cty.strip(" ").upper()
        str_cell(r, "claim_status", STATUSES_CLM)
        # claim_amount drives the `>= 0` filter: Spark NaN >= 0 is TRUE
        money_cell(r, "claim_amount", corrupt_p=0.0)
        money_cell(r, "approved_amount")
        money_cell(r, "deductible_applied")
        r["csv"]["adjuster_id"] = "ADJ-1"
        r["exp"]["adjuster_id"] = "ADJ-1"
        r["csv"]["cause_of_loss"] = "storm"
        r["exp"]["cause_of_loss"] = "STORM"
        # no embedded double-quotes: the flow's bronze reads the DEFAULT
        # (backslash-escape) dialect, and csv.writer emits RFC-4180
        # doubled quotes — the documented dialect boundary, not a defect
        r["csv"]["description"] = de = rng.choice(
            ["has, commas", "plain text", "x", ""])
        r["exp"]["description"] = de or None
        ts_cell(r, "created_at")
        ts_cell(r, "updated_at")
        claims.append(r)

    premiums = []
    for i in range(n_prm):
        r = new_row(S.RAW_PREMIUMS)
        mid = rng.choice([f"PRM-{i:05d}", f" PRM-{i:05d} ", ""])
        r["csv"]["premium_id"] = mid
        r["raw"]["premium_id"] = mid or None
        r["exp"]["premium_id"] = mid.strip(" ") or None
        pid = (f"POL-{rng.randrange(n_pol):05d}"
               if rng.random() > 0.1 else "POL-GHOST")
        r["csv"]["policy_id"] = pid
        r["raw"]["policy_id"] = pid
        r["exp"]["policy_id"] = pid
        date_cell(r, "payment_date")
        date_cell(r, "due_date")
        # amount drives the `> 0` filter (NaN > 0 is TRUE in Spark)
        money_cell(r, "amount", corrupt_p=0.02)
        r["csv"]["payment_method"] = "card"
        r["exp"]["payment_method"] = "CARD"
        str_cell(r, "payment_status", STATUSES_PAY)
        r["csv"]["billing_period"] = "monthly"
        r["exp"]["billing_period"] = "MONTHLY"
        date_cell(r, "period_start_date", p=0.2)
        date_cell(r, "period_end_date", p=0.2)
        ts_cell(r, "created_at")
        premiums.append(r)

    for name, schema, rows in (("policies", S.RAW_POLICIES, policies),
                               ("properties", S.RAW_PROPERTIES, properties),
                               ("claims", S.RAW_CLAIMS, claims),
                               ("premiums", S.RAW_PREMIUMS, premiums)):
        with open(f"{out_dir}/raw_{name}.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=schema.fieldNames())
            w.writeheader()
            w.writerows([r["csv"] for r in rows])
    return {"policies": policies, "properties": properties,
            "claims": claims, "premiums": premiums}


# --- pure-Python silver expectations --------------------------------------

def _errs(row, cols):
    names = (["_corrupt_record"] if row["corrupt"] else []) + [
        c for c in cols
        if row["exp"].get(c) == ERR]
    return ",".join(names) or None


def _finish_exp(row, cols):
    out = {c: (None if row["exp"].get(c) == ERR else row["exp"].get(c))
           for c in cols}
    return out


POL_CAST_COLS = ["effective_date", "expiration_date", "annual_premium",
                 "deductible", "coverage_limit", "created_at", "updated_at"]
CLM_CAST_COLS = ["claim_date", "reported_date", "closed_date",
                 "claim_amount", "approved_amount", "deductible_applied",
                 "created_at", "updated_at"]
PRM_CAST_COLS = ["payment_date", "due_date", "amount", "period_start_date",
                 "period_end_date", "created_at"]
PRP_CAST_COLS = ["latitude", "longitude", "property_value", "created_at",
                 "updated_at"]


def expect_silver(models):
    pol, clm, prm, prp = [], [], [], []
    for r in models["policies"]:
        pid = r["exp"]["policy_id"]
        if pid is None or r["raw"]["effective_date"] is None:
            continue
        e = _finish_exp(r, ["policy_id", "first_name", "last_name",
                            "policyholder_name", "email", "property_id",
                            "coverage_type_code", "effective_date",
                            "expiration_date", "status", "annual_premium",
                            "deductible", "coverage_limit", "agent_id",
                            "channel", "created_at", "updated_at"])
        e["_cast_errors"] = _errs(r, POL_CAST_COLS)
        pol.append(e)
    for r in models["claims"]:
        amt = r["raw"]["claim_amount"]
        if (r["exp"]["claim_id"] is None or r["exp"]["policy_id"] is None
                or amt is None
                or (not math.isnan(amt) and amt < 0)):
            continue  # Spark: NaN >= 0 is TRUE, so NaN rows SURVIVE
        e = _finish_exp(r, ["claim_id", "policy_id", "claim_date",
                            "reported_date", "closed_date", "claim_type",
                            "claim_status", "claim_amount",
                            "approved_amount", "deductible_applied",
                            "adjuster_id", "cause_of_loss", "description",
                            "created_at", "updated_at"])
        e["_cast_errors"] = _errs(r, CLM_CAST_COLS)
        clm.append(e)
    for r in models["premiums"]:
        amt = r["raw"]["amount"]
        if (r["exp"]["premium_id"] is None or r["exp"]["policy_id"] is None
                or amt is None or (not math.isnan(amt) and amt <= 0)):
            continue
        e = _finish_exp(r, ["premium_id", "policy_id", "payment_date",
                            "due_date", "amount", "payment_method",
                            "payment_status", "billing_period",
                            "period_start_date", "period_end_date",
                            "created_at"])
        e["_cast_errors"] = _errs(r, PRM_CAST_COLS)
        prm.append(e)
    for r in models["properties"]:
        if r["exp"]["property_id"] is None:
            continue
        e = _finish_exp(r, ["property_id", "street_address", "city",
                            "county", "state", "zip_code", "latitude",
                            "longitude", "year_built", "square_footage",
                            "construction_type", "roof_type", "stories",
                            "occupancy_type", "flood_zone", "wind_zone",
                            "property_value", "created_at", "updated_at"])
        e["_cast_errors"] = _errs(r, PRP_CAST_COLS)
        prp.append(e)
    return {"silver_policies": pol, "silver_claims": clm,
            "silver_premiums": prm, "silver_properties": prp}


# --- fixtures -------------------------------------------------------------

@pytest.fixture(scope="module", params=SEEDS)
def hostile_run(request, spark, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"hostile_raw_{request.param}")
    models = _gen(request.param, str(d))
    wh = tmp_path_factory.mktemp(f"hostile_wh_{request.param}")
    pipe = build_medallion_pipeline(spark, d, wh, AS_OF)
    outputs, _ = pipe.run()
    # materialize silver for the DuckDB gold twins
    silver_dir = tmp_path_factory.mktemp(f"hostile_silver_{request.param}")
    for t in ("silver_policies", "silver_claims", "silver_premiums",
              "silver_properties"):
        outputs[t].write.mode("overwrite").parquet(str(silver_dir / t))
    return models, outputs, silver_dir


@pytest.fixture(scope="module")
def silver_con(hostile_run):
    _, _, silver_dir = hostile_run
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in ("silver_policies", "silver_claims", "silver_premiums",
              "silver_properties"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{silver_dir}/{t}/*.parquet'")
    return con


ID_COLS = {"silver_policies": "policy_id", "silver_claims": "claim_id",
           "silver_premiums": "premium_id", "silver_properties":
           "property_id"}


def _collect_tz_safe(df, cols):
    """Collect with TIMESTAMP columns rendered as session-UTC NTZ so the
    comparison is invariant under the HOST timezone (the known LTZ
    collect trap, `functions.utc_ntz`)."""
    sel = []
    for c, t in df.dtypes:
        if c not in cols:
            continue
        sel.append(F.col(c).cast("timestamp_ntz").alias(c)
                   if t == "timestamp" else F.col(c))
    return df.select(*sel).collect()


# --- bronze + silver vs the Python twin -----------------------------------

def test_bronze_counts_and_corruption(hostile_run):
    models, outputs, _ = hostile_run
    for t in ("policies", "claims", "premiums", "properties"):
        b = outputs[f"bronze_{t}"]
        assert b.count() == len(models[t]), t
        expected_corrupt = sum(1 for r in models[t] if r["corrupt"])
        got = b.filter("_corrupt_record IS NOT NULL").count()
        assert got == expected_corrupt, t


@pytest.mark.parametrize("table", sorted(ID_COLS))
def test_silver_rows_match_python_twin(table, hostile_run):
    models, outputs, _ = hostile_run
    exp_rows = expect_silver(models)[table]
    df = outputs[table]
    cols = [c for c in df.columns if c != "_cleaned_timestamp"]
    got = [r.asDict() for r in _collect_tz_safe(df, cols)]
    key = ID_COLS[table]
    got.sort(key=lambda r: (r[key] is None, r[key]))
    exp_rows = sorted(exp_rows, key=lambda r: (r[key] is None, r[key]))
    assert len(got) == len(exp_rows), (table, len(got), len(exp_rows))
    for g, e in zip(got, exp_rows):
        for c in cols:
            gv, ev = g[c], e[c]
            if isinstance(gv, float) and isinstance(ev, float):
                assert gv == pytest.approx(ev, rel=1e-12), (table, g[key], c)
            else:
                assert gv == ev, (table, g[key], c, gv, ev)


def test_quarantine_routes_expected_rows(hostile_run):
    """quality.cast_clean + quarantine: the split must quarantine exactly
    the rows whose Python-twin _cast_errors is non-NULL."""
    models, outputs, _ = hostile_run
    exp = expect_silver(models)
    for table in ID_COLS:
        bad_expected = {r[ID_COLS[table]] for r in exp[table]
                        if r["_cast_errors"]}
        clean, bad = q.quarantine(outputs[table], [q.cast_clean()])
        got_bad = {r[0] for r in bad.select(ID_COLS[table]).collect()}
        assert got_bad == bad_expected, table
        assert clean.count() == len(exp[table]) - len(bad_expected), table
        checks = q.run_checks(outputs[table], [q.cast_clean()])
        assert checks[0].failed_count == len(bad_expected), table


# --- gold vs DuckDB twins over materialized silver ------------------------

def _rows_match(s_rows, d_rows, float_idx=()):
    assert len(s_rows) == len(d_rows)
    for s, d in zip(s_rows, d_rows):
        assert len(s) == len(d)
        for i, (a, b) in enumerate(zip(s, d)):
            if i in float_idx and a is not None and b is not None:
                assert float(a) == pytest.approx(float(b), rel=1e-9), (s, d, i)
            else:
                assert a == b, (i, a, b)


SK = "md5(concat_ws('|', {parts}))"


def _sk(*cols):
    parts = ", ".join(
        f"COALESCE(CAST({c} AS VARCHAR), '_null_')" for c in cols)
    return SK.format(parts=parts)


def test_fact_claims_matches_duckdb_twin(hostile_run, silver_con):
    _, outputs, _ = hostile_run
    fc = outputs["fact_claims"]
    cols = fc.columns
    s_rows = [tuple(r) for r in _collect_tz_safe(fc, cols)]
    s_rows.sort(key=lambda r: (r[1] is None, r[1]))
    ratio_idx = cols.index("claim_to_premium_ratio")
    d_rows = silver_con.sql(f"""
        -- property_state comes LAST: the flow publishes fact_claims
        -- partitioned by it, and the parquet read-back moves the
        -- partition column to the end of the schema
        SELECT {_sk('c.claim_id')} AS claim_sk,
               c.claim_id, c.policy_id, p.property_id,
               pr.county, pr.construction_type,
               pr.flood_zone, p.coverage_type_code, p.agent_id,
               c.claim_date, c.reported_date, c.closed_date, c.claim_type,
               c.claim_status, c.cause_of_loss, c.claim_amount,
               c.approved_amount, c.deductible_applied,
               -- explicit DECIMAL(14,2): Spark's least() unifies to the
               -- wider decimal; DuckDB's LEAST over mixed scales falls
               -- back to DOUBLE without the cast
               LEAST(c.claim_amount::DECIMAL(14,2), p.coverage_limit)
                   ::DECIMAL(14,2) AS capped_claim_amount,
               c.approved_amount - c.deductible_applied AS net_claim_payout,
               c.claim_amount::DOUBLE
                   / NULLIF(p.annual_premium, 0)::DOUBLE
                   AS claim_to_premium_ratio,
               date_diff('day', c.claim_date, c.reported_date)
                   AS days_to_report,
               date_diff('day', c.reported_date, c.closed_date)
                   AS days_to_close,
               -- three-valued on purpose: Spark's isin(...) & (x > 0)
               -- and DuckDB's IN/AND share Kleene logic, so NULL rows
               -- compare NULL==NULL here — exact parity, no coalescing
               c.claim_status IN ('APPROVED', 'CLOSED')
                   AND c.approved_amount > 0 AS is_paid,
               c.closed_date IS NOT NULL AS is_closed,
               c.claim_amount > p.coverage_limit AS exceeds_coverage,
               pr.state AS property_state
        FROM silver_claims c
        JOIN silver_policies p USING (policy_id)
        LEFT JOIN silver_properties pr USING (property_id)
        ORDER BY c.claim_id
    """).fetchall()
    _rows_match(s_rows, d_rows, float_idx={ratio_idx})


def test_fact_premiums_matches_duckdb_twin(hostile_run, silver_con):
    _, outputs, _ = hostile_run
    fp = outputs["fact_premiums"]
    cols = fp.columns
    s_rows = [tuple(r) for r in _collect_tz_safe(fp, cols)]
    s_rows.sort(key=lambda r: (r[1] is None, r[1]))
    d_rows = silver_con.sql(f"""
        SELECT {_sk('m.premium_id')} AS premium_sk,
               m.premium_id, m.policy_id, p.property_id,
               p.coverage_type_code, p.channel, p.agent_id,
               m.payment_date, m.due_date, m.amount,
               m.payment_method, m.payment_status, m.billing_period,
               CASE WHEN m.payment_status = 'COMPLETED' THEN m.amount
                    ELSE 0.00::DECIMAL(12,2) END AS collected_amount,
               date_diff('day', m.due_date, m.payment_date) AS days_late,
               date_diff('day', m.due_date, m.payment_date) > 0 AS is_late,
               m.payment_status = 'FAILED' AS is_failed
        FROM silver_premiums m
        LEFT JOIN silver_policies p USING (policy_id)
        ORDER BY m.premium_id
    """).fetchall()
    _rows_match(s_rows, d_rows)


def test_dim_policy_matches_duckdb_twin(hostile_run, silver_con):
    _, outputs, _ = hostile_run
    dp = outputs["dim_policy"]
    cols = dp.columns
    s_rows = [tuple(r) for r in _collect_tz_safe(dp, cols)]
    s_rows.sort(key=lambda r: (r[1] is None, r[1]))
    float_cols = {cols.index("total_paid")}
    d_rows = silver_con.sql(f"""
        WITH summary AS (
            SELECT policy_id,
                   COUNT(*) AS payment_count,
                   (SUM(CASE WHEN payment_status = 'COMPLETED' THEN amount
                             ELSE 0 END)::DECIMAL(24,2))::DOUBLE
                       AS total_paid,
                   SUM(CASE WHEN payment_date > due_date THEN 1 ELSE 0
                       END)::BIGINT AS late_payment_count
            FROM silver_premiums GROUP BY policy_id
        )
        SELECT {_sk('p.policy_id', 'p.updated_at')} AS policy_sk,
               p.policy_id, p.policyholder_name, p.email, p.property_id,
               p.coverage_type_code, p.effective_date, p.expiration_date,
               p.status,
               CASE WHEN p.status = 'ACTIVE' THEN 'IN_FORCE'
                    WHEN p.status IN ('CANCELLED', 'EXPIRED')
                        THEN 'TERMINATED'
                    WHEN p.status = 'PENDING' THEN 'PENDING'
                    ELSE 'OTHER' END AS status_category,
               p.annual_premium, p.deductible, p.coverage_limit,
               p.agent_id, p.channel,
               COALESCE(s.payment_count, 0) AS payment_count,
               COALESCE(s.total_paid, 0.0) AS total_paid,
               COALESCE(s.late_payment_count, 0) AS late_payment_count,
               date_diff('day', p.effective_date, p.expiration_date)
                   AS policy_term_days,
               date_diff('day', p.effective_date, DATE '{AS_OF}')
                   AS days_in_force,
               p.updated_at,
               DATE '{AS_OF}' AS effective_start_date,
               NULL::DATE AS effective_end_date,
               TRUE AS is_current
        FROM silver_policies p
        LEFT JOIN summary s USING (policy_id)
        ORDER BY p.policy_id
    """).fetchall()
    _rows_match(s_rows, d_rows, float_idx=float_cols)


def test_dim_property_and_coverage_match_duckdb_twin(hostile_run,
                                                     silver_con):
    _, outputs, _ = hostile_run
    dpr = outputs["dim_property"]
    cols = dpr.columns
    s_rows = [tuple(r) for r in _collect_tz_safe(dpr, cols)]
    s_rows.sort(key=lambda r: (r[1] is None, r[1]))
    d_rows = silver_con.sql(f"""
        SELECT {_sk('property_id', 'updated_at')} AS property_sk,
               property_id, street_address, city, county, state, zip_code,
               latitude, longitude, year_built,
               {AS_OF[:4]}::INT - year_built AS property_age_years,
               square_footage, construction_type, roof_type, stories,
               occupancy_type, flood_zone, wind_zone, property_value,
               CASE WHEN construction_type IN ('FRAME', 'WOOD',
                        'MANUFACTURED') THEN 'HIGH'
                    WHEN construction_type IN ('MASONRY', 'STEEL')
                        THEN 'MEDIUM'
                    WHEN construction_type IN ('CONCRETE') THEN 'LOW'
                    ELSE 'UNKNOWN' END AS construction_risk_tier,
               CASE WHEN flood_zone IN ('V', 'VE', 'A', 'AE') THEN 'HIGH'
                    WHEN flood_zone IN ('B', 'X500') THEN 'MEDIUM'
                    WHEN flood_zone IN ('C', 'X') THEN 'LOW'
                    ELSE 'UNKNOWN' END AS flood_risk_tier,
               CASE WHEN wind_zone IN ('1', '2') THEN 'HIGH'
                    WHEN wind_zone = '3' THEN 'MEDIUM'
                    ELSE 'LOW' END AS wind_risk_tier,
               updated_at,
               DATE '{AS_OF}' AS effective_start_date,
               NULL::DATE AS effective_end_date,
               TRUE AS is_current
        FROM silver_properties
        ORDER BY property_id
    """).fetchall()
    _rows_match(s_rows, d_rows)

    dc = outputs["dim_coverage"]
    s_cov = sorted([tuple(r) for r in dc.collect()],
                   key=lambda r: (r[1] is None, r[1] or ""))
    d_cov = silver_con.sql(f"""
        SELECT {_sk('coverage_type_code')} AS coverage_sk,
               coverage_type_code,
               CASE coverage_type_code
                    WHEN 'HO3' THEN 'Homeowners Special Form'
                    WHEN 'HO4' THEN 'Renters Insurance'
                    WHEN 'HO5' THEN 'Homeowners Comprehensive Form'
                    WHEN 'HO6' THEN 'Condo Insurance'
                    WHEN 'DP1' THEN 'Dwelling Fire Basic'
                    WHEN 'DP3' THEN 'Dwelling Fire Special'
                    WHEN 'FLOOD' THEN 'Flood Insurance'
                    WHEN 'WIND' THEN 'Windstorm Insurance'
                    ELSE 'Unknown Coverage' END AS coverage_name,
               CASE coverage_type_code
                    WHEN 'HO3' THEN 'HOMEOWNER' WHEN 'HO4' THEN 'TENANT'
                    WHEN 'HO5' THEN 'HOMEOWNER' WHEN 'HO6' THEN 'CONDO'
                    WHEN 'DP1' THEN 'DWELLING' WHEN 'DP3' THEN 'DWELLING'
                    WHEN 'FLOOD' THEN 'PERIL_SPECIFIC'
                    WHEN 'WIND' THEN 'PERIL_SPECIFIC'
                    ELSE 'OTHER' END AS coverage_category
        FROM (SELECT DISTINCT coverage_type_code FROM silver_policies)
        ORDER BY coverage_type_code NULLS LAST
    """).fetchall()
    _rows_match(s_cov, d_cov)


# --- reconciliation vs independently-computed outcomes --------------------

def test_recon_outcomes_match_duckdb(hostile_run, silver_con):
    from redshift_to_lakehouse_migration_spark.recon import reconcile

    _, outputs, _ = hostile_run
    res = {r.check: r for r in reconcile(
        outputs["silver_premiums"], outputs["fact_premiums"],
        distribution_columns=["payment_status"])}
    n_silver = silver_con.sql(
        "SELECT COUNT(*) FROM silver_premiums").fetchone()[0]
    rc = res["row_count"]
    assert rc.passed and rc.legacy_value == rc.target_value == n_silver
    # fact_premiums left-joins policies, so sums must match exactly
    amt = res["aggregate_sum_amount"]
    d_sum = silver_con.sql(
        "SELECT SUM(amount)::DOUBLE FROM silver_premiums").fetchone()[0]
    assert amt.passed
    assert amt.legacy_value == pytest.approx(d_sum, rel=1e-12)
    assert amt.target_value == pytest.approx(d_sum, rel=1e-12)
    assert res["distribution_payment_status"].passed

    # a perturbed target must FAIL with the exact DuckDB-computed values
    biggest = silver_con.sql(
        "SELECT premium_id FROM silver_premiums "
        "ORDER BY amount DESC NULLS LAST LIMIT 1").fetchone()[0]
    perturbed = outputs["fact_premiums"].filter(
        F.col("premium_id") != F.lit(biggest))
    res2 = {r.check: r for r in reconcile(
        outputs["silver_premiums"], perturbed)}
    assert not res2["row_count"].passed
    assert res2["row_count"].target_value == n_silver - 1
    d_sum2 = silver_con.sql(
        "SELECT SUM(amount)::DOUBLE FROM silver_premiums "
        "WHERE premium_id <> ?", params=[biggest]).fetchone()[0]
    amt2 = res2["aggregate_sum_amount"]
    assert amt2.target_value == pytest.approx(d_sum2, rel=1e-12)
    # tolerance verdict recomputed independently
    rel = abs(d_sum - d_sum2) / abs(d_sum)
    assert amt2.passed == (rel <= 1e-4)


# --- SCD2 merge over the hostile dimension --------------------------------

def test_scd2_merge_hostile_dim_matches_python(hostile_run, spark):
    from redshift_to_lakehouse_migration_spark.scd2 import scd2_merge

    _, outputs, _ = hostile_run
    dim = outputs["dim_policy"].cache()
    payload = [c for c in dim.columns
               if c not in ("effective_start_date", "effective_end_date",
                            "is_current")]
    keys = [r.policy_id for r in dim.select("policy_id").collect()]
    keys.sort()
    changed = set(keys[::3])          # every 3rd: tracked column changes
    untracked = set(keys[1::3])       # only an UNTRACKED column changes
    upd = (dim.select(payload)
           .filter(F.col("policy_id").isin(list(changed | untracked)))
           .withColumn("status",
                       F.when(F.col("policy_id").isin(list(changed)),
                              F.lit("LAPSED")).otherwise(F.col("status")))
           .withColumn("email", F.lit("new@x.com")))
    merged = scd2_merge(dim, upd, ["policy_id"],
                        ["status", "annual_premium"], "2024-07-01")
    n0 = dim.count()
    # every changed key gains one version; untracked-only changes gain none
    assert merged.count() == n0 + len(changed)
    assert merged.filter("is_current").count() == n0
    closed = merged.filter("NOT is_current")
    assert closed.count() == len(changed)
    assert {r.policy_id for r in closed.select("policy_id").collect()} \
        == changed
    assert closed.filter("effective_end_date <> DATE '2024-07-01'") \
        .count() == 0
    cur_changed = merged.filter(
        F.col("is_current") & F.col("policy_id").isin(list(changed)))
    assert cur_changed.filter("status <> 'LAPSED'").count() == 0
    # untracked-only keys: still ONE current row, payload NOT updated
    cur_untracked = merged.filter(
        F.col("is_current") & F.col("policy_id").isin(list(untracked)))
    assert cur_untracked.count() == len(untracked)
    assert cur_untracked.filter("email = 'new@x.com'").count() == 0
    dim.unpersist()
