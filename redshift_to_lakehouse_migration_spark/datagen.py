"""Deterministic insurance-domain sample-data generator (test fixtures).

Fresh implementation of the semantics documented in FIXTURES.md §5 (derived
from the reference's `sample_data/generate_sample_data.py` behavior): seeded
RNG, properties ≈ 0.8×policies, claims on ~15% of policies (1–3 each),
premiums per billing-period schedule — plus the dirty-data requirements the
reference's unit fixtures demand (padded strings, wrong-case enums, NULL
keys, empty-string dates, orphan FKs).

Driver-side on purpose: this writes small CSV fixtures for tests of the
Bronze CSV ingest path; it is not an engine operator.
"""

from __future__ import annotations

import csv
import random
from datetime import date, timedelta
from pathlib import Path

from . import schemas as S


def _iso(d: date) -> str:
    return d.isoformat()


def generate(out_dir: str, n_policies: int = 200, seed: int = 42,
             dirty: bool = True) -> dict[str, int]:
    """Write policies/properties/claims/premiums CSVs; returns row counts."""
    rng = random.Random(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    base = date(2023, 1, 1)

    n_props = max(1, int(n_policies * 0.8))
    properties = []
    for i in range(n_props):
        built = rng.randint(1950, 2024)
        properties.append({
            "property_id": f"PROP-{i:07d}",
            "street_address": f"{rng.randint(1, 9999)} Main St",
            "city": f"City{rng.randint(1, 50)}",
            "county": f"County{rng.randint(1, 20)}",
            "state": rng.choice(S.STATES),
            "zip_code": f"{rng.randint(1000, 99999):05d}",
            "latitude": round(rng.uniform(24.0, 49.0), 7),
            "longitude": round(rng.uniform(-125.0, -66.0), 7),
            "year_built": built,
            "square_footage": rng.randint(800, 5000),
            "construction_type": rng.choice(S.CONSTRUCTION_TYPES),
            "roof_type": rng.choice(["SHINGLE", "TILE", "METAL", "FLAT",
                                     "SLATE", "WOOD_SHAKE"]),
            "stories": rng.randint(1, 3),
            "occupancy_type": rng.choice(["PRIMARY", "SECONDARY", "RENTAL",
                                          "VACANT"]),
            "flood_zone": rng.choice(S.FLOOD_ZONES),
            "wind_zone": str(rng.randint(1, 5)),
            "property_value": round(rng.uniform(80_000, 1_500_000), 2),
            "created_at": f"{_iso(base)}T00:00:00",
            "updated_at": f"{_iso(base)}T00:00:00",
        })

    policies, claims, premiums = [], [], []
    ci = pi = 0
    for i in range(n_policies):
        eff = base + timedelta(days=rng.randint(0, 364))
        status = rng.choice(S.POLICY_STATUSES[:4])
        annual = round(rng.uniform(500, 15000), 2)
        pol = {
            "policy_id": f"POL-{i:07d}",
            "policyholder_first_name": f"First{i}",
            "policyholder_last_name": f"Last{i}",
            "policyholder_email": f"holder{i}@example.com",
            "property_id": f"PROP-{rng.randrange(n_props):07d}",
            "coverage_type_code": rng.choice(S.COVERAGE_TYPES),
            "effective_date": _iso(eff),
            "expiration_date": _iso(eff + timedelta(days=365)),
            "status": status,
            "annual_premium": annual,
            "deductible": rng.choice([500, 1000, 1500, 2000, 2500, 5000]),
            "coverage_limit": rng.choice([1e5, 2e5, 3e5, 5e5, 7.5e5, 1e6]),
            "agent_id": f"AGT-{rng.randint(1, 500):04d}",
            "channel": rng.choice(S.CHANNELS),
            "created_at": f"{_iso(eff)}T00:00:00",
            "updated_at": f"{_iso(eff)}T12:00:00",
        }
        policies.append(pol)

        if rng.random() < 0.15:
            for _ in range(rng.choices([1, 2, 3], weights=[70, 25, 5])[0]):
                cdate = eff + timedelta(days=rng.randint(0, 364))
                cstatus = rng.choice(S.CLAIM_STATUSES)
                amount = round(rng.uniform(500, 250_000), 2)
                approved = (round(amount * rng.uniform(0.3, 1.0), 2)
                            if cstatus in ("APPROVED", "CLOSED") else 0.0)
                claims.append({
                    "claim_id": f"CLM-{ci:07d}",
                    "policy_id": pol["policy_id"],
                    "claim_date": _iso(cdate),
                    "reported_date": _iso(cdate + timedelta(
                        days=rng.randint(0, 14))),
                    "closed_date": (_iso(cdate + timedelta(days=30))
                                    if cstatus == "CLOSED" else ""),
                    "claim_type": rng.choice(S.CLAIM_TYPES),
                    "claim_status": cstatus,
                    "claim_amount": amount,
                    "approved_amount": approved,
                    "deductible_applied": (pol["deductible"]
                                           if approved > 0 else 0.0),
                    "adjuster_id": f"ADJ-{rng.randint(1, 200):04d}",
                    "cause_of_loss": rng.choice(
                        ["HURRICANE", "TORNADO", "HAIL", "FIRE", "THEFT",
                         "BURST_PIPE", "FLOOD", "WIND"]),
                    "description": f"claim {ci}",
                    "created_at": f"{_iso(cdate)}T00:00:00",
                    "updated_at": f"{_iso(cdate)}T00:00:00",
                })
                ci += 1

        period = rng.choice(list(S.BILLING_PERIODS))
        n_pay = S.BILLING_PERIODS[period]
        for k in range(n_pay):
            due = eff + timedelta(days=int(365 / n_pay) * k)
            premiums.append({
                "premium_id": f"PRM-{pi:08d}",
                "policy_id": pol["policy_id"],
                "payment_date": _iso(due + timedelta(
                    days=rng.randint(-5, 15))),
                "due_date": _iso(due),
                "amount": round(annual / n_pay, 2),
                "payment_method": rng.choice(S.PAYMENT_METHODS),
                "payment_status": rng.choices(
                    S.PAYMENT_STATUSES, weights=[4, 1, 1])[0],
                "billing_period": period,
                "period_start_date": _iso(due),
                "period_end_date": _iso(due + timedelta(
                    days=int(365 / n_pay))),
                "created_at": f"{_iso(due)}T00:00:00",
            })
            pi += 1

    if dirty:
        # dirty rows per FIXTURES.md §5: padded/lowercase values, NULL key,
        # orphan FK — all must be handled (not crash) downstream
        policies[0]["policyholder_first_name"] = " John "
        policies[0]["policyholder_last_name"] = " Smith "
        policies[0]["policyholder_email"] = " john@test.com "
        policies[0]["status"] = " active "
        policies[1]["coverage_type_code"] = "ho5"
        policies.append({**policies[2], "policy_id": ""})
        if claims:  # claims are probabilistic (~15%/policy): a tiny run
            claims.append({**claims[0], "claim_id": "CLM-ORPHAN",
                           "policy_id": "POL-9999999"})

    counts = {}
    # header fallback from the read-side schemas: claims are probabilistic
    # (~15%/policy), so a tiny run can legitimately produce ZERO claim
    # rows — the CSV still needs its header for schema-on-read
    headers = {"policies": S.RAW_POLICIES, "properties": S.RAW_PROPERTIES,
               "claims": S.RAW_CLAIMS, "premiums": S.RAW_PREMIUMS}
    for name, rows in [("policies", policies), ("properties", properties),
                       ("claims", claims), ("premiums", premiums)]:
        path = out / f"raw_{name}.csv"
        fields = (list(rows[0].keys()) if rows
                  else headers[name].fieldNames())
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            w.writerows(rows)
        counts[name] = len(rows)
    return counts
