"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query at a given sf_dir on Spark AND its oracle SQL on
DuckDB, then compares row count, sorted column names, and an order-insensitive
value hash. Queries without an oracle get a rows-only check.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    """Normalize a cell to a canonical string (engine-neutral)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    row_hashes = sorted(
        hashlib.md5(
            "\x1f".join(norm_cell(r[i]) for i in order).encode()
        ).hexdigest()
        for r in rows
    )
    return hashlib.md5("\n".join(row_hashes).encode()).hexdigest()


def main():
    from redshift_to_lakehouse_migration_spark.queries import ORACLES, QUERIES
    from redshift_to_lakehouse_migration_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    names = [n for n in QUERIES if not ONLY or n in ONLY]
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ROWS {name}: {len(s_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            rel = con.sql(ORACLES[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            sh = value_hash(s_rows, s_cols)
            dh = value_hash(d_rows, d_cols)
            if sh != dh:
                problems.append("value-hash mismatch")
                # diagnostic: show first differing row
                key = lambda rows, cols: sorted(
                    "\x1f".join(norm_cell(r[i]) for i in sorted(
                        range(len(cols)), key=lambda j: cols[j]))
                    for r in rows)
                ss, dd = key(s_rows, s_cols), key(d_rows, d_cols)
                for a, b in zip(ss, dd):
                    if a != b:
                        problems.append(f"  spark : {a[:300]}")
                        problems.append(f"  duckdb: {b[:300]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(names)} queries @ {SF_DIR}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
