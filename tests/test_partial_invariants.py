"""DuckDB-backed partial invariants for rows-only queries (VERDICT r11 #6).

Five registered queries have no DuckDB oracle because their outputs are
engine-specific (t-digest sketch values) or iterative (k-means, IVF-PQ
rankings). The driver's oracle gate is HASH-EXACT — an oracle whose SQL
cannot reproduce the query's bytes would turn a correct query into a
"newly failing" one — so the partial invariants the r10/r11 verdicts
asked for live here instead: DuckDB independently computes the invariant
bound, Spark runs the registered query, and the assertion ties them.
This gives the two named entries (kmeans_clusters,
price_percentiles_approx) engine-independent value checks without
touching the ORACLES registry (names frozen, hash contract intact).
"""

from __future__ import annotations

import duckdb
import pytest

from redshift_to_lakehouse_migration_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_kmeans_cluster_sizes_partition_the_corpus(spark, duck):
    """Invariant: the reported cluster sizes PARTITION the embedding
    corpus — every vector assigned exactly once (sum of sizes == DuckDB's
    corpus count), cluster count bounded by the seed count, and cohesion
    is a mean of cosines of unit vectors (|avg| <= 1)."""
    rows = QUERIES["kmeans_clusters"](spark, SF).collect()
    n = duck.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchone()[0]
    k = duck.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/embeddings.parquet') "
        "WHERE vec_id % 64 = 0").fetchone()[0]
    assert sum(r.cluster_size for r in rows) == n
    assert 1 <= len(rows) <= k
    # distinct centroid ids (a duplicated group would double-count)
    assert len({r.centroid_id for r in rows}) == len(rows)
    assert all(-1.0 - 1e-6 <= r.avg_cohesion <= 1.0 + 1e-6 for r in rows)


def test_approx_percentiles_within_rank_error_of_duckdb(spark, duck):
    """Invariant: every sketch quantile lands inside the value window
    DuckDB computes at p±eps exact ranks. approx_percentile's accuracy
    parameter (10000) bounds rank error at 1/10000 of the group; eps =
    0.005 is 50x that bound, so a pass certifies the sketch against an
    INDEPENDENT engine's exact quantiles (the in-repo twin check in
    test_queries_oracle.py compares only Spark-vs-Spark) while staying
    robust to cont-vs-disc interpolation at the window edges."""
    rows = {r.return_flag: r
            for r in QUERIES["price_percentiles_approx"](spark, SF)
            .collect()}
    assert rows, "query returned no groups"
    eps = 0.005
    checks = [("l_quantity", 0.5, "median_qty"),
              ("l_extendedprice", 0.25, "price_q1"),
              ("l_extendedprice", 0.75, "price_q3"),
              ("l_extendedprice", 0.95, "price_p95")]
    flags = duck.execute(
        f"SELECT DISTINCT l_returnflag FROM "
        f"read_parquet('{SF}/lineitem.parquet')").fetchall()
    assert {f[0] for f in flags} == set(rows)
    for flag in rows:
        for col, p, attr in checks:
            lo, hi = duck.execute(
                f"SELECT quantile_cont({col}, {max(p - eps, 0.0)}), "
                f"       quantile_cont({col}, {min(p + eps, 1.0)}) "
                f"FROM read_parquet('{SF}/lineitem.parquet') "
                f"WHERE l_returnflag = ?", [flag]).fetchone()
            got = float(getattr(rows[flag], attr))
            assert float(lo) - 1e-9 <= got <= float(hi) + 1e-9, (
                f"{attr}@{flag}: {got} outside DuckDB rank window "
                f"[{lo}, {hi}] (p={p}±{eps})")
