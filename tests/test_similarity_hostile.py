"""Numeric-hostility lens on the vector-similarity surface (the embedding
twin of the r5 hostile TEXT corpus): zero-norm vectors, NaN/Inf
components, and ragged dimensions — degenerate rows every 100 TB corpus
contains (failed encoder outputs, padding rows, truncated writes) but the
driver's well-formed testdata never exercises.

What this pins (the round-6 fix in llm/similarity.cosine):

- **Zero-norm vector**: cosine's division is undefined. Before the fix,
  ANSI mode (the engine default) aborted the ENTIRE job with
  DIVIDE_BY_ZERO — one all-zeros embedding killed every ANN/near-dup
  query over the corpus. Now `try_divide` yields NULL, which is also
  exactly what non-ANSI Spark and DuckDB return for double x/0 — the
  guard unifies all three regimes instead of forking them.
- **NaN/Inf component**: the dot fold propagates NaN, and Spark orders
  NaN ABOVE every real number in `desc` — an unguarded NaN sim ranked
  #1 for EVERY probe sharing its bucket (one corrupt row hijacking every
  ranking it touches). `nanvl` maps non-finite sims to NULL.
- **NULL sim is never a candidate**: every ranking/threshold consumer
  (cosine_topk, ivf_topk, topk_within_buckets, pq.refine_topk,
  cosine_near_pairs via its >= filter) drops NULL sims, so undefined
  similarity yields NO row — not a crash, not an arbitrary rank.

Oracle parity is untouched: on finite vectors the guarded expression is
value-identical (try_divide == / when divisor != 0), re-proven by the
full replica after the change.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.llm import pq
from redshift_to_lakehouse_migration_spark.llm import similarity as S

NAN = float("nan")
INF = float("inf")

FINITE = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0]),   # nearest finite neighbor of vec 1
    (3, [0.0, 1.0, 0.0]),   # orthogonal to vec 1
]
HOSTILE = [
    (100, [0.0, 0.0, 0.0]),   # zero-norm: cosine undefined
    (101, [NAN, 1.0, 0.0]),   # NaN component: fold → NaN
    (102, [INF, 1.0, 0.0]),   # Inf component: inf/inf → NaN
    (103, [1.0]),             # ragged dim: zip_with pads NULL → NULL dot
    (104, None),              # NULL embedding: zip_with(NULL,·) → NULL
    (105, [1.0, None, 0.0]),  # NULL element: NULL product poisons the fold
]
FINITE_IDS = {i for i, _ in FINITE}
HOSTILE_IDS = {i for i, _ in HOSTILE}


@pytest.fixture(scope="module")
def ansi_on(spark):
    """Pin ANSI mode ON for this module: the zero-norm regression is a
    crash specifically under ANSI, so the regression test must not
    silently weaken if a future session default flips."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.fixture(scope="module")
def corpus(ansi_on):
    return ansi_on.createDataFrame(
        FINITE + HOSTILE, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def probe(ansi_on):
    return ansi_on.createDataFrame(
        [(1, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>")


def test_cosine_is_total_and_exact_on_finite(ansi_on):
    """Expression-level contract: NULL (never an error, never NaN) on every
    degenerate input; bit-identical to the raw division on finite ones."""
    df = ansi_on.createDataFrame(
        [(i, e) for i, e in FINITE + HOSTILE],
        "vec_id long, embedding array<double>")
    q = F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))
    rows = {r.vec_id: r.c for r in df.select(
        "vec_id", S.cosine(F.col("embedding"), q).alias("c")).collect()}
    assert rows[1] == pytest.approx(1.0)
    assert rows[2] == pytest.approx(0.9 / math.sqrt(0.81 + 0.01))
    assert rows[3] == pytest.approx(0.0)
    for hid in HOSTILE_IDS:
        assert rows[hid] is None, f"vec {hid}: expected NULL, got {rows[hid]}"


def test_cosine_topk_survives_hostile_corpus(corpus, probe):
    """One degenerate row must not abort the scan (pre-fix: ANSI
    DIVIDE_BY_ZERO) nor hijack rank 1 (pre-fix: NaN sim sorts first)."""
    out = S.cosine_topk(corpus, probe, "vec_id", "embedding", k=10).collect()
    got = {r.neighbor_id for r in out}
    assert got == FINITE_IDS - {1}, got  # hostile rows yield no candidate
    best = min(out, key=lambda r: r.rank)
    assert best.neighbor_id == 2 and best.rank == 1


def test_zero_norm_probe_yields_no_rows(corpus, ansi_on):
    zp = ansi_on.createDataFrame([(100, [0.0, 0.0, 0.0])],
                                 "vec_id long, embedding array<double>")
    finite = corpus.filter(F.col("vec_id") < 100)
    assert S.cosine_topk(finite, zp, "vec_id", "embedding", k=5).count() == 0


@pytest.mark.parametrize("cap", [None, 2], ids=["uncapped", "capped"])
def test_cosine_near_pairs_hostile(corpus, cap):
    """Bucketed near-dup over a corpus with hostile co-bucketed rows:
    pairs form only between finite vectors, on both cap paths."""
    proj = S.make_projections(n_planes=4, dim=3, seed=7)
    assigned = S.lsh_assign(corpus, "vec_id", "embedding", proj)
    pairs = S.cosine_near_pairs(assigned, threshold=0.5,
                                bucket_cap=cap).collect()
    ids = {r.vec_id_1 for r in pairs} | {r.vec_id_2 for r in pairs}
    assert ids <= FINITE_IDS
    assert (1, 2) in {(r.vec_id_1, r.vec_id_2) for r in pairs}


def test_topk_within_buckets_hostile(corpus):
    proj = S.make_projections(n_planes=2, dim=3, seed=7)  # few, big buckets
    assigned = S.lsh_assign(corpus, "vec_id", "embedding", proj)
    out = S.topk_within_buckets(assigned, k=5, bucket_cap=None).collect()
    assert {r.neighbor_id for r in out} <= FINITE_IDS
    assert {r.query_id for r in out} <= FINITE_IDS  # NULL both directions


def test_ivf_assign_and_search_hostile(corpus, ansi_on):
    """IVF with a zero-norm/NaN corpus row: assignment stays total (the
    row lands somewhere, deterministically — it must not vanish from the
    index build or crash it) and search never returns it."""
    cents = ansi_on.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "centroid_id long, embedding array<double>")
    lists = S.ivf_assign(corpus, cents, "vec_id", "embedding",
                         "centroid_id", "embedding", nprobe=1)
    a = {r.vec_id: r.centroid_id for r in lists.collect()}
    b = {r.vec_id: r.centroid_id for r in lists.collect()}
    assert set(a) == FINITE_IDS | HOSTILE_IDS  # every vector indexed
    assert a == b  # deterministic under NULL sims
    probes = S.ivf_assign(
        corpus.filter(F.col("vec_id") == 1), cents, "vec_id", "embedding",
        "centroid_id", "embedding", nprobe=2,
    ).select(F.col("vec_id").alias("query_id"),
             F.col("embedding").alias("q_embedding"), "centroid_id")
    out = S.ivf_topk(lists, probes, k=10).collect()
    assert {r.neighbor_id for r in out} == FINITE_IDS - {1}


def test_refine_topk_hostile(corpus, probe, ansi_on):
    """The PQ exact-refine re-rank shares cosine's totality guard: hostile
    candidates (reachable via their quantized codes) are dropped, not
    ranked first and not fatal."""
    cand = ansi_on.createDataFrame(
        [(1, n) for n in (2, 3, 100, 101, 102, 103)],
        "query_id long, neighbor_id long")
    out = pq.refine_topk(cand, corpus, probe, "vec_id", "embedding",
                         k=10).collect()
    assert {r.neighbor_id for r in out} == {2, 3}
    assert min(out, key=lambda r: r.rank).neighbor_id == 2


def _sorted_rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple(repr(x) for x in t))


class TestTrainingHostility:
    """The ITERATIVE fitters (k-means, PQ codebooks) are where hostile
    rows do the most damage: a NaN component poisons its cluster's
    per-dim sum → the centroid goes NaN → (for PQ's argmin, where NaN
    orders above every double) the poisoned centroid WINS every
    assignment next iteration — total collapse from one corrupt row.
    Contract pinned here: training EXCLUDES degenerate rows (fit on
    hostile ∪ finite ≡ fit on finite, exactly), while assignment/encode
    stay total and deterministic."""

    DIM, M = 4, 2

    @pytest.fixture(scope="class")
    def vecs(self, ansi_on):
        finite = [
            (1, [1.0, 0.0, 0.1, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.1]),
            (3, [0.0, 1.0, 0.0, 0.2]),
            (4, [0.1, 0.9, 0.1, 0.0]),
            (5, [0.0, 0.1, 1.0, 0.0]),
            (6, [0.1, 0.0, 0.9, 0.1]),
        ]
        hostile = [
            (100, [0.0, 0.0, 0.0, 0.0]),
            (101, [NAN, 1.0, 0.0, 0.0]),
            (102, [INF, 1.0, 0.0, 0.0]),
            (103, [1.0]),                     # ragged
            (104, None),                      # NULL embedding
            (105, [1.0, None, 0.0, 0.0]),     # NULL element
        ]
        mk = lambda rows: ansi_on.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        return mk(finite), mk(finite + hostile)

    def test_kmeans_fit_ignores_hostile_rows(self, vecs):
        from redshift_to_lakehouse_migration_spark.llm import kmeans as km
        finite, mixed = vecs
        init = (km.normalize_corpus(finite, "vec_id", "embedding")
                .filter(F.col("vec_id").isin(1, 3, 5))
                .select(F.col("vec_id").alias("centroid_id"), "embedding"))
        fit = lambda c: _sorted_rows(km.kmeans_fit(
            km.normalize_corpus(c, "vec_id", "embedding"), init, iters=2))
        got, want = fit(mixed), fit(finite)
        assert got == want
        for _, emb in got:
            assert all(x is not None and math.isfinite(x) for x in emb)

    def test_kmeans_nan_init_centroid_attracts_nothing(self, vecs):
        """A corrupt INIT centroid (hostile row sampled as a seed) must
        not crash or skew training: its sims are NULL, it never wins an
        assignment, and the update drops it — fit(init ∪ {NaN centroid})
        ≡ fit(init)."""
        from redshift_to_lakehouse_migration_spark.llm import kmeans as km
        finite, _ = vecs
        corpus = km.normalize_corpus(finite, "vec_id", "embedding")
        init = (corpus.filter(F.col("vec_id").isin(1, 3))
                .select(F.col("vec_id").alias("centroid_id"), "embedding"))
        bad = init.sparkSession.createDataFrame(
            [(99, [NAN, 0.0, 0.0, 0.0])],
            "centroid_id long, embedding array<double>")
        assert (_sorted_rows(km.kmeans_fit(corpus, init.union(bad), iters=2))
                == _sorted_rows(km.kmeans_fit(corpus, init, iters=2)))

    def test_kmeans_objective_finite_on_hostile_corpus(self, vecs):
        from redshift_to_lakehouse_migration_spark.llm import kmeans as km
        finite, mixed = vecs
        corpus = km.normalize_corpus(mixed, "vec_id", "embedding")
        init = (km.normalize_corpus(finite, "vec_id", "embedding")
                .filter(F.col("vec_id").isin(1, 3, 5))
                .select(F.col("vec_id").alias("centroid_id"), "embedding"))
        obj = km.kmeans_objective(corpus, km.kmeans_fit(corpus, init,
                                                        iters=1))
        assert math.isfinite(obj), obj

    def _sub_and_init(self, df):
        sub = pq.split_subvectors(df, "vec_id", "embedding",
                                  self.M, self.DIM)
        from pyspark.sql import Window as W
        init = (sub.filter(F.col("vec_id").isin(1, 3, 5))
                .select("subspace",
                        (F.row_number().over(
                            W.partitionBy("subspace").orderBy("vec_id"))
                         - 1).alias("code"),
                        F.col("subvec").alias("centroid")))
        return sub, init

    def test_train_codebook_ignores_hostile_subvectors(self, vecs):
        """Per-SUBVECTOR exclusion: PQ's M quantizers are independent,
        so the mixed corpus trains exactly like the finite rows PLUS the
        hostile rows' well-formed subvectors — vec 100's zero subvecs
        (valid Euclidean data) and the clean subspace-1 halves of vecs
        101/102/105 (whose corruption lives entirely in subspace 0).
        Everything NaN/Inf/NULL/ragged contributes nothing."""
        finite, mixed = vecs
        _, init = self._sub_and_init(finite)
        sub_m, _ = self._sub_and_init(mixed)
        want_sub = self._sub_and_init(
            finite.sparkSession.createDataFrame(
                [(100, [0.0, 0.0, 0.0, 0.0])],
                "vec_id long, embedding array<double>")
            .union(finite))[0].union(
            finite.sparkSession.createDataFrame(
                [(v, 1, [0.0, 0.0]) for v in (101, 102, 105)],
                "vec_id long, subspace int, subvec array<double>"))
        got = _sorted_rows(pq.train_codebook(sub_m, init, iters=2))
        want = _sorted_rows(pq.train_codebook(want_sub, init, iters=2))
        assert got == want
        for _, _, cent in got:
            assert all(x is not None and math.isfinite(x) for x in cent)

    def test_train_codebook_survives_nan_init_centroid(self, vecs):
        """Pre-guard, a NaN centroid's NaN distance won the argmin for
        EVERY subvector in its subspace (NaN > all doubles under max) —
        one corrupt seed collapsed the codebook. Now it attracts
        nothing and vanishes."""
        finite, _ = vecs
        sub, init = self._sub_and_init(finite)
        bad = sub.sparkSession.createDataFrame(
            [(0, 99, [NAN, 0.0])], "subspace int, code int, "
            "centroid array<double>")
        got = _sorted_rows(pq.train_codebook(sub, init.union(bad), iters=1))
        assert got == _sorted_rows(pq.train_codebook(sub, init, iters=1))

    def test_encode_total_and_deterministic_on_hostile(self, vecs):
        _, mixed = vecs
        sub, init = self._sub_and_init(mixed)
        cb = pq.train_codebook(sub, init, iters=1)
        a = {r.vec_id: r.codes for r in pq.encode(sub, cb).collect()}
        b = {r.vec_id: r.codes for r in pq.encode(sub, cb).collect()}
        assert a == b
        assert set(a) == {1, 2, 3, 4, 5, 6, 100, 101, 102, 103, 104, 105}
        assert all(len(c) == self.M and all(x is not None for x in c)
                   for c in a.values())

    def test_split_subvectors_ragged_is_null_not_truncated(self, ansi_on):
        """A row whose length != dim must not silently truncate into
        narrower-but-plausible subvectors (which would bias per-dim
        training counts); it becomes NULL subvecs."""
        df = ansi_on.createDataFrame(
            [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0]), (3, None)],
            "vec_id long, embedding array<double>")
        rows = {(r.vec_id, r.subspace): r.subvec
                for r in pq.split_subvectors(
                    df, "vec_id", "embedding", self.M, self.DIM).collect()}
        assert rows[(1, 0)] == [1.0, 2.0] and rows[(1, 1)] == [3.0, 4.0]
        for vid in (2, 3):
            assert rows[(vid, 0)] is None and rows[(vid, 1)] is None

    def test_adc_hostile_probe_yields_no_rows(self, vecs):
        finite, mixed = vecs
        sub_f, init = self._sub_and_init(finite)
        cb = pq.train_codebook(sub_f, init, iters=1)
        codes = pq.encode(sub_f, cb)
        probes = mixed.filter(F.col("vec_id").isin(1, 103, 104))
        psub = pq.split_subvectors(probes, "vec_id", "embedding",
                                   self.M, self.DIM)
        out = pq.adc_topk(codes, psub, cb, k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        # finite probe ranks finite corpus; fully-degenerate probes
        # (NULL-subvec distance table) fabricate no rank-1 rows
        assert set(by_q) == {1}
        assert all(r.adc_dist is not None for r in by_q[1])


def test_ragged_dim_is_null_not_garbage(ansi_on):
    """zip_with pads the shorter array with NULL → the fold returns NULL →
    the pair is absent from results. Pinned so a future fold rewrite
    cannot silently turn dimension mismatch into a truncated (wrong but
    plausible) dot product."""
    df = ansi_on.createDataFrame([(1,)], "vec_id long")
    d = df.select(S.dot(F.array(F.lit(1.0)),
                        F.array(F.lit(1.0), F.lit(2.0))).alias("d"))
    assert d.collect()[0].d is None
