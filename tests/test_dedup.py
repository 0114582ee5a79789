"""Recall tests for the hash-based dedup operators (MinHash-LSH, SimHash)
with planted near-duplicates — these ops have no SQL oracle, so correctness
is asserted behaviorally: planted near-dups must be found, distinct docs
must not collapse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.llm import dedup as D

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill near the garden")


def _corpus(spark):
    near = BASE.replace("lazy", "sleepy")           # 1-token edit → near-dup
    exact = BASE
    distinct = ("completely different content about spark query engines "
                "and distributed columnar execution at massive scale "
                "with shuffles joins and aggregates")
    rows = [(1, BASE), (2, exact), (3, near), (4, distinct),
            (5, "short text"), (6, "short text here")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    groups = D.exact_duplicates(_corpus(spark), "doc_id", "text")
    dup = groups.filter("has_duplicates").collect()
    assert len(dup) == 1
    assert dup[0].keeper_doc_id == 1 and dup[0].member_count == 2


def test_minhash_finds_planted_near_dups(spark):
    pairs = D.minhash_lsh_pairs(_corpus(spark), "doc_id", "text",
                                threshold=0.5).collect()
    found = {(r.doc_id_1, r.doc_id_2) for r in pairs}
    assert (1, 2) in found          # exact dup pair
    assert (1, 3) in found          # planted near-dup
    assert (2, 3) in found
    # distinct docs must not pair with the fox corpus
    assert not any(4 in p for p in found)
    for r in pairs:
        if (r.doc_id_1, r.doc_id_2) == (1, 2):
            assert r.jaccard == 1.0
        if (r.doc_id_1, r.doc_id_2) == (1, 3):
            assert 0.5 <= r.jaccard < 1.0


def test_minhash_materialized_path_matches_inline(spark, tmp_path):
    """The one-corpus-scan scale path (write signatures → join against
    tables) must produce exactly the inline path's pair set."""
    docs = _corpus(spark)
    inline = D.minhash_lsh_pairs(docs, "doc_id", "text",
                                 threshold=0.3).collect()
    paths = D.materialize_minhash(docs, "doc_id", "text", str(tmp_path))
    from_tables = D.minhash_pairs_from_tables(spark, paths,
                                              threshold=0.3).collect()
    key = lambda r: (r.doc_id_1, r.doc_id_2)
    assert {key(r): (r.shared_shingles, r.jaccard) for r in inline} \
        == {key(r): (r.shared_shingles, r.jaccard) for r in from_tables}
    assert len(inline) > 0


def test_simhash_hamming_separation(spark):
    sig = D.simhash_signatures(_corpus(spark), "doc_id", "text")
    rows = {r.doc_id: r.simhash for r in sig.collect()}
    assert rows[1] == rows[2]                       # identical text
    ham_near = bin(rows[1] ^ rows[3]).count("1")
    ham_far = bin(rows[1] ^ rows[4]).count("1")
    assert ham_near < ham_far                       # near-dup closer
    pairs = D.simhash_near_pairs(sig, max_hamming=ham_near).collect()
    found = {(r.doc_id_1, r.doc_id_2) for r in pairs}
    assert (1, 2) in found and (1, 3) in found
    assert not any(4 in p for p in found)


def test_simhash_wide_agg_matches_exploded_formulation(spark):
    """The production wide-aggregate SimHash must be bit-identical to the
    textbook per-bit exploding formulation it replaced (60× fewer shuffle
    rows, same signatures)."""
    docs = _corpus(spark)
    normed = docs.select("doc_id", D.norm_text("text").alias("norm"))
    toks = (
        normed.select("doc_id", F.explode(F.split("norm", " ")).alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("w"))
        .withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
                    .cast("long"))
    )
    exploded = (
        toks.select("doc_id", "w",
                    F.explode(F.sequence(F.lit(0), F.lit(59))).alias("i"),
                    "h")
        .withColumn("bit", F.expr("shiftright(h, i) & 1"))
        .groupBy("doc_id", "i")
        .agg(F.sum(F.col("w") * (F.col("bit") * 2 - 1)).alias("vote"))
        .groupBy("doc_id")
        .agg(F.sum(F.expr(
            "CASE WHEN vote > 0 THEN shiftleft(CAST(1 AS BIGINT), i) "
            "ELSE 0 END")).alias("simhash"))
    )
    expected = {r.doc_id: r.simhash for r in exploded.collect()}
    actual = {r.doc_id: r.simhash
              for r in D.simhash_signatures(docs, "doc_id", "text").collect()}
    assert actual == expected


def test_jaccard_pairs_block_confinement(spark):
    """Docs in different blocks are never compared (the scale guarantee)."""
    docs = _corpus(spark).select(
        "doc_id", D.norm_text("text").alias("norm"))
    sh = D.shingles(docs, "doc_id", "norm")
    blocks = docs.select("doc_id", F.substring("norm", 1, 16).alias("block"))
    pairs = D.jaccard_pairs(sh, blocks, threshold=0.0).collect()
    found = {(r.doc_id_1, r.doc_id_2) for r in pairs}
    assert (1, 2) in found and (1, 3) in found
    assert not any(4 in p for p in found)   # different prefix block


def _vec_corpus(spark):
    """Tiny embedding corpus: 1≈2 (planted near-dup), 3 orthogonal-ish,
    4 = exact copy of 1."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.2]),
        (2, [0.98, 0.05, 0.0, 0.2]),     # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),       # distinct
        (4, [1.0, 0.0, 0.0, 0.2]),       # exact dup of 1
        (5, [0.0, 0.0, 1.0, 0.1]),       # distinct
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_near_pairs_finds_planted_dups(spark):
    from redshift_to_lakehouse_migration_spark.llm import similarity as S
    projections = S.make_projections(4, 4, seed=7)
    assigned = S.lsh_assign(_vec_corpus(spark), "vec_id", "embedding",
                            projections)
    pairs = S.cosine_near_pairs(assigned, threshold=0.95).collect()
    found = {(r.vec_id_1, r.vec_id_2): r.sim for r in pairs}
    assert (1, 4) in found and found[(1, 4)] == 1.0   # exact dup
    assert (1, 2) in found                            # planted near-dup
    assert not any(3 in p or 5 in p for p in found)   # distinct stay apart


def test_ivf_assign_and_topk(spark):
    from redshift_to_lakehouse_migration_spark.llm import similarity as S
    corpus = _vec_corpus(spark)
    centroids = corpus.filter("vec_id IN (1, 3, 5)")
    lists = S.ivf_assign(corpus, centroids, "vec_id", "embedding",
                         "vec_id", "embedding", nprobe=1)
    by_centroid = {r.vec_id: r.centroid_id for r in lists.collect()}
    # every vector lands on its obviously-nearest centroid
    assert by_centroid[1] == 1 and by_centroid[2] == 1
    assert by_centroid[4] == 1 and by_centroid[3] == 3
    assert by_centroid[5] == 5
    probes = (
        S.ivf_assign(corpus.filter("vec_id = 2"), centroids,
                     "vec_id", "embedding", "vec_id", "embedding", nprobe=2)
        .selectExpr("vec_id AS query_id", "embedding AS q_embedding",
                    "centroid_id")
    )
    top = S.ivf_topk(lists, probes, k=2).collect()
    assert [r.neighbor_id for r in sorted(top, key=lambda r: r.rank)][0] in (1, 4)
    assert all(r.query_id == 2 for r in top)


def test_connected_components_multihop(spark):
    """A~B, B~C, D~E: components must close transitively with min-id
    labels, across any partitioning."""
    from redshift_to_lakehouse_migration_spark.llm.components import connected_components
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "a long, b long").repartition(5)
    comp = {r.node: r.comp
            for r in connected_components(edges, "a", "b").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_converges_on_long_chain(spark):
    """A 12-node path graph needs several propagation rounds; the
    convergence loop must reach the fixpoint, not stop early."""
    from redshift_to_lakehouse_migration_spark.llm.components import connected_components
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "a long, b long")
    comp = connected_components(edges, "a", "b")
    assert comp.select("comp").distinct().count() == 1
    assert comp.agg({"comp": "max"}).collect()[0][0] == 0


def test_connected_components_raises_when_iteration_budget_too_small(spark):
    """Unconverged labels are WRONG labels (a partially-collapsed chain
    would let non-canonical near-dups survive); the loop must raise, not
    silently return, when max_iter is exhausted mid-propagation."""
    from redshift_to_lakehouse_migration_spark.llm.components import connected_components
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, "a", "b", max_iter=2).collect()
    # degenerate budget: must still raise the intended RuntimeError (a
    # prev-unset NameError here would mask the real diagnostic)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, "a", "b", max_iter=0).collect()


# --- pathological skew: mass-duplicated boilerplate (the 100-TB killer) ---
#
# A degenerate band key (thousands of near-identical docs — exactly what a
# web crawl contains) must NOT produce B² candidate rows on one shuffle
# partition. Oversized buckets collapse to a star around the min-doc
# representative: B−1 candidates, full connectivity for clustering.

N_PATHOLOGICAL = 10_000


def _identical_corpus(spark, n=N_PATHOLOGICAL):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(BASE).alias("text"))


def test_minhash_pathological_bucket_collapses_to_star(spark):
    pairs = D.minhash_lsh_pairs(_identical_corpus(spark), "doc_id", "text",
                                threshold=0.5).collect()
    # star, not all-pairs: N−1 candidates (vs ~50M uncapped), every doc
    # reachable from the representative, and the verify still scores 1.0
    assert len(pairs) == N_PATHOLOGICAL - 1
    assert all(r.doc_id_1 == 0 for r in pairs)
    assert all(r.jaccard == 1.0 for r in pairs)
    assert {r.doc_id_2 for r in pairs} == set(range(1, N_PATHOLOGICAL))


def test_simhash_pathological_bucket_collapses_to_star(spark):
    sig = D.simhash_signatures(_identical_corpus(spark), "doc_id", "text")
    pairs = D.simhash_near_pairs(sig, max_hamming=3).collect()
    assert len(pairs) == N_PATHOLOGICAL - 1
    assert all(r.doc_id_1 == 0 and r.hamming_distance == 0 for r in pairs)


def test_small_buckets_keep_all_pairs_semantics(spark):
    """The cap must be a no-op below the threshold: a 5-doc bucket still
    yields all C(5,2) pairs."""
    docs = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit(BASE).alias("text"))
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    assert pairs.count() == 10


def test_jaccard_shingle_df_cap_drops_boilerplate(spark):
    """Shingles shared by more docs than the cap within a block are
    boilerplate: dropping them bounds the d²-row shingle join. Identical
    docs are the exact-dup fast path's job, so zero pairs here is right —
    and a planted LOW-frequency near-dup in the same corpus must survive."""
    n = 3000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(BASE).alias("norm"))
    near = spark.createDataFrame(
        [(100001, "rare uncommon tokens here exactly matching pair one"),
         (100002, "rare uncommon tokens here exactly matching pair two")],
        "doc_id long, norm string")
    docs = base.unionByName(near)
    sh = D.shingles(docs, "doc_id", "norm")
    blocks = docs.select("doc_id", F.substring("norm", 1, 16).alias("block"))
    got = D.jaccard_pairs(sh, blocks, threshold=0.4, shingle_df_cap=1024) \
        .collect()
    assert {(r.doc_id_1, r.doc_id_2) for r in got} == {(100001, 100002)}


def test_embedding_pathological_bucket_collapses_to_star(spark):
    """Embedding-side twin of the text-LSH cap: a mass-duplicated vector
    (one boilerplate page embedded N times, all landing in ONE sign-LSH
    bucket) must emit B−1 star candidates, not B² — and every member must
    stay paired with the min-vec representative at sim 1.0."""
    from redshift_to_lakehouse_migration_spark.llm import similarity as S
    n = 5000
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.2))
        .cast("array<float>").alias("embedding"))
    projections = S.make_projections(4, 4, seed=7)
    assigned = S.lsh_assign(vecs, "vec_id", "embedding", projections)
    pairs = S.cosine_near_pairs(assigned, threshold=0.95,
                                bucket_cap=512).collect()
    assert len(pairs) == n - 1
    assert all(r.vec_id_1 == 0 and r.sim == 1.0 for r in pairs)
    assert {r.vec_id_2 for r in pairs} == set(range(1, n))


def test_embedding_pathological_bucket_topk_bounded(spark):
    """topk_within_buckets on the same degenerate bucket: candidate rows
    stay O(B) (2·(B−1) directed), so each non-representative vector ranks
    only the representative instead of all B−1 others."""
    from redshift_to_lakehouse_migration_spark.llm import similarity as S
    n = 5000
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.2))
        .cast("array<float>").alias("embedding"))
    projections = S.make_projections(4, 4, seed=7)
    assigned = S.lsh_assign(vecs, "vec_id", "embedding", projections)
    topk = S.topk_within_buckets(assigned, k=3, bucket_cap=512)
    rows = topk.collect()
    # representative sees up to k neighbors; every other vector exactly 1
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, 0)
        per_q[r.query_id] += 1
    assert per_q[0] == 3
    assert all(v == 1 for q, v in per_q.items() if q != 0)
    assert len(per_q) == n


def _cluster_pairs(spark, pairset):
    """All same-cluster (unordered) node pairs under connected components
    of the given edge set — the dedup-group equivalence a keeper selection
    actually consumes."""
    import itertools
    from collections import defaultdict
    from redshift_to_lakehouse_migration_spark.llm.components import (
        connected_components,
    )
    if not pairset:
        return set()
    e = spark.createDataFrame(list(pairset), "a long, b long")
    comp = {r.node: r.comp
            for r in connected_components(e, "a", "b").collect()}
    groups = defaultdict(list)
    for n, c in comp.items():
        groups[c].append(n)
    return {tuple(sorted(p)) for mem in groups.values()
            for p in itertools.combinations(mem, 2)}


def test_minhash_capped_recall_bound_on_mixed_oversized_buckets(spark):
    """Measured recall contract for the bucket cap (the docstring caveat in
    capped_band_candidates, as a number): 3 near-dup families of 30
    SIMILAR-BUT-NOT-IDENTICAL docs (one token swapped per member, so
    full-signature groups don't trivially pair them) whose band buckets
    exceed a cap of 8. Deterministic fixture (seeded) →
    deterministic recall.

    Contract pinned here (measured on this fixture):
    - PAIR recall vs the uncapped reference is lossy: 0.245 measured;
      assert the ≥ 0.2 floor (the price of B−1 stars vs B² pairs).
    - CLUSTER recall is TOTAL (1.0): multi-band re-bucketing plus
      star-to-representative edges keep every uncapped dedup GROUP intact,
      which is the property keeper-selection consumes. Dedup output is
      unchanged even where the pair list thins.
    """
    import random
    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(400)]
    rows, doc_id = [], 0
    for f in range(3):
        base = [vocab[rng.randrange(400)] for _ in range(30)]
        for m in range(30):
            toks = list(base)
            toks[rng.randrange(len(toks))] = f"fam{f}rare{m}"
            rows.append((doc_id, " ".join(toks)))
            doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    normed = docs.select("doc_id", D.norm_text("text").alias("norm"))
    sh = D.shingles(normed, "doc_id", "norm")
    bands = D.minhash_band_keys(sh, D.make_permutations(32, 42), 4)

    def pairs(cap):
        return {(r.doc_id_1, r.doc_id_2) for r in
                D._lsh_candidate_verify(sh, bands, 0.5,
                                        bucket_cap=cap).collect()}

    uncapped, capped = pairs(None), pairs(8)
    assert uncapped, "fixture regression: no near-dup pairs at all"
    pair_recall = len(uncapped & capped) / len(uncapped)
    assert pair_recall >= 0.2, pair_recall
    sc_u = _cluster_pairs(spark, uncapped)
    sc_c = _cluster_pairs(spark, capped)
    assert len(sc_u & sc_c) / len(sc_u) == 1.0


def test_embedding_capped_recall_floor_and_uncapped_escape_hatch(spark):
    """The embedding path is SINGLE-band (one sign-LSH bucketing), so the
    docstring's residual-loss caveat has no other band to recover through:
    in a mixed oversized bucket of near-identical-but-UNEQUAL vectors
    (every vector its own xxhash group), candidates collapse to
    (bucket-rep, member) pairs and only the representative's own family
    survives the verify. Pin that measured floor — cluster recall = 1/3
    with 3 families — so the loss is a documented number, and prove the
    escape hatch: bucket_cap=None (or a cap above the bucket size)
    restores the uncapped pair set exactly. Production guidance encoded
    here: for single-band sign-LSH, prefer raising planes (smaller
    buckets) or the cap over accepting mixed oversized buckets."""
    import random
    from redshift_to_lakehouse_migration_spark.llm import similarity as S
    rng = random.Random(5)
    fam_dirs = [[1.0, 0.0, 0.0, 0.2], [0.9, 0.1, 0.05, 0.3],
                [0.95, 0.05, 0.0, 0.25]]
    vrows, vid = [], 0
    for d in fam_dirs:
        for _ in range(40):
            vrows.append((vid, [float(c + rng.uniform(-0.003, 0.003))
                                for c in d]))
            vid += 1
    vecs = spark.createDataFrame(vrows, "vec_id long, embedding array<float>")
    assigned = S.lsh_assign(vecs, "vec_id", "embedding",
                            S.make_projections(4, 4, seed=7))
    assert assigned.select("bucket_id").distinct().count() == 1, \
        "fixture regression: families no longer share one bucket"

    def pairs(cap):
        return {(r.vec_id_1, r.vec_id_2) for r in
                S.cosine_near_pairs(assigned, threshold=0.9999,
                                    bucket_cap=cap).collect()}

    uncapped, capped = pairs(None), pairs(8)
    assert uncapped
    sc_u = _cluster_pairs(spark, uncapped)
    sc_c = _cluster_pairs(spark, capped)
    cluster_recall = len(sc_u & sc_c) / len(sc_u)
    # one of three equal-size families survives: measured 1/3 ± the
    # fixture's family-size arithmetic; assert the band it must sit in
    assert 0.25 <= cluster_recall <= 0.45, cluster_recall
    # escape hatches restore exactness: cap above bucket size ≡ uncapped
    assert pairs(200) == uncapped
    assert pairs(None) == uncapped


def test_mixed_oversized_bucket_pairs_groups_directly(spark):
    """A band-key collision can mix DISTINCT duplicate families in one
    oversized bucket. Per-group stars must pair each family's members with
    their own group representative (verify-passing sim 1.0 pairs), not only
    with the global min-vec rep — the mixed-bucket recall fix."""
    from redshift_to_lakehouse_migration_spark.llm import similarity as S
    n = 2000  # per family
    fam_a = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.2))
        .cast("array<float>").alias("embedding"))
    fam_b = spark.range(n).select(
        (F.col("id") + n).alias("vec_id"),
        F.array(F.lit(0.9), F.lit(0.1), F.lit(0.05), F.lit(0.3))
        .cast("array<float>").alias("embedding"))
    both = fam_a.unionByName(fam_b)
    projections = S.make_projections(4, 4, seed=7)
    assigned = S.lsh_assign(both, "vec_id", "embedding", projections)
    # same bucket for both families (they must collide for this test)
    n_buckets = assigned.select("bucket_id").distinct().count()
    assert n_buckets == 1, "fixture regression: families no longer collide"
    pairs = S.cosine_near_pairs(assigned, threshold=0.999,
                                bucket_cap=512).collect()
    found = {(r.vec_id_1, r.vec_id_2) for r in pairs}
    # family B members pair with family B's rep (vec n) at sim 1.0 —
    # with a single global star they would only meet vec 0 (sim < .999)
    assert all((n, n + i) in found for i in range(1, n))
    assert all((0, i) in found for i in range(1, n))
    # candidate volume stayed linear: 2(n-1) intra-family + 1 rep-rep pair
    assert len(found) == 2 * (n - 1) + sum(
        1 for (a, b) in found if (a, b) == (0, n))


def test_simhash_banding_pigeonhole_holds_for_requested_distance(spark):
    """Band count derives from max_hamming, so the pigeonhole recall
    guarantee holds for ANY requested distance: a hamming-4 pair with one
    differing bit in each of the classic four 15-bit bands (positions
    0/15/30/45) shares NO 15-bit band — the fixed 4-band split silently
    missed it even at max_hamming=6 — but with 7 derived bands at least
    three are untouched and the pair must surface."""
    sig = spark.createDataFrame(
        [(1, 0), (2, (1 << 0) | (1 << 15) | (1 << 30) | (1 << 45))],
        "doc_id long, simhash long")
    found = D.simhash_near_pairs(sig, max_hamming=6).collect()
    assert [(r.doc_id_1, r.doc_id_2, r.hamming_distance)
            for r in found] == [(1, 2, 4)]
    # the distance filter still rejects out-of-bound pairs
    assert D.simhash_near_pairs(sig, max_hamming=3).count() == 0
    # and the default reproduces the classic 4x15-bit split: a pair
    # within distance 3 is always found
    close = spark.createDataFrame(
        [(1, 0), (2, (1 << 2) | (1 << 17) | (1 << 59))],
        "doc_id long, simhash long")
    assert D.simhash_near_pairs(close, max_hamming=3).count() == 1
