"""Spherical k-means (IVF centroid training) — llm/kmeans.py.

Reference test model (SURVEY.md §5): behavioral invariants on real data,
not golden files. Lloyd's spherical form guarantees a non-decreasing mean
cosine objective; centroids must be unit vectors; assignments must be
total and deterministic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_to_lakehouse_migration_spark.llm import kmeans as km
from redshift_to_lakehouse_migration_spark.llm.similarity import ivf_assign
from redshift_to_lakehouse_migration_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    e = load(spark, SF, "embeddings")
    return km.normalize_corpus(e, "vec_id", "embedding").cache()


@pytest.fixture(scope="module")
def init(corpus):
    return corpus.filter(F.col("vec_id") % 16 == 0) \
        .select(F.col("vec_id").alias("centroid_id"), "embedding")


def test_objective_non_decreasing(corpus, init):
    prev = km.kmeans_objective(corpus, init)
    centroids = init
    for _ in range(3):
        centroids = km.kmeans_fit(corpus, centroids, iters=1)
        obj = km.kmeans_objective(corpus, centroids)
        assert obj >= prev - 1e-9, (prev, obj)
        prev = obj


def test_centroids_are_unit_vectors(corpus, init):
    trained = km.kmeans_fit(corpus, init, iters=2)
    norms = trained.select(
        F.sqrt(F.aggregate("embedding", F.lit(0.0),
                           lambda a, x: a + x * x)).alias("n")).collect()
    assert norms and all(abs(r.n - 1.0) < 1e-9 for r in norms)


def test_assignment_total_and_deterministic(corpus, init):
    trained = km.kmeans_fit(corpus, init, iters=2)
    a1 = ivf_assign(corpus, trained, "vec_id", "embedding",
                    "centroid_id", "embedding", nprobe=1)
    n_corpus = corpus.count()
    assert a1.count() == n_corpus  # every vector assigned exactly once
    pairs1 = {(r.vec_id, r.centroid_id)
              for r in a1.select("vec_id", "centroid_id").collect()}
    a2 = ivf_assign(corpus.repartition(7), trained, "vec_id", "embedding",
                    "centroid_id", "embedding", nprobe=1)
    pairs2 = {(r.vec_id, r.centroid_id)
              for r in a2.select("vec_id", "centroid_id").collect()}
    assert pairs1 == pairs2  # partitioning-independent


def test_cluster_count_bounded_by_k(corpus, init):
    k = init.count()
    trained = km.kmeans_fit(corpus, init, iters=2)
    assert trained.count() <= k
