"""Distributed spherical k-means for IVF centroid training.

`similarity.ivf_assign` quantizes against *given* centroids; production IVF
indexes train those centroids first. This is Lloyd's algorithm in its
spherical form (unit vectors, cosine assignment, normalized-mean update),
expressed entirely as DataFrame ops — the canonical iterative algorithm on
Spark:

- assignment: broadcast the k centroids, map-side argmax per vector
  (`ivf_assign` with nprobe=1 — the shuffle carries ONE row per vector);
- update: posexplode to (centroid, dim) partial sums — map-side combine
  collapses each task's contribution to ≤ k×dim rows, so the shuffle is
  O(k×dim×tasks), independent of corpus size;
- objective: mean cosine of each vector to its centroid (non-decreasing
  across iterations for spherical k-means — asserted in tests).

At 100 TB you run this on a deterministic sample (training centroids needs
~256×k vectors, not the corpus); the same plan applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import ivf_assign


def l2_normalize(vec: F.Column) -> F.Column:
    """Unit-normalize an array<float/double> column (zero vectors pass
    through unchanged to avoid div-by-zero). Uses the canonical
    similarity.norm fold — same left-to-right double fold the oracle
    parity contract pins."""
    from .similarity import norm as _norm
    norm = _norm(vec)
    return F.when(norm == 0, vec.cast("array<double>")).otherwise(
        F.transform(vec, lambda x: x.cast("double") / norm))


def normalize_corpus(corpus: DataFrame, id_col: str,
                     vec_col: str) -> DataFrame:
    """(id, unit-vector) projection of a raw embedding table."""
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        l2_normalize(F.col(vec_col)).alias("embedding"))


def _update_centroids(assigned: DataFrame) -> DataFrame:
    """Normalized per-cluster mean. posexplode → hash aggregate on
    (centroid_id, dim) → rebuild the array ordered by dim. Empty clusters
    simply vanish (their centroid attracts nothing next round)."""
    per_dim = (
        assigned.select("centroid_id",
                        F.posexplode("embedding").alias("dim", "x"))
        .groupBy("centroid_id", "dim")
        .agg(F.sum("x").alias("sx"), F.count("*").alias("n"))
    )
    rebuilt = (
        per_dim.groupBy("centroid_id")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "sx", "n"))),
            lambda s: s["sx"] / s["n"]).alias("mean_vec"))
    )
    return rebuilt.select(
        "centroid_id", l2_normalize(F.col("mean_vec")).alias("embedding"))


def kmeans_fit(corpus: DataFrame, init_centroids: DataFrame,
               iters: int = 3) -> DataFrame:
    """Train spherical k-means centroids. ``corpus``/``init_centroids``
    carry (vec_id|centroid_id, embedding) with unit vectors (use
    :func:`normalize_corpus`). Returns the trained (centroid_id, embedding).

    Each iteration is two shuffles (argmax assign, per-dim update); the
    intermediate centroid set is tiny and re-broadcast every round."""
    centroids = init_centroids.select(
        F.col(init_centroids.columns[0]).alias("centroid_id"), "embedding")
    for _ in range(iters):
        assigned = ivf_assign(corpus, centroids, "vec_id", "embedding",
                              "centroid_id", "embedding", nprobe=1)
        # cache: the assignment feeds one aggregate; the centroid table it
        # produces is small, so only IT persists across the loop boundary
        centroids = _update_centroids(assigned)
        centroids = centroids.localCheckpoint(eager=False)
    return centroids


def kmeans_objective(corpus: DataFrame, centroids: DataFrame) -> float:
    """Mean cosine of each vector to its nearest centroid (higher is
    better; non-decreasing across spherical-k-means iterations)."""
    assigned = ivf_assign(corpus, centroids, "vec_id", "embedding",
                          "centroid_id", "embedding", nprobe=1)
    c = centroids.select(F.col("centroid_id"),
                         F.col("embedding").alias("__c_emb"))
    dot = F.aggregate(
        F.zip_with("embedding", "__c_emb", lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    row = (assigned.join(F.broadcast(c), "centroid_id")
           .agg(F.avg(dot).alias("obj")).collect()[0])
    return float(row.obj)
