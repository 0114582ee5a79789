"""Vector-similarity operators over arbitrary (id, array<float>) DataFrames.

``cosine_topk`` broadcasts the probe set and streams the corpus (exact,
scan-bound — the right shape for scoring a huge corpus against a bounded
probe set). ``lsh_assign`` + ``topk_within_buckets`` is the all-pairs scale
path: candidates come from a bucket-equality join, never a cross join.
Vector math is zip_with/aggregate fold — JVM-side, no UDFs.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def make_projections(n_planes: int, dim: int,
                     seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def lsh_bucket(emb: Column, projections: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane."""
    b = F.lit(0).cast("long")
    for j, plane in enumerate(projections):
        plane_lit = F.array(*[F.lit(c) for c in plane])
        b = b + F.when(dot(emb, plane_lit) > 0,
                       F.lit(1 << j).cast("long")).otherwise(0)
    return b


def cosine_topk(corpus: DataFrame, probes: DataFrame, id_col: str,
                vec_col: str, k: int, probe_id_col: str | None = None,
                round_digits: int | None = 9) -> DataFrame:
    """Exact top-k cosine neighbors of each probe vector.

    ``probes`` is broadcast (bounded probe set); the corpus streams. Output:
    (query_id, neighbor_id, sim, rank).
    """
    probe_id_col = probe_id_col or id_col
    q = probes.select(F.col(probe_id_col).alias("query_id"),
                      F.col(vec_col).alias("__q_emb"))
    sim = cosine(F.col("__q_emb"), F.col(vec_col))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_assign(corpus: DataFrame, id_col: str, vec_col: str,
               projections: list[list[float]]) -> DataFrame:
    """(id, embedding, bucket_id) assignment."""
    return corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"),
        lsh_bucket(F.col(vec_col), projections).alias("bucket_id"))


def cosine_near_pairs(assigned: DataFrame, threshold: float,
                      round_digits: int | None = 9) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold, confined to LSH
    buckets (bucket-equality join — never a global cross join). Output:
    (vec_id_1, vec_id_2, sim) with vec_id_1 < vec_id_2, one row per pair.

    Scale note: at 100 TB the bucket join shuffles on bucket_id only; skewed
    buckets can be split by raising the plane count (more, smaller buckets).
    """
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.join(b, (F.col("a.bucket_id") == F.col("b.bucket_id"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_id_1"),
                F.col("b.vec_id").alias("vec_id_2"),
                sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def ivf_assign(corpus: DataFrame, centroids: DataFrame, id_col: str,
               vec_col: str, centroid_id_col: str, centroid_vec_col: str,
               nprobe: int = 1, round_digits: int | None = 9) -> DataFrame:
    """IVF coarse quantization: assign every vector to its ``nprobe``
    nearest centroids by cosine (deterministic tie-break on centroid id).
    Centroids broadcast; the corpus streams — one pass, the only shuffle is
    the per-vector argmax window. nprobe=1 builds the inverted lists;
    nprobe>1 is the multi-probe query-side assignment.
    Output: (vec_id, embedding, centroid_id)."""
    c = centroids.select(F.col(centroid_id_col).alias("centroid_id"),
                         F.col(centroid_vec_col).alias("__c_emb"))
    sim = cosine(F.col(vec_col), F.col("__c_emb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("embedding"))
        .crossJoin(F.broadcast(c))
        .withColumn("__c_sim", sim)
    )
    if nprobe == 1:
        # argmax as a hash aggregate: lexicographic max of
        # (sim, -centroid_id) ≡ best sim with smallest-id tie-break.
        # Partial-aggregates map-side (the shuffle carries one row per
        # vector, not one per vector×centroid — the scale path).
        best = F.max(F.struct(
            F.col("__c_sim").alias("s"),
            (-F.col("centroid_id")).alias("neg_cid"),
            F.col("embedding").alias("emb"))).alias("best")
        return (
            scored.groupBy("vec_id").agg(best)
            .select("vec_id", F.col("best.emb").alias("embedding"),
                    (-F.col("best.neg_cid")).alias("centroid_id"))
        )
    w = W.partitionBy("vec_id").orderBy(
        F.col("__c_sim").desc(), F.col("centroid_id"))
    return (
        scored
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= nprobe)
        .select("vec_id", "embedding", "centroid_id")
    )


def ivf_topk(corpus_assigned: DataFrame, probes_assigned: DataFrame, k: int,
             round_digits: int | None = 9) -> DataFrame:
    """IVF search: each probe scans only the inverted lists of its probed
    centroids (equality join on centroid_id), exact cosine re-rank, top-k.
    ``probes_assigned``: (query_id, q_embedding, centroid_id) — one row per
    (probe, probed-centroid); multi-probe = several rows per probe."""
    sim = cosine(F.col("q.q_embedding"), F.col("c.embedding"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        probes_assigned.alias("q")
        .join(corpus_assigned.alias("c"), "centroid_id")
        .filter(F.col("c.vec_id") != F.col("q.query_id"))
        .select(F.col("q.query_id").alias("query_id"),
                F.col("c.vec_id").alias("neighbor_id"),
                sim.alias("sim"))
        .groupBy("query_id", "neighbor_id")  # probed lists may overlap
        .agg(F.max("sim").alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_within_buckets(assigned: DataFrame, k: int,
                        round_digits: int | None = 9) -> DataFrame:
    """ANN: exact cosine re-rank confined to LSH buckets (equality join)."""
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (
        a.join(b, (F.col("a.bucket_id") == F.col("b.bucket_id"))
               & (F.col("a.vec_id") != F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("query_id"),
                F.col("b.vec_id").alias("neighbor_id"),
                F.col("a.bucket_id").alias("bucket_id"),
                sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
