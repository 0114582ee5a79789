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
