"""Shared ANN-recall test helpers: a deterministic planted-cluster corpus
and the recall@k metric.

The driver's synthetic embeddings are directionally uniform (measured:
same-label mean cosine 0.006 vs cross-label 0.011), which is the known
worst case for ANY sublinear index — recall there scales with the scanned
fraction, an information-theoretic property, not an implementation defect.
Retrieval-quality gates therefore run on a planted-cluster corpus (real
embedding spaces are clustered; that is the regime ANN indexes exist for),
while separate tests measure the uniform-corpus floor and its monotone
improvement with nprobe on the driver data.
"""

from __future__ import annotations

import math
import random


def clustered_corpus(spark, n_clusters: int = 10, per_cluster: int = 50,
                     dim: int = 64, noise: float = 0.05, seed: int = 11):
    """(vec_id, embedding array<float>) with ids grouped by cluster:
    vec_id // per_cluster is the cluster. Members are a unit center plus
    small gaussian noise, so true nearest neighbors are in-cluster."""
    rng = random.Random(seed)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    centers = [unit([rng.gauss(0, 1) for _ in range(dim)])
               for _ in range(n_clusters)]
    rows = []
    for c in range(n_clusters):
        for j in range(per_cluster):
            vec = unit([x + rng.gauss(0, noise) for x in centers[c]])
            rows.append((c * per_cluster + j, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def recall_at_k(result_rows, gt_rows) -> float:
    """Mean per-query |retrieved ∩ true| / |true| over (query_id,
    neighbor_id) row sets."""
    gt: dict = {}
    for r in gt_rows:
        gt.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict = {}
    for r in result_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    per_q = [len(got.get(q, set()) & s) / len(s) for q, s in gt.items()]
    return sum(per_q) / len(per_q)
