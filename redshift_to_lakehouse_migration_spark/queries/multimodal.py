"""Multimodal (binary) column handling for LLM data pipelines.

The reference's type system has no binary/array/struct columns (SURVEY §1.2);
these queries add the engine's multimodal surface: opaque ``binary`` payloads
with typed metadata, content hashing, chunk/frame planning, and an
Arrow-batched decode step.

The container has no image/audio codecs, so decode is a clearly-marked
deterministic STUB (`fake_decode_batch`) — but the Spark-side plumbing is
real: ``mapInPandas`` over Arrow batches with an explicit output schema,
exactly how a libvips/ffmpeg decoder would be mounted. The stub's arithmetic
is replicated in the DuckDB oracle, so even the pandas path is value-checked.

Binary payloads are synthesized from ``documents.text`` (utf-8 encode) since
the driver tables carry no raw media; at production scale the same plans read
``binary`` columns straight from parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, spread

CHUNK_BYTES = 256
FRAME_STRIDE = 100


def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length, sha-256
    content hash, chunk count, magic-prefix hex."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    blen = F.octet_length(payload)
    return (
        d.filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id"),
            F.col("source"),
            blen.alias("byte_length"),
            F.sha2(payload, 256).alias("content_sha256"),
            F.ceil(blen / CHUNK_BYTES).cast("long").alias("chunk_count"),
            F.lower(F.hex(F.encode(F.substring("text", 1, 4), "utf-8")))
                .alias("magic_hex"),
        )
    )


# --- decode stub (deterministic fake; real decoder would drop in here) ----

def fake_decode_batch(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
    """STUB decoder: the container ships no image/audio codecs, so this
    derives deterministic pseudo-metadata from byte length. A real decoder
    (PIL/ffmpeg) would replace the arithmetic only — schema, batching, and
    partitioning stay identical."""
    for pdf in batches:
        blen = pdf["byte_length"]
        out = pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "byte_length": blen,
            "width": (blen * 7) % 1920,
            "height": (blen * 13) % 1080,
            "n_frames": blen // FRAME_STRIDE,
            "media_format": pdf["source"].str.upper(),
        })
        yield out


def media_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode over mapInPandas (vectorized Python path).
    Deterministic stub arithmetic → fully oracle-checked."""
    d = spread(load(spark, sf_dir, "documents"), spark)
    src = (
        d.filter(F.col("text").isNotNull())
        .select("doc_id", "source",
                F.octet_length(F.encode("text", "utf-8"))
                .alias("byte_length"))
    )
    schema = ("doc_id long, byte_length long, width long, height long, "
              "n_frames long, media_format string")
    return src.mapInPandas(fake_decode_batch, schema=schema)


def frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/chunk sampling plan: one row per sampled frame offset
    (explode(sequence) — the distributed equivalent of a per-file loop)."""
    d = load(spark, sf_dir, "documents")
    blen = F.octet_length(F.encode("text", "utf-8"))
    n_frames = (blen / FRAME_STRIDE).cast("long")
    return (
        d.filter(F.col("text").isNotNull())
        .select("doc_id", blen.alias("byte_length"),
                n_frames.alias("n_frames"))
        .filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1))
                .alias("frame_index"),
            "byte_length",
        )
        .select(
            "doc_id", "frame_index",
            (F.col("frame_index") * FRAME_STRIDE).alias("byte_offset"),
            F.least(F.col("frame_index") * FRAME_STRIDE + FRAME_STRIDE,
                    F.col("byte_length")).alias("byte_end"),
        )
    )


QUERIES = {
    "binary_metadata": binary_metadata,
    "media_decode_stub": media_decode_stub,
    "frame_sample_plan": frame_sample_plan,
}

ORACLES = {
    "binary_metadata": f"""
        SELECT
            doc_id,
            source,
            octet_length(encode(text)) AS byte_length,
            sha256(text) AS content_sha256,
            CAST(ceil(octet_length(encode(text)) / {CHUNK_BYTES})
                 AS BIGINT) AS chunk_count,
            lower(hex(encode(substr(text, 1, 4)))) AS magic_hex
        FROM documents WHERE text IS NOT NULL
    """,
    "media_decode_stub": f"""
        SELECT
            doc_id,
            octet_length(encode(text)) AS byte_length,
            (octet_length(encode(text)) * 7) % 1920 AS width,
            (octet_length(encode(text)) * 13) % 1080 AS height,
            octet_length(encode(text)) // {FRAME_STRIDE} AS n_frames,
            upper(source) AS media_format
        FROM documents WHERE text IS NOT NULL
    """,
    "frame_sample_plan": f"""
        WITH src AS (
            SELECT doc_id, octet_length(encode(text)) AS byte_length,
                   octet_length(encode(text)) // {FRAME_STRIDE} AS n_frames
            FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id,
               unnest(range(0, n_frames)) AS frame_index,
               unnest(range(0, n_frames)) * {FRAME_STRIDE} AS byte_offset,
               least(unnest(range(0, n_frames)) * {FRAME_STRIDE}
                     + {FRAME_STRIDE}, byte_length) AS byte_end
        FROM src WHERE n_frames > 0
    """,
}
