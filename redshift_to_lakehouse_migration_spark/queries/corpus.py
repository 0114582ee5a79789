"""The corpus-prep funnel as one oracle-checked query.

`corpus_funnel` evaluates the ENTIRE training-data pipeline (raw → gate →
exact dedup → near-dup clustering → decontamination → sampling,
`llm/pipeline.py`) as a single lazy plan and reports per-stage doc/token
counts. Every count is integer arithmetic, so the DuckDB oracle replays
the full composition — including the iterative components step, expressed
as a recursive CTE — and the driver value-hashes the result. This is the
end-to-end correctness anchor for the whole LLM-pipeline surface; the
materializing runner (`run_corpus_pipeline`) is benched separately in
`bench.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..llm.dedup import DEFAULT_SHINGLE_DF_CAP
from ..tables import SPREAD_TEXT_MIN_BYTES_PER_CORE, load, spread
from .curation import BENCH_MOD
from .llm_text import _STOP_COUNT_SQL
from .sampling import DEFAULT_CEILING, STRATUM_CEILING


def corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Size-adaptive spread (r12): funnel()'s narrow proxy + capped-
    # shingle localCheckpoints (r11) compute every expensive text pass
    # ONCE, so repartitioning a SMALL corpus first costs a full-text
    # shuffle it no longer amortizes — measured ABBA at local[32]:
    # 6.56 → 5.34 s at 0.59 MB (bare wins), 13.6 → 10.8 s at ~3 MB
    # (spread wins; the serial pass dominates). min_bytes takes the
    # measured branch at each scale; no-op difference at cluster scale.
    from ..llm.pipeline import funnel
    return funnel(spread(load(spark, sf_dir, "documents"), spark,
                         min_bytes_per_core=SPREAD_TEXT_MIN_BYTES_PER_CORE))


QUERIES = {"corpus_funnel": corpus_funnel}

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')"
_GRAMS = ("list_transform(generate_series(1, greatest(len(t) - 4, 0)), "
          "i -> array_to_string(t[i:i+4], ' '))")

ORACLES = {
    "corpus_funnel": f"""
    WITH RECURSIVE base AS (
        SELECT doc_id, lang, text, {_NORM} AS norm,
               CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g'), ' '), ' '))
                    AS BIGINT) AS n_tokens
        FROM documents
        WHERE text IS NOT NULL AND regexp_matches(text, '\\S')
    ), gated AS (
        SELECT * FROM base
        WHERE n_tokens >= 5
          AND length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 5
              < length(text)
          AND {_STOP_COUNT_SQL} * 100
              >= n_tokens
          AND {_STOP_COUNT_SQL} * 10
              <= n_tokens * 6
    ), exact AS (
        SELECT * FROM gated
        QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(norm))
    ), tok AS (
        SELECT doc_id, substr(norm, 1, 16) AS block,
               string_split(norm, ' ') AS toks
        FROM exact
    ), sh AS (
        SELECT doc_id, block, unnest(list_distinct(
            [array_to_string(toks[i:i+2], ' ')
             for i in range(1, greatest(len(toks) - 2, 1) + 1)]))
            AS shingle
        FROM tok
    ), shf AS (
        -- both engines drop boilerplate shingles (within-block document
        -- frequency above the cap) before the quadratic pair join
        SELECT doc_id, block, shingle FROM (
            SELECT doc_id, block, shingle,
                   COUNT(*) OVER (PARTITION BY block, shingle) AS df
            FROM sh)
        WHERE df <= {DEFAULT_SHINGLE_DF_CAP}
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_shingles FROM shf GROUP BY doc_id
    ), rawpairs AS (
        SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
               COUNT(*) AS shared_shingles
        FROM shf a JOIN shf b
          ON a.shingle = b.shingle AND a.block = b.block
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), jpairs AS (
        SELECT p.doc_id_1, p.doc_id_2
        FROM rawpairs p
        JOIN sizes s1 ON p.doc_id_1 = s1.doc_id
        JOIN sizes s2 ON p.doc_id_2 = s2.doc_id
        WHERE p.shared_shingles
              / (s1.n_shingles + s2.n_shingles - p.shared_shingles) >= 0.4
    ), sym AS (
        SELECT doc_id_1 AS a, doc_id_2 AS b FROM jpairs
        UNION
        SELECT doc_id_2, doc_id_1 FROM jpairs
    ), reach(node, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node
    ), comp AS (
        SELECT node, MIN(r) AS comp FROM reach GROUP BY node
    ), canonical AS (
        SELECT e.* FROM exact e
        LEFT JOIN comp c ON e.doc_id = c.node
        WHERE c.node IS NULL OR c.comp = e.doc_id
    ), bgrams AS (
        SELECT DISTINCT unnest({_GRAMS}) AS gram
        FROM (SELECT string_split({_NORM}, ' ') AS t
              FROM documents
              WHERE doc_id % {BENCH_MOD} = 0 AND text IS NOT NULL)
    ), dirty AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest(list_distinct({_GRAMS})) AS gram
              FROM (SELECT doc_id, string_split(norm, ' ') AS t
                    FROM canonical
                    WHERE doc_id % {BENCH_MOD} <> 0)) g
        JOIN bgrams USING (gram)
    ), decontaminated AS (
        SELECT * FROM canonical
        WHERE doc_id % {BENCH_MOD} <> 0
          AND doc_id NOT IN (SELECT doc_id FROM dirty)
    ), sampled AS (
        SELECT * FROM decontaminated
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < CASE WHEN lang = 'en' THEN '{STRATUM_CEILING["en"]}'
                     ELSE '{DEFAULT_CEILING}' END
    )
    SELECT 0 AS stage_id, 'raw' AS stage, COUNT(*) AS docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens FROM base
    UNION ALL SELECT 1, 'gated', COUNT(*),
        CAST(SUM(n_tokens) AS BIGINT) FROM gated
    UNION ALL SELECT 2, 'exact_dedup', COUNT(*),
        CAST(SUM(n_tokens) AS BIGINT) FROM exact
    UNION ALL SELECT 3, 'near_dup_canonical', COUNT(*),
        CAST(SUM(n_tokens) AS BIGINT) FROM canonical
    UNION ALL SELECT 4, 'decontaminated', COUNT(*),
        CAST(SUM(n_tokens) AS BIGINT) FROM decontaminated
    UNION ALL SELECT 5, 'sampled', COUNT(*),
        CAST(SUM(n_tokens) AS BIGINT) FROM sampled
    ORDER BY stage_id
    """,
}
