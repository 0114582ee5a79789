"""LLM training-data pipeline operators, as a reusable library.

Every operator takes DataFrames + column names (not file paths), so the same
code runs over the driver's test tables, a production corpus, or a 100 TB
lakehouse table. The registered queries in ``queries/llm_*`` are thin
wrappers binding these to the driver tables.

Modules: ``dedup`` (exact / MinHash-LSH / SimHash / n-gram Jaccard),
``text`` (quality metrics, language ID, fingerprints), ``similarity``
(cosine top-k, sign-LSH bucketing).
"""
