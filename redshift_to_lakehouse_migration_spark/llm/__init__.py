"""LLM training-data pipeline operators, as a reusable library.

Every operator takes DataFrames + column names (not file paths), so the same
code runs over the driver's test tables, a production corpus, or a 100 TB
lakehouse table. The registered queries in ``queries/llm_*`` are thin
wrappers binding these to the driver tables.

Modules: ``dedup`` (exact / MinHash-LSH / SimHash / n-gram Jaccard,
plus the canonical text normalizer), ``similarity`` (cosine top-k,
sign-LSH bucketing, IVF), ``pq`` (product quantization + ADC),
``kmeans`` (Lloyd training), ``components`` (connected components),
``pipeline`` (the end-to-end corpus-prep funnel). Text quality metrics,
language ID, and fingerprints live in ``queries/llm_text.py`` as
registered queries.
"""
