"""redshift_to_lakehouse_migration_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``bgall1976/redshift-to-lakehouse-migration`` (a Redshift→Delta
lakehouse migration demo), re-expressed Spark-first:

- declarative DataFrame / Spark SQL plans (Catalyst + AQE do the physical work)
- medallion pipeline (bronze → silver → gold) with SCD2, DQ checks, and
  reconciliation as libraries over DataFrames
- Structured Streaming for incremental ingest and event analytics
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash),
  similarity search over embeddings, text analysis, multimodal binary columns

Nothing here is a port: the reference delegates execution to Redshift/Spark;
we re-express its operator surface (SURVEY.md §2) idiomatically and design
every operator for 100 TB scale (broadcast dims, shuffle-light aggregation,
no driver-side loops).
"""

__version__ = "0.1.0"
