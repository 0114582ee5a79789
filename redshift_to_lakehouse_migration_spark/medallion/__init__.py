"""Medallion (bronze → silver → gold) pipeline for the insurance domain —
the reference's end-to-end surface re-expressed as composable DataFrame
builders (SURVEY §2.12), runnable in one SparkSession via
``redshift_to_lakehouse_migration_spark.pipeline``."""
