"""Structured Streaming surface: incremental file ingest (the reference's
Auto Loader role, SURVEY §2.9) and event-time analytics (watermarked
tumbling/session windows — engine additions the reference lacks)."""
