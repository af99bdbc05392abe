"""Structured Streaming surface.

The reference is pure batch (jobqueue is cron scheduling, SURVEY.md §2.10)
— streaming here extends the engine for continuous ingestion: file-source
streams with event-time watermarks and windowed aggregation, exactly the
shape a continuously-updated 100 TB corpus needs (new Iceberg snapshots →
incremental windows).
"""
