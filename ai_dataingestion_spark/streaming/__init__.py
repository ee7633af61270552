"""Streaming operators (SURVEY.md §2.I + §2.L ingest) — registered on import."""

from ai_dataingestion_spark.streaming import batch_windows, incremental  # noqa: F401
