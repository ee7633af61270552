"""Sources & sinks (SURVEY.md §2.A) — registered on import."""

from ai_dataingestion_spark.sources import scans  # noqa: F401
