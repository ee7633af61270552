"""Pipeline / data-quality operators (SURVEY.md §2.L) — registered on import."""

from ai_dataingestion_spark.pipeline import quality  # noqa: F401
