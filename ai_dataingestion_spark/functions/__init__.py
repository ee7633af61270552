"""Scalar function families (SURVEY.md §2.H) — registered on import."""

from ai_dataingestion_spark.functions import scalar  # noqa: F401
