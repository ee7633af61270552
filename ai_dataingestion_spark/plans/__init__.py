"""Declarative pipeline plans (the EP1 runner surface) — registered on import."""

from ai_dataingestion_spark.plans import pipeline  # noqa: F401
