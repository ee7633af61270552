"""UDF/UDAF/UDTF surface (SURVEY.md §2.J) — registered on import."""

from ai_dataingestion_spark.udf import udfs  # noqa: F401
