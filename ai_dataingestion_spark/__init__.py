"""ai_dataingestion_spark — a PySpark-native analytics / ingestion engine.

A from-scratch, Spark-first engine providing the capability surface catalogued
in SURVEY.md §2 (the reference snapshot at /root/reference is empty —
/root/reference/README.md:1 — so the surface is derived from the driver
contract, the test corpus, and public Spark/DuckDB knowledge).

Design stance (SURVEY.md §7.1): a thin, well-factored Python package that
composes the PySpark DataFrame API and lets Catalyst/AQE do the heavy lifting.
No RDDs, no custom Catalyst rules; Python UDFs only on the explicitly-UDF
surface (§2.J) and the vector/text paths that genuinely need them.
"""

from ai_dataingestion_spark.session import get_spark, session_builder
from ai_dataingestion_spark.registry import TABLE_NAMES, load_table, register_views

__all__ = [
    "get_spark",
    "session_builder",
    "TABLE_NAMES",
    "load_table",
    "register_views",
]
