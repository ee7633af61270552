"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

This file is a thin binding onto the engine package — the operator inventory
lives in ai_dataingestion_spark/ (one registered QuerySpec per SURVEY.md §2
ID; see ai_dataingestion_spark.catalog).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ai_dataingestion_spark import catalog
from ai_dataingestion_spark.session import ensure_session_conf


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape over lineitem) at sf0.001; rows > 0."""
    ensure_session_conf(spark)
    return catalog.queries()["agg_groupby"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per oracle-verified operator."""
    return catalog.oracle_sql()
