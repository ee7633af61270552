"""Operator catalog: the registry behind ``__spark_entry__.queries()``.

Every operator from SURVEY.md §2 registers itself here as a QuerySpec:
a name (the literal §2 ID), a callable ``(spark, sf_dir) -> DataFrame``, and —
for oracle-verified operators — the equivalent DuckDB SQL. The driver runs
both sides at sf0.01 and hash-compares (row count + schema + order-insensitive
value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded to a fixed number of decimals on both sides
  (double summation order differs between engines — SURVEY.md §5.4);
- rankings/top-k always carry a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame operator query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator id: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    """All registered operators (imports the operator packages on demand)."""
    import ai_dataingestion_spark.operators  # noqa: F401  (self-registers)

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: v.oracle for k, v in all_specs().items() if v.oracle is not None}
