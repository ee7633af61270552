"""§2.G Set operations.

unionByName everywhere (positional union is a refactoring hazard);
intersect/except compile to semi/anti joins under Catalyst, so they get the
same broadcast/shuffle treatment as §2.C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "set_union_all",
    oracle="""
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate two event-type slices (no dedup, no shuffle)."""
    e = Tables(spark, sf_dir).events.select("event_id", "user_id", "event_type")
    return e.filter(F.col("event_type") == "click").unionByName(
        e.filter(F.col("event_type") == "purchase")
    )


@register(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicating union of customer vs supplier nation keys."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers and suppliers."""
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with customers but no suppliers (set difference)."""
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
