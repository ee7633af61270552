"""§2.F Sorts / limits / top-k.

The driver's value hash is order-insensitive, so sort correctness is made
observable by materializing the position as a `row_number` column. Global
top-k compiles to TakeOrderedAndProject — per-partition heaps + driver merge,
never a full sort — which is exactly the plan wanted at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "sort_multi",
    oracle="""
SELECT c_custkey, c_mktsegment, seg_or_null, round(c_acctbal, 2) AS acctbal,
       row_number() OVER (
         ORDER BY seg_or_null ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC
       ) AS pos
FROM (
  SELECT *, nullif(c_mktsegment, 'BUILDING') AS seg_or_null FROM customer
)
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with mixed asc/desc and NULLS FIRST, exposed via a
    position column (nullif injects nulls so the null-ordering is exercised)."""
    c = Tables(spark, sf_dir).customer.withColumn(
        "seg_or_null", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    )
    order = [
        F.col("seg_or_null").asc_nulls_first(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    ]
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "seg_or_null",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.row_number().over(Window.orderBy(*order)).alias("pos"),
    )


@register(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price with a deterministic tiebreak; plans as
    TakeOrderedAndProject (no global sort)."""
    return (
        Tables(spark, sf_dir)
        .orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 15 OFFSET 25
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination slice (rows 26..40 of the deterministic price ranking)."""
    return (
        Tables(spark, sf_dir)
        .orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(25)
        .limit(15)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )
