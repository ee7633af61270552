"""§2.L Pipeline / data-quality operators: profiling, constraint checking,
schema-drift tolerance.

The profiling battery computes every column's stats in ONE pass over the
table (a single agg projection) — at 100 TB a per-column loop would scan the
table N_cols times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
)


@register(
    "quality_profile",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{c}' AS col_name,
       count(*) - count({c})              AS n_null,
       count(DISTINCT {c})                AS n_distinct,
       CAST(min({c}) AS VARCHAR)          AS min_str,
       CAST(max({c}) AS VARCHAR)          AS max_str
FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion profile of orders: per-column null count, distinct count,
    min/max (stringified) — one row per column, computed in a single scan
    (all aggregates in one projection, then restacked via stack())."""
    o = Tables(spark, sf_dir).orders
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, n_null, n_distinct, min_str, max_str)"
        )
    )


@register(
    "quality_constraints",
    oracle="""
WITH orders_with_dups AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 500 = 0
),
pk_violations AS (
  SELECT 'pk_duplicate' AS violation, CAST(o_orderkey AS VARCHAR) AS key,
         CAST(count(*) AS VARCHAR) AS detail
  FROM orders_with_dups GROUP BY o_orderkey HAVING count(*) > 1
),
fk_violations AS (
  SELECT 'fk_orphan' AS violation, CAST(o_custkey AS VARCHAR) AS key,
         'orders.o_custkey not in customer' AS detail
  FROM (SELECT DISTINCT o_custkey FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
),
range_violations AS (
  SELECT 'negative_acctbal' AS violation, CAST(c_custkey AS VARCHAR) AS key,
         CAST(round(c_acctbal, 2) AS VARCHAR) AS detail
  FROM customer WHERE c_acctbal < 0
)
SELECT * FROM pk_violations
UNION ALL SELECT * FROM fk_violations
UNION ALL SELECT * FROM range_violations
""",
)
def quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit emitting a violations table: PK uniqueness (dups
    injected every 500th order so the check provably fires), FK containment
    orders→customer (anti-join), and a value-range rule (negative account
    balances, which occur naturally). Empty subresults are valid passes."""
    t = Tables(spark, sf_dir)
    o = t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
    with_dups = o.unionByName(o.filter(F.col("o_orderkey") % 500 == 0))

    pk = (
        with_dups.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .select(
            F.lit("pk_duplicate").alias("violation"),
            F.col("o_orderkey").cast("string").alias("key"),
            F.col("count").cast("string").alias("detail"),
        )
    )
    fk = (
        t.orders.select("o_custkey")
        .distinct()
        .join(
            t.customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .select(
            F.lit("fk_orphan").alias("violation"),
            F.col("o_custkey").cast("string").alias("key"),
            F.lit("orders.o_custkey not in customer").alias("detail"),
        )
    )
    rng = t.customer.filter(F.col("c_acctbal") < 0).select(
        F.lit("negative_acctbal").alias("violation"),
        F.col("c_custkey").cast("string").alias("key"),
        F.round("c_acctbal", 2).cast("string").alias("detail"),
    )
    return pk.unionByName(fk).unionByName(rng)


@register(
    "schema_evolve",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
UNION ALL
SELECT o_orderkey, NULL AS o_totalprice, o_orderpriority
FROM orders WHERE o_orderstatus = 'O'
""",
)
def schema_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union: a newer batch missing the o_totalprice
    column is unioned with allowMissingColumns=True — the engine fills
    nulls instead of failing ingestion."""
    o = Tables(spark, sf_dir).orders
    old_batch = o.select("o_orderkey", "o_totalprice", "o_orderpriority")
    new_batch = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderpriority"
    )
    return old_batch.unionByName(new_batch, allowMissingColumns=True)
