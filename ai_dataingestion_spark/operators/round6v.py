"""Round-5 forty-eighth wave (SURVEY.md §2.Q, continued): portable
order-independent table-content fingerprints.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.ai.dedup import _duck_h, _spark_h

# Canonical row text per table: every column rendered through a type
# whose string form is engine-identical (ints, strings, DECIMAL(19,2),
# DATE) — raw doubles are excluded because CAST(double AS STRING)
# formatting diverges across engines.
_ORDERS_CANON_SQL = (
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
    " || '|' || o_orderstatus || '|' ||"
    " CAST(CAST(o_totalprice AS DECIMAL(19,2)) AS VARCHAR) || '|' ||"
    " CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' ||"
    " o_orderpriority"
)
_CUSTOMER_CANON_SQL = (
    "CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||"
    " CAST(c_nationkey AS VARCHAR) || '|' ||"
    " CAST(CAST(c_acctbal AS DECIMAL(19,2)) AS VARCHAR) || '|' ||"
    " c_mktsegment"
)


@register(
    "quality_table_fingerprint",
    oracle=f"""
SELECT 'orders' AS table_name, count(*) AS n_rows,
       CAST(sum(CAST({_duck_h(f"({_ORDERS_CANON_SQL})")} AS DECIMAL(38,0)))
            AS VARCHAR) AS content_fingerprint
FROM orders
UNION ALL
SELECT 'customer', count(*),
       CAST(sum(CAST({_duck_h(f"({_CUSTOMER_CANON_SQL})")} AS DECIMAL(38,0)))
            AS VARCHAR)
FROM customer
""",
)
def quality_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table-CONTENT fingerprint: md5-derived 60-bit
    row hashes over a canonical column rendering, summed in
    DECIMAL(38,0) — two replicas of a table match iff their
    fingerprints match, regardless of row order, partitioning, or file
    layout (the replication/migration audit that row counts alone
    can't give; pipeline_shard_manifest fingerprints FILES, this
    fingerprints CONTENT). The canonical rendering casts every column
    through engine-identical string forms — ints, DECIMAL(19,2), DATE
    — because raw double formatting diverges across engines. Sum (not
    xor) keeps the aggregate partial-aggregable AND sensitive to
    duplicate-row multiplicity; DECIMAL(38,0) absorbs the 60-bit ×
    corpus-count growth that overflows BIGINT. One scan per table,
    1-row output each."""
    t = Tables(spark, sf_dir)
    spark_orders_canon = (
        "CAST(o_orderkey AS STRING) || '|' || CAST(o_custkey AS STRING)"
        " || '|' || o_orderstatus || '|' ||"
        " CAST(CAST(o_totalprice AS DECIMAL(19,2)) AS STRING) || '|' ||"
        " CAST(CAST(o_orderdate AS DATE) AS STRING) || '|' ||"
        " o_orderpriority"
    )
    spark_customer_canon = (
        "CAST(c_custkey AS STRING) || '|' || c_name || '|' ||"
        " CAST(c_nationkey AS STRING) || '|' ||"
        " CAST(CAST(c_acctbal AS DECIMAL(19,2)) AS STRING) || '|' ||"
        " c_mktsegment"
    )

    def fp(name: str, df: DataFrame, canon: str) -> DataFrame:
        h = F.expr(_spark_h(f"({canon})")).cast("decimal(38,0)")
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(h).cast("string").alias("content_fingerprint"),
        ).select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "content_fingerprint",
        )

    return fp("orders", t.orders, spark_orders_canon).unionByName(
        fp("customer", t.customer, spark_customer_canon)
    )
