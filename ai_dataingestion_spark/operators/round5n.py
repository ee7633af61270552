"""Round-5 fourteenth wave (SURVEY.md §2.Q, continued): Arrow-optimized
Python UDF surface, write-mode semantics matrix, the NOT IN + NULL
three-valued-logic trap pinned, and a data-contract rule check.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables, register_views
from ai_dataingestion_spark.tmpdirs import op_tmpdir


@register(
    "udf_python_arrow",
    oracle="""
SELECT o_orderkey,
       lower(replace(o_orderpriority, '-', '_')) AS priority_slug
FROM orders
""",
)
def udf_python_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (`useArrow=True`, Spark 3.5+): same
    row-wise signature as the classic pickled UDF but the executor⇄Python
    transfer is Arrow-batched — the migration path for legacy UDF code
    that can't be vectorized yet (§2.J surface completion next to
    udf_python / udf_pandas_scalar). The logic (priority slugging) is
    deliberately trivial; what's under test is the Arrow serialization
    round-trip of the modern UDF flavor."""

    @F.udf(StringType(), useArrow=True)
    def slug(p: str) -> str:
        return p.replace("-", "_").lower()

    o = Tables(spark, sf_dir).orders
    return o.select("o_orderkey", slug("o_orderpriority").alias("priority_slug"))


@register(
    "sink_write_modes",
    oracle="""
WITH n AS (SELECT count(*) AS c FROM orders WHERE o_orderkey % 10 = 0)
SELECT 'overwrite' AS step, c AS rows_after FROM n
UNION ALL SELECT 'append', 2 * c FROM n
UNION ALL SELECT 'ignore', 2 * c FROM n
UNION ALL SELECT 'error_caught', 1
""",
)
def sink_write_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-mode semantics matrix against one parquet target: overwrite
    establishes n rows, append doubles them, ignore against the existing
    target is a silent no-op (still 2n), and errorifexists raises — the
    four-mode contract every idempotent-ingestion design builds on
    (re-run safety = ignore or overwrite; at-least-once landing =
    append + downstream dedup). Each step re-reads and counts the
    target; the raised error is caught and reported as its own row."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_orderkey") % 10 == 0)
    target = op_tmpdir("sink_modes_")
    schema = "o_orderkey bigint, o_orderstatus string"
    slim = o.select("o_orderkey", "o_orderstatus")

    def count_target() -> int:
        return spark.read.schema(schema).parquet(target).count()

    rows = []
    slim.write.mode("overwrite").parquet(target)
    rows.append(("overwrite", count_target()))
    slim.write.mode("append").parquet(target)
    rows.append(("append", count_target()))
    slim.write.mode("ignore").parquet(target)
    rows.append(("ignore", count_target()))
    try:
        slim.write.mode("errorifexists").parquet(target)
        rows.append(("error_caught", 0))
    except Exception:
        rows.append(("error_caught", 1))
    return spark.createDataFrame(rows, "step string, rows_after bigint")


@register(
    "subquery_not_in_null_trap",
    oracle="""
WITH keys AS (
  SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer
)
SELECT
  (SELECT count(*) FROM orders WHERE o_custkey IN (SELECT k FROM keys))
    AS n_in,
  (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM keys))
    AS n_not_in,
  (SELECT count(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = o.o_custkey))
    AS n_not_exists,
  (SELECT count(*) FROM orders) AS n_total
""",
)
def subquery_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN + NULL three-valued-logic trap, pinned as executable
    documentation: when the subquery list contains a single NULL,
    `x NOT IN (...)` is never TRUE (x <> NULL is UNKNOWN), so n_not_in
    collapses to 0 while the NOT EXISTS spelling counts real
    non-members — the most common silent-wrong-answer rewrite in
    analytics SQL. Both engines must agree on all four counts
    (membership, the collapsed NOT IN, the anti-join truth, total).
    Spark plans the NOT IN as a null-aware anti join — same SQL text on
    both sides via the registered-view entry point (§3.2 EP2)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH keys AS (
  SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer
)
SELECT
  (SELECT count(*) FROM orders WHERE o_custkey IN (SELECT k FROM keys))
    AS n_in,
  (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT k FROM keys))
    AS n_not_in,
  (SELECT count(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = o.o_custkey))
    AS n_not_exists,
  (SELECT count(*) FROM orders) AS n_total
"""
    )


@register(
    "quality_schema_contract",
    oracle="""
SELECT 'orderkey_unique' AS rule,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
FROM orders
UNION ALL
SELECT 'orderkey_not_null',
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'status_in_domain',
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'totalprice_positive',
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderdate_in_range',
       CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                       OR o_orderdate >= TIMESTAMP '2010-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'priority_pattern',
       CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
""",
)
def quality_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract enforcement report: six declarative rules (key
    uniqueness, non-null key, enum domain, positivity, date range,
    format pattern) evaluated in ONE pass over orders — violations per
    rule, zero meaning the contract holds. This is the producer-side
    gate of a data-mesh handoff: the consumer pins the contract, the
    pipeline ships the report. Spark computes all six aggregates in a
    single scan and unpivots with stack() (the quality_null_blank_matrix
    idiom); the oracle spells the per-rule UNION ALL contract."""
    o = Tables(spark, sf_dir).orders
    agg = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("orderkey_unique"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orderkey_not_null"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("status_in_domain"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("totalprice_positive"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2010-01-01").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("orderdate_in_range"),
        F.sum(
            F.when(~F.col("o_orderpriority").rlike("^[1-5]-"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("priority_pattern"),
    )
    return agg.select(
        F.expr(
            "stack(6, "
            "'orderkey_unique', orderkey_unique, "
            "'orderkey_not_null', orderkey_not_null, "
            "'status_in_domain', status_in_domain, "
            "'totalprice_positive', totalprice_positive, "
            "'orderdate_in_range', orderdate_in_range, "
            "'priority_pattern', priority_pattern) AS (rule, violations)"
        )
    )
