"""Round-5 forty-sixth wave (SURVEY.md §2.Q, continued): sample-ratio
mismatch guard, functional-dependency discovery, and a temporal
coverage inventory.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

_CHI2_95_DF1 = 3.841458820694124


@register(
    "events_ab_srm_check",
    oracle=f"""
WITH arms AS (
  SELECT CASE WHEN substring(md5('srm' || CAST(user_id AS VARCHAR)), 1, 1)
                   <= '7'
              THEN 'A' ELSE 'B' END AS arm
  FROM (SELECT DISTINCT user_id FROM events)
),
cnt AS (
  SELECT count(CASE WHEN arm = 'A' THEN 1 END) AS na,
         count(CASE WHEN arm = 'B' THEN 1 END) AS nb,
         count(*) AS n
  FROM arms
)
SELECT CAST(na AS BIGINT) AS n_arm_a,
       CAST(nb AS BIGINT) AS n_arm_b,
       round((na - n / 2.0) * (na - n / 2.0) / (n / 2.0)
             + (nb - n / 2.0) * (nb - n / 2.0) / (n / 2.0), 6) AS chi2,
       (na - n / 2.0) * (na - n / 2.0) / (n / 2.0)
         + (nb - n / 2.0) * (nb - n / 2.0) / (n / 2.0)
         > {_CHI2_95_DF1} AS srm_detected
FROM cnt
""",
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) guard for the deterministic 50/50
    md5 user split every A/B operator here relies on
    (events_ab_proportion_ztest, CUPED, DiD): a χ²₁ goodness-of-fit of
    observed arm sizes against the designed ratio — THE pre-test that
    invalidates an experiment before any metric is read (Fabijan
    2019). Nibbles 0-7 vs 8-f give an exactly-50/50 design; all
    inputs are integer counts off the distinct-user aggregate, the
    χ² threshold is the same literal on both engines, and the flag
    compares identical doubles. One distinct + one 1-row reduce."""
    e = Tables(spark, sf_dir).events
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("srm"), F.col("user_id").cast("string"))),
            1,
            1,
        )
        <= "7",
        "A",
    ).otherwise("B")
    arms = e.select("user_id").distinct().select(arm.alias("arm"))
    cnt = arms.agg(
        F.count(F.when(F.col("arm") == "A", 1)).alias("na"),
        F.count(F.when(F.col("arm") == "B", 1)).alias("nb"),
        F.count(F.lit(1)).alias("n"),
    )
    half = F.col("n") / 2.0
    chi2 = (F.col("na") - half) * (F.col("na") - half) / half + (
        F.col("nb") - half
    ) * (F.col("nb") - half) / half
    return cnt.select(
        F.col("na").cast("bigint").alias("n_arm_a"),
        F.col("nb").cast("bigint").alias("n_arm_b"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > _CHI2_95_DF1).alias("srm_detected"),
    )


@register(
    "quality_fd_discovery",
    oracle="""
WITH pairs AS (
  SELECT 'l_returnflag->l_linestatus' AS candidate,
         l_returnflag AS det, l_linestatus AS dep
  FROM lineitem
  UNION ALL
  SELECT 'o_orderstatus->o_orderpriority',
         o_orderstatus, o_orderpriority
  FROM orders
  UNION ALL
  SELECT 'c_mktsegment->c_nationkey',
         c_mktsegment, CAST(c_nationkey AS VARCHAR)
  FROM customer
),
cells AS (
  SELECT candidate, det, dep, count(*) AS c
  FROM pairs GROUP BY candidate, det, dep
),
per_det AS (
  SELECT candidate, det, sum(c) AS total, max(c) AS maxc
  FROM cells GROUP BY candidate, det
)
SELECT candidate,
       count(*) AS n_determinant_values,
       CAST(sum(total - maxc) AS BIGINT) AS violation_rows,
       sum(total - maxc) = 0 AS fd_holds
FROM per_det GROUP BY candidate
""",
)
def quality_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (the TANE-style g₃ error
    measure, Huhtala 1999): for each candidate A→B, the minimum number
    of rows to delete for the dependency to hold — Σ over A-groups of
    (group size − modal B count). Zero = the FD holds exactly;
    large = the columns are independent — the profiling signal that
    finds hidden keys and denormalization-safe column pairs, which
    quality_profile's per-column stats cannot see (it is a PAIR
    property). Three stacked candidates in one pass; both aggregates
    are partial-aggregable and the per-determinant relation is
    value-bounded."""
    t = Tables(spark, sf_dir)
    pairs = (
        t.lineitem.select(
            F.lit("l_returnflag->l_linestatus").alias("candidate"),
            F.col("l_returnflag").alias("det"),
            F.col("l_linestatus").alias("dep"),
        )
        .unionAll(
            t.orders.select(
                F.lit("o_orderstatus->o_orderpriority").alias("candidate"),
                F.col("o_orderstatus").alias("det"),
                F.col("o_orderpriority").alias("dep"),
            )
        )
        .unionAll(
            t.customer.select(
                F.lit("c_mktsegment->c_nationkey").alias("candidate"),
                F.col("c_mktsegment").alias("det"),
                F.col("c_nationkey").cast("string").alias("dep"),
            )
        )
    )
    cells = pairs.groupBy("candidate", "det", "dep").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_det = cells.groupBy("candidate", "det").agg(
        F.sum("c").alias("total"), F.max("c").alias("maxc")
    )
    return per_det.groupBy("candidate").agg(
        F.count(F.lit(1)).alias("n_determinant_values"),
        F.sum(F.col("total") - F.col("maxc"))
        .cast("bigint")
        .alias("violation_rows"),
        (F.sum(F.col("total") - F.col("maxc")) == 0).alias("fd_holds"),
    )


@register(
    "catalog_temporal_coverage",
    oracle="""
SELECT 'orders' AS table_name, count(*) AS n_rows,
       CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS min_ts,
       CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS max_ts,
       datediff('day', CAST(min(o_orderdate) AS DATE),
                CAST(max(o_orderdate) AS DATE)) AS span_days
FROM orders
UNION ALL
SELECT 'lineitem', count(*),
       CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR),
       CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR),
       datediff('day', CAST(min(l_shipdate) AS DATE),
                CAST(max(l_shipdate) AS DATE))
FROM lineitem
UNION ALL
SELECT 'events', count(*),
       CAST(CAST(min(ts) AS DATE) AS VARCHAR),
       CAST(CAST(max(ts) AS DATE) AS VARCHAR),
       datediff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
FROM events
""",
)
def catalog_temporal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal coverage inventory across every time-bearing table:
    row count, first/last timestamp, and span — the freshness/coverage
    sheet an ingestion catalog serves next to catalog_table_stats'
    size metrics (a table whose max_ts stopped advancing is the
    first symptom of a dead feed). Min/max aggregates only — each
    table contributes one partial-aggregable scan and one row.
    Timestamps are emitted as canonical strings (the §5.4 date-dtype
    rule). Events dates truncate ns→day identically on both engines."""
    t = Tables(spark, sf_dir)

    def one(name: str, df: DataFrame, col: str) -> DataFrame:
        c = F.col(col).cast("date")
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(c).cast("string").alias("min_ts"),
            F.max(c).cast("string").alias("max_ts"),
            F.datediff(F.max(c), F.min(c)).alias("span_days"),
        ).select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "min_ts",
            "max_ts",
            "span_days",
        )

    return (
        one("orders", t.orders, "o_orderdate")
        .unionByName(one("lineitem", t.lineitem, "l_shipdate"))
        .unionByName(one("events", t.events, "ts"))
    )
