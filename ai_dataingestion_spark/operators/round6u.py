"""Round-5 forty-seventh wave (SURVEY.md §2.Q, continued): Simpson's
paradox reversal detection and column-level change-data-capture
breakdown.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables

_SEG_A = "BUILDING"
_SEG_B = "MACHINERY"


@register(
    "orders_simpsons_reversal_check",
    oracle=f"""
WITH base AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CAST(o_totalprice AS DECIMAL(19,2)) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{_SEG_A}', '{_SEG_B}')
),
strata AS (
  SELECT nk,
         CAST(sum(CASE WHEN seg = '{_SEG_A}' THEN v END) AS DOUBLE)
           / count(CASE WHEN seg = '{_SEG_A}' THEN 1 END)
         - CAST(sum(CASE WHEN seg = '{_SEG_B}' THEN v END) AS DOUBLE)
           / count(CASE WHEN seg = '{_SEG_B}' THEN 1 END) AS diff
  FROM base GROUP BY nk
  HAVING count(CASE WHEN seg = '{_SEG_A}' THEN 1 END) > 0
     AND count(CASE WHEN seg = '{_SEG_B}' THEN 1 END) > 0
),
overall AS (
  SELECT CAST(sum(CASE WHEN seg = '{_SEG_A}' THEN v END) AS DOUBLE)
           / count(CASE WHEN seg = '{_SEG_A}' THEN 1 END)
         - CAST(sum(CASE WHEN seg = '{_SEG_B}' THEN v END) AS DOUBLE)
           / count(CASE WHEN seg = '{_SEG_B}' THEN 1 END) AS odiff
  FROM base
)
SELECT round((SELECT odiff FROM overall), 6) AS overall_diff,
       count(*) AS n_strata,
       CAST(sum(CASE WHEN sign(diff) <> sign((SELECT odiff FROM overall))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_reversed,
       round(CAST(sum(CASE WHEN sign(diff)
                                <> sign((SELECT odiff FROM overall))
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS reversal_share
FROM strata
""",
)
def orders_simpsons_reversal_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson's-paradox screen: the BUILDING−MACHINERY mean-order-value
    gap computed overall AND within every customer-nation stratum, with
    the count of strata whose gap has the OPPOSITE sign — a high
    reversal share means the aggregate comparison is confounded by the
    nation mix and any segment-level conclusion must be stratified
    (the audit behind every 'segment X spends more' claim). Means are
    exact-DECIMAL-sum / integer-count on both engines, sign() compares
    identical doubles, and the stratum relation is nations-sized after
    one broadcast-dim join + groupBy."""
    t = Tables(spark, sf_dir)
    v = F.col("o_totalprice").cast("decimal(19,2)")
    base = (
        t.orders.join(
            broadcast_if_small(
                t.customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
                sf_dir,
                "customer",
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .where(F.col("c_mktsegment").isin(_SEG_A, _SEG_B))
        .select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
            v.alias("v"),
        )
    )

    def seg_mean(seg: str):
        return F.sum(F.when(F.col("seg") == seg, F.col("v"))).cast(
            "double"
        ) / F.count(F.when(F.col("seg") == seg, 1))

    strata = (
        base.groupBy("nk")
        .agg(
            (seg_mean(_SEG_A) - seg_mean(_SEG_B)).alias("diff"),
            F.count(F.when(F.col("seg") == _SEG_A, 1)).alias("ca"),
            F.count(F.when(F.col("seg") == _SEG_B, 1)).alias("cb"),
        )
        .where((F.col("ca") > 0) & (F.col("cb") > 0))
    )
    overall = base.agg(
        (seg_mean(_SEG_A) - seg_mean(_SEG_B)).alias("odiff")
    )
    joined = strata.crossJoin(F.broadcast(overall))
    reversed_ = F.when(
        F.signum(F.col("diff")) != F.signum(F.col("odiff")), 1
    ).otherwise(0)
    return joined.agg(
        F.round(F.max("odiff"), 6).alias("overall_diff"),
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(reversed_).cast("bigint").alias("n_reversed"),
        F.round(
            F.sum(reversed_).cast("double") / F.count(F.lit(1)), 6
        ).alias("reversal_share"),
    )


@register(
    "pipeline_cdc_column_breakdown",
    oracle="""
WITH v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0
              THEN round(o_totalprice * 1.1, 2) ELSE o_totalprice END
           AS o_totalprice,
         CASE WHEN o_orderkey % 11 = 0
              THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority,
         o_orderstatus
  FROM orders
),
diff AS (
  SELECT CASE WHEN v2.o_totalprice <> o.o_totalprice THEN 1 ELSE 0 END
           AS price_chg,
         CASE WHEN v2.o_orderpriority <> o.o_orderpriority THEN 1 ELSE 0 END
           AS prio_chg,
         CASE WHEN v2.o_orderstatus <> o.o_orderstatus THEN 1 ELSE 0 END
           AS status_chg
  FROM orders o JOIN v2 ON o.o_orderkey = v2.o_orderkey
)
SELECT col AS column_name, CAST(n AS BIGINT) AS n_rows_changed
FROM (
  SELECT 'o_totalprice' AS col, sum(price_chg) AS n FROM diff
  UNION ALL
  SELECT 'o_orderpriority', sum(prio_chg) FROM diff
  UNION ALL
  SELECT 'o_orderstatus', sum(status_chg) FROM diff
)
""",
)
def pipeline_cdc_column_breakdown(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COLUMN-level CDC drill-down: which columns actually changed
    between two snapshot versions, counted per column — the question
    pipeline_cdc_diff's row-level insert/update/delete classes leave
    open (an 'update' that only touched a derived price column is
    handled very differently from one that flipped priority). The v2
    snapshot derives deterministically from orders (every 7th key's
    price bumped, every 11th's priority forced urgent); the diff is
    one keyed self-join and all three per-column counts come from one
    conditional-aggregate pass — adding a column adds an expression,
    never a scan."""
    o = Tables(spark, sf_dir).orders
    v2 = o.select(
        F.col("o_orderkey").alias("k2"),
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("p2"),
        F.when(F.col("o_orderkey") % 11 == 0, "1-URGENT")
        .otherwise(F.col("o_orderpriority"))
        .alias("pr2"),
        F.col("o_orderstatus").alias("st2"),
    )
    diff = o.join(v2, F.col("o_orderkey") == F.col("k2")).select(
        F.when(F.col("p2") != F.col("o_totalprice"), 1)
        .otherwise(0)
        .alias("price_chg"),
        F.when(F.col("pr2") != F.col("o_orderpriority"), 1)
        .otherwise(0)
        .alias("prio_chg"),
        F.when(F.col("st2") != F.col("o_orderstatus"), 1)
        .otherwise(0)
        .alias("status_chg"),
    )
    agg = diff.agg(
        F.sum("price_chg").alias("o_totalprice"),
        F.sum("prio_chg").alias("o_orderpriority"),
        F.sum("status_chg").alias("o_orderstatus"),
    )
    return agg.select(
        F.expr(
            "stack(3, 'o_totalprice', o_totalprice,"
            " 'o_orderpriority', o_orderpriority,"
            " 'o_orderstatus', o_orderstatus) AS (column_name, n)"
        )
    ).select(
        "column_name", F.col("n").cast("bigint").alias("n_rows_changed")
    )
