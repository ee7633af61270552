"""Round-5 forty-fifth wave (SURVEY.md §2.Q, continued): leave-one-out
outlier scoring via window-frame arithmetic and a cube margin
consistency proof.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "win_loo_outlier_zscore",
    oracle="""
WITH m AS (
  SELECT l_returnflag AS flag,
         CAST(CAST(l_extendedprice AS DECIMAL(19,2)) AS DOUBLE) AS xd,
         count(*) OVER w AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2))) OVER w
              AS DOUBLE) AS s1,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2))
                  * CAST(l_extendedprice AS DECIMAL(19,2))) OVER w
              AS DOUBLE) AS s2
  FROM lineitem
  WINDOW w AS (PARTITION BY l_returnflag)
),
loo AS (
  SELECT flag, n,
         (xd - (s1 - xd) / (n - 1))
         / sqrt(((n - 1) * (s2 - xd * xd) - (s1 - xd) * (s1 - xd))
                / (CAST(n - 1 AS DOUBLE) * (n - 2))) AS z
  FROM m WHERE n > 2
)
SELECT flag AS l_returnflag,
       CAST(max(n) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_loo_outliers,
       round(max(abs(z)), 6) AS max_abs_z
FROM loo GROUP BY flag
""",
)
def win_loo_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out outlier scoring: each line's z-score against the
    mean and stddev of its group WITHOUT ITSELF — the estimator that
    fixes plain z-scores' self-masking (a huge outlier inflates the σ
    it is judged by; quality_outlier_iqr sidesteps via quantiles, this
    stays in moment space). No per-row re-aggregation: the LOO moments
    are pure frame arithmetic on the group totals — mean₋ᵢ = (S−x)/
    (n−1), var₋ᵢ from (n−1)(S₂−x²)−(S−x)² — so ONE partition window
    pass prices every row's held-out estimate. All sums are DECIMAL
    (the moment-sum portability rule) and floats appear only in the
    final ratio; output rolls up to 3 rows at any scale."""
    li = Tables(spark, sf_dir).lineitem
    xdec = F.col("l_extendedprice").cast("decimal(19,2)")
    w = Window.partitionBy("l_returnflag")
    # Exact DECIMAL window sums, converted ONCE to double: both engines
    # then run identical IEEE arithmetic (the burstiness rule applied to
    # per-row frame math; DECIMAL(19,2) operands per the 5.4 HHI rule).
    m = li.select(
        "l_returnflag",
        xdec.cast("double").alias("xd"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(xdec).over(w).cast("double").alias("s1"),
        F.sum(xdec * xdec).over(w).cast("double").alias("s2"),
    ).where(F.col("n") > 2)
    mean_loo = (F.col("s1") - F.col("xd")) / (F.col("n") - 1)
    var_num = (F.col("n") - 1) * (
        F.col("s2") - F.col("xd") * F.col("xd")
    ) - (F.col("s1") - F.col("xd")) * (F.col("s1") - F.col("xd"))
    sd_loo = F.sqrt(
        var_num / ((F.col("n") - 1).cast("double") * (F.col("n") - 2))
    )
    loo = m.select(
        "l_returnflag",
        "n",
        ((F.col("xd") - mean_loo) / sd_loo).alias("z"),
    )
    # keep the SAME l_returnflag attribute end-to-end: renaming the key
    # anywhere between the window and the rollup breaks exchange reuse
    # (measured: an aliased grouping key forced a second shuffle)
    return loo.groupBy("l_returnflag").agg(
        F.max("n").cast("bigint").alias("n_lines"),
        F.sum(F.when(F.abs("z") > 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_loo_outliers"),
        F.round(F.max(F.abs("z")), 6).alias("max_abs_z"),
    )


@register(
    "agg_cube_margin_consistency",
    oracle="""
WITH cells AS (
  SELECT CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END * 2
         + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END AS gid,
         rev
  FROM (
    SELECT o_orderstatus, o_orderpriority,
           sum(CAST(o_totalprice AS DECIMAL(19,2))) AS rev
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
  )
)
SELECT gid AS grouping_level,
       count(*) AS n_cells,
       CAST(round(sum(rev), 2) AS DOUBLE) AS total_revenue
FROM cells GROUP BY gid
""",
)
def agg_cube_margin_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE margin-consistency proof: every grouping level of the
    (status, priority) cube — detail cells, the two 1-D margins, and
    the grand total — must re-aggregate to the SAME DECIMAL revenue
    (a cube is four disjoint partitions of one fact set; a mismatch
    would mean the multi-level aggregate double- or under-counted).
    The proof the agg_cube contract row doesn't state: its cells are
    internally reconcilable, which is what makes cube output safe to
    cache and slice downstream. One CUBE pass, grouping level derived
    from the NULL pattern identically on both engines, 4 rows out."""
    o = Tables(spark, sf_dir).orders
    cube = o.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(19,2)")).alias("rev")
    )
    gid = (
        F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0) * 2
        + F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
    )
    return (
        cube.select(gid.alias("grouping_level"), "rev")
        .groupBy("grouping_level")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum("rev"), 2).cast("double").alias("total_revenue"),
        )
    )
