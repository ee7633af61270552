"""Round-5 twenty-eighth wave (SURVEY.md §2.Q, continued): CUPED
variance reduction, log2 heavy-tail histogram, a composite supplier
scorecard, and experiment sample-size calculation — closing the
experimentation suite (z-test, Welch t, DiD, CUPED, power).

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


def _pround(col, dp: int = 6):
    """Portable IEEE rounding floor(x*10^dp + 0.5)/10^dp (see
    tpch_q2_min_cost_supplier)."""
    scale = 10**dp
    return F.floor(col * scale + 0.5) / scale


_CUPED_CUT = "2024-01-15"


@register(
    "events_cuped_adjustment",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                       THEN CAST(value AS DECIMAL(19, 2)) ELSE 0 END)
              AS DOUBLE) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                       THEN CAST(value AS DECIMAL(19, 2)) ELSE 0 END)
              AS DOUBLE) AS y
  FROM events GROUP BY user_id
),
mo AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(floor(x * 1000000 + 0.5) / 1000000
                       AS DECIMAL(28, 6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(floor(y * 1000000 + 0.5) / 1000000
                       AS DECIMAL(28, 6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(floor(x * y * 1000000 + 0.5) / 1000000
                       AS DECIMAL(38, 6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(floor(x * x * 1000000 + 0.5) / 1000000
                       AS DECIMAL(38, 6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(floor(y * y * 1000000 + 0.5) / 1000000
                       AS DECIMAL(38, 6))) AS DOUBLE) AS syy
  FROM per_user
)
SELECT n,
       floor((sxy - sx * sy / n) / (sxx - sx * sx / n) * 1000000 + 0.5)
         / 1000000 AS theta,
       floor((syy - sy * sy / n) / (n - 1) * 1000000 + 0.5) / 1000000
         AS var_y,
       floor(((syy - sy * sy / n)
              - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                / (sxx - sx * sx / n)) / (n - 1) * 1000000 + 0.5) / 1000000
         AS var_y_cuped,
       floor((1 - ((syy - sy * sy / n)
                   - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                     / (sxx - sx * sx / n))
                  / (syy - sy * sy / n)) * 1000000 + 0.5) / 1000000
         AS variance_reduction
FROM mo
""",
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): per user, the
    pre-period value total X becomes the covariate for the post-period
    metric Y; θ = cov(X,Y)/var(X), and var(Y − θX) = var(Y)·(1 − ρ²) —
    the standard trick that cuts experiment runtimes by the squared
    pre/post correlation. Per-user X/Y from exact DECIMAL sums; cross
    moments use the 6dp-round-then-DECIMAL-accumulate idiom so Σxy is
    order-independent; θ and both variances derive with identical IEEE
    order. One per-user reduce, then a single moment row."""
    e = Tables(spark, sf_dir).events
    dec = F.col("value").cast("decimal(19,2)")
    pre = F.col("ts") < F.lit(_CUPED_CUT).cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(pre, dec).otherwise(F.lit(0))).cast("double").alias("x"),
        F.sum(F.when(~pre, dec).otherwise(F.lit(0)))
        .cast("double")
        .alias("y"),
    )
    mo = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_pround(F.col("x")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sx"),
        F.sum(_pround(F.col("y")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sy"),
        F.sum(_pround(F.col("x") * F.col("y")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(_pround(F.col("x") * F.col("x")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(_pround(F.col("y") * F.col("y")).cast("decimal(38,6)"))
        .cast("double")
        .alias("syy"),
    )
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    var_y = cyy / (F.col("n") - 1)
    var_cuped = (cyy - cxy * cxy / cxx) / (F.col("n") - 1)
    return mo.select(
        "n",
        _pround(cxy / cxx).alias("theta"),
        _pround(var_y).alias("var_y"),
        _pround(var_cuped).alias("var_y_cuped"),
        _pround(1 - (cyy - cxy * cxy / cxx) / cyy).alias(
            "variance_reduction"
        ),
    )


@register(
    "agg_log2_histogram",
    oracle="""
SELECT CAST(floor(ln(o_totalprice) / ln(2)) AS BIGINT) AS log2_bin,
       count(*) AS n,
       CAST(round(min(o_totalprice), 2) AS DOUBLE) AS bin_min,
       CAST(round(max(o_totalprice), 2) AS DOUBLE) AS bin_max
FROM orders WHERE o_totalprice > 0
GROUP BY 1
""",
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂ (powers-of-two band) histogram of order totals — the
    binning that actually renders heavy-tailed money/size/latency
    distributions, where agg_histogram_bins' equi-width bands put 95%
    of rows in bin 0 and agg_equidepth_histogram hides the tail's
    magnitude. bin = ⌊ln x / ln 2⌋ on positives — pure comparison-free
    expression arithmetic (ln is correctly-rounded IEEE in both
    engines, and the floor boundary sits at exact powers of two no
    corpus double lands on). Output bounded by the value range's
    log, ~20 rows at any scale."""
    o = Tables(spark, sf_dir).orders.filter(F.col("o_totalprice") > 0)
    bin_ = F.floor(F.log(F.col("o_totalprice")) / F.log(F.lit(2.0))).cast(
        "bigint"
    )
    return o.groupBy(bin_.alias("log2_bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).cast("double").alias("bin_min"),
        F.round(F.max("o_totalprice"), 2).cast("double").alias("bin_max"),
    )


@register(
    "supplier_scorecard_composite",
    oracle="""
WITH metrics AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19, 2))) AS DOUBLE)
           AS volume,
         CAST(sum(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE))) AS DOUBLE)
           / count(*) AS mean_latency
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_suppkey
),
cuts AS (
  SELECT min(volume) AS vlo, max(volume) AS vhi,
         min(mean_latency) AS llo, max(mean_latency) AS lhi
  FROM metrics
),
scored AS (
  SELECT l_suppkey,
         floor((0.6 * ((volume - vlo) / (vhi - vlo))
                + 0.4 * (1 - (mean_latency - llo) / (lhi - llo)))
               * 1000000 + 0.5) / 1000000 AS score
  FROM metrics CROSS JOIN cuts
)
SELECT l_suppkey, score, CAST(rn AS BIGINT) AS rank FROM (
  SELECT l_suppkey, score,
         row_number() OVER (ORDER BY score DESC, l_suppkey) AS rn
  FROM scored)
WHERE rn <= 10
""",
)
def supplier_scorecard_composite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composite supplier scorecard: min-max-normalized volume (higher
    better, weight 0.6) blended with normalized mean ship latency
    (lower better, weight 0.4), top-10 ranked — the weighted-KPI
    scorecard pattern every vendor/partner review runs, built from
    the fn_minmax_scale_check normalization and the rounded-before-
    rank determinism rule. One orderkey join, suppliers-sized metric
    relation, broadcast cuts."""
    t = Tables(spark, sf_dir)
    metrics = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(19,2)"))
            .cast("double")
            .alias("volume"),
            (
                F.sum(
                    F.datediff(
                        F.to_date("l_shipdate"), F.to_date("o_orderdate")
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_latency"),
        )
    )
    cuts = metrics.agg(
        F.min("volume").alias("vlo"),
        F.max("volume").alias("vhi"),
        F.min("mean_latency").alias("llo"),
        F.max("mean_latency").alias("lhi"),
    )
    score = _pround(
        0.6 * ((F.col("volume") - F.col("vlo")) / (F.col("vhi") - F.col("vlo")))
        + 0.4
        * (
            1
            - (F.col("mean_latency") - F.col("llo"))
            / (F.col("lhi") - F.col("llo"))
        )
    )
    scored = metrics.crossJoin(F.broadcast(cuts)).select(
        "l_suppkey", score.alias("score")
    )
    w = Window.orderBy(F.desc("score"), F.asc("l_suppkey"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "l_suppkey", "score", F.col("rn").cast("bigint").alias("rank")
        )
    )


@register(
    "events_sample_size_calc",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(19, 2))) AS DOUBLE) AS y
  FROM events GROUP BY user_id
),
mo AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(floor(y * 1000000 + 0.5) / 1000000
                       AS DECIMAL(28, 6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(floor(y * y * 1000000 + 0.5) / 1000000
                       AS DECIMAL(38, 6))) AS DOUBLE) AS syy
  FROM per_user
)
SELECT n AS n_users_observed,
       floor((syy - sy * sy / n) / (n - 1) * 1000000 + 0.5) / 1000000
         AS metric_variance,
       -- n per arm = 2 sigma^2 (z_{a/2} + z_b)^2 / delta^2,
       -- alpha=.05 (1.959964), power=.8 (0.841621), delta = 5% of mean
       CAST(ceil(2 * ((syy - sy * sy / n) / (n - 1))
                 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                 / ((0.05 * (sy / n)) * (0.05 * (sy / n))))
            AS BIGINT) AS n_per_arm_required,
       CAST(CASE WHEN n >= 2 * ceil(2 * ((syy - sy * sy / n) / (n - 1))
                      * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                      / ((0.05 * (sy / n)) * (0.05 * (sy / n))))
                 THEN 1 ELSE 0 END AS INT) AS currently_powered
FROM mo
""",
)
def events_sample_size_calc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power / sample-size calculation from observed data:
    n-per-arm = 2σ²(z_{α/2}+z_β)²/δ² for α=0.05, power 0.8, and a
    minimum detectable effect of 5% of the current mean — the
    answer to "can we even run this test?", computed from the
    per-user metric's observed variance (the same moment pipeline as
    CUPED, whose variance_reduction directly shrinks this n). The z
    constants are fixed literals shared with the oracle; moments use
    the round-then-DECIMAL idiom; output is one row with the
    go/no-go flag."""
    e = Tables(spark, sf_dir).events
    per_user = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(19,2)")).cast("double").alias("y")
    )
    mo = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_pround(F.col("y")).cast("decimal(28,6)"))
        .cast("double")
        .alias("sy"),
        F.sum(_pround(F.col("y") * F.col("y")).cast("decimal(38,6)"))
        .cast("double")
        .alias("syy"),
    )
    var = (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    z = 1.959964 + 0.841621
    delta = 0.05 * (F.col("sy") / F.col("n"))
    n_req = F.ceil(2 * var * z * z / (delta * delta))
    return mo.select(
        F.col("n").alias("n_users_observed"),
        _pround(var).alias("metric_variance"),
        n_req.cast("bigint").alias("n_per_arm_required"),
        F.when(F.col("n") >= 2 * n_req, 1)
        .otherwise(0)
        .cast("int")
        .alias("currently_powered"),
    )
