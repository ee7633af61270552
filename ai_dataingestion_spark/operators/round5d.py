"""Round-5 fourth wave (SURVEY.md §2.Q, continued): statistical screens —
chi-squared independence, Benford first-digit conformance, daily-series
autocorrelation, per-group OLS regression, and multiplicative seasonal
decomposition. Every formula is written as raw power sums / explicit
ratios so Spark and DuckDB evaluate the IDENTICAL expression (the
agg_higher_moments rule: built-in corr/stddev differ in bias correction
across engines); 6-dp rounding absorbs summation order.

Deferred to the r6 driver window like round5b/c (catalog
._DEFER_TO_NEXT_ROUND); locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables


@register(
    "agg_chi_square_independence",
    oracle="""
WITH cells AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri, count(*) AS o
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
),
marged AS (
  SELECT o,
         sum(o) OVER (PARTITION BY seg) AS rt,
         sum(o) OVER (PARTITION BY pri) AS ct,
         sum(o) OVER () AS n
  FROM cells
),
dims AS (
  SELECT count(DISTINCT seg) AS r, count(DISTINCT pri) AS c FROM cells
)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST((max(r) - 1) * (max(c) - 1) AS BIGINT) AS dof,
       round(sum(pow(CAST(o AS DOUBLE)
                     - CAST(rt AS DOUBLE) * ct / n, 2)
                 / (CAST(rt AS DOUBLE) * ct / n)), 6) AS chi2,
       round(sqrt(sum(pow(CAST(o AS DOUBLE)
                          - CAST(rt AS DOUBLE) * ct / n, 2)
                      / (CAST(rt AS DOUBLE) * ct / n))
                  / (max(n) * least(max(r) - 1, max(c) - 1))), 6)
         AS cramers_v
FROM marged CROSS JOIN dims
""",
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between customer market segment
    and order priority, plus Cramér's V effect size — the categorical
    drift screen of a data-quality suite. Aggregate-first: the
    contingency cells are one groupBy (R×C = 25 rows at any corpus
    size); margins are window sums over the cells; the expected-count
    formula is written identically on both sides."""
    t = Tables(spark, sf_dir)
    cells = (
        t.orders.join(
            broadcast_if_small(
                t.customer.select("c_custkey", "c_mktsegment"), sf_dir, "customer"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    marged = cells.select(
        "o",
        "seg",
        "pri",
        F.sum("o").over(Window.partitionBy("seg")).alias("rt"),
        F.sum("o").over(Window.partitionBy("pri")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    term = F.pow(F.col("o").cast("double") - e, 2) / e
    stats = marged.agg(
        F.max("n").alias("n_raw"),
        F.count_distinct("seg").alias("r"),
        F.count_distinct("pri").alias("c"),
        F.sum(term).alias("chi2_raw"),
    )
    return stats.select(
        F.col("n_raw").cast("bigint").alias("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        F.round("chi2_raw", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2_raw")
                / (F.col("n_raw") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "quality_benford_first_digit",
    oracle="""
WITH digits AS (
  SELECT substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit,
         count(*) AS n_orders
  FROM orders WHERE o_totalprice >= 1
  GROUP BY 1
)
SELECT digit, n_orders,
       round(CAST(n_orders AS DOUBLE) / sum(n_orders) OVER (), 6) AS share,
       round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6)
         AS benford_expected,
       round(CAST(n_orders AS DOUBLE) / sum(n_orders) OVER ()
             - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6)
         AS deviation
FROM digits
""",
)
def quality_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit conformance of order totals — the
    classic fabricated-data / unit-mixing screen. One groupBy to the
    9-row digit histogram; expected shares via ln(1+1/d)/ln(10) written
    identically on both sides (synthetic uniform-ish prices will deviate
    — the DEVIATION column is the signal, not an error)."""
    t = Tables(spark, sf_dir)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    )
    digits = (
        t.orders.filter(F.col("o_totalprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    share = F.col("n_orders").cast("double") / F.sum("n_orders").over(
        Window.partitionBy()
    )
    expected = F.log(1.0 + 1.0 / F.col("digit").cast("double")) / F.log(
        F.lit(10.0)
    )
    return digits.select(
        "digit",
        "n_orders",
        F.round(share, 6).alias("share"),
        F.round(expected, 6).alias("benford_expected"),
        F.round(share - expected, 6).alias("deviation"),
    )


@register(
    "events_autocorrelation_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY CAST(ts AS DATE)
),
pairs AS (
  SELECT k.lag, a.x AS x0, b.x AS x1
  FROM daily a
  JOIN (SELECT unnest(generate_series(1, 7)) AS lag) k ON true
  JOIN daily b ON b.day = a.day + CAST(k.lag AS INTEGER)
)
SELECT lag, count(*) AS n_pairs,
       round((avg(x0 * x1) - avg(x0) * avg(x1))
             / sqrt((avg(x0 * x0) - avg(x0) * avg(x0))
                    * (avg(x1 * x1) - avg(x1) * avg(x1))), 6) AS acf
FROM pairs GROUP BY lag
""",
)
def events_autocorrelation_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1-7 —
    the weekly-seasonality detector. Aggregate-first: events collapse to
    the days-sized series in one shuffle; the lag pairing is a keyed
    self-join of that tiny relation against a 7-row lag spine (never the
    raw events), and Pearson r is raw power sums (identical on both
    engines)."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day").alias("day0"), F.col("x").alias("x0"))
    b = daily.select(F.col("day").alias("day1"), F.col("x").alias("x1"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.expr("day1 = date_add(day0, lag)"))
    )
    x0, x1 = F.col("x0"), F.col("x1")
    r = (F.avg(x0 * x1) - F.avg(x0) * F.avg(x1)) / F.sqrt(
        (F.avg(x0 * x0) - F.avg(x0) * F.avg(x0))
        * (F.avg(x1 * x1) - F.avg(x1) * F.avg(x1))
    )
    return pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(r, 6).alias("acf"),
    )


@register(
    "lineitem_discount_quantity_regr",
    oracle="""
WITH obs AS (
  SELECT p_brand, l_discount AS d, CAST(l_quantity AS DOUBLE) AS q
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT p_brand, count(*) AS n,
       round((avg(d * q) - avg(d) * avg(q))
             / (avg(d * d) - avg(d) * avg(d)), 6) AS slope,
       round(avg(q) - (avg(d * q) - avg(d) * avg(q))
                      / (avg(d * d) - avg(d) * avg(d)) * avg(d), 6)
         AS intercept,
       round(pow(avg(d * q) - avg(d) * avg(q), 2)
             / ((avg(d * d) - avg(d) * avg(d))
                * (avg(q * q) - avg(q) * avg(q))), 6) AS r2
FROM obs GROUP BY p_brand
""",
)
def lineitem_discount_quantity_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS regression of quantity on discount (slope,
    intercept, R²) — the price-elasticity proxy, and the grouped
    generalization of agg_corr_regression. One broadcast dim join, one
    partial-aggregable groupBy carrying five power sums; brands-sized
    output at any scale."""
    t = Tables(spark, sf_dir)
    obs = t.lineitem.join(
        broadcast_if_small(t.part.select("p_partkey", "p_brand"), sf_dir, "part"),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.col("l_discount").alias("d"),
        F.col("l_quantity").cast("double").alias("q"),
    )
    d, q = F.col("d"), F.col("q")
    cov = F.avg(d * q) - F.avg(d) * F.avg(q)
    var_d = F.avg(d * d) - F.avg(d) * F.avg(d)
    var_q = F.avg(q * q) - F.avg(q) * F.avg(q)
    return obs.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(cov / var_d, 6).alias("slope"),
        F.round(F.avg(q) - cov / var_d * F.avg(d), 6).alias("intercept"),
        F.round(F.pow(cov, 2) / (var_d * var_q), 6).alias("r2"),
    )


@register(
    "orders_seasonal_index",
    oracle="""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS rev
  FROM orders GROUP BY date_trunc('month', o_orderdate)
),
idx AS (
  SELECT month, rev,
         CAST(datediff('month', min(month) OVER (), month) AS DOUBLE) AS tt
  FROM monthly
),
fitted AS (
  SELECT month, rev, tt,
         (avg(tt * rev) OVER () - avg(tt) OVER () * avg(rev) OVER ())
           / (avg(tt * tt) OVER () - avg(tt) OVER () * avg(tt) OVER ())
           AS slope,
         avg(rev) OVER () AS mrev, avg(tt) OVER () AS mtt
  FROM idx
)
SELECT month(month) AS cal_month, count(*) AS n_months,
       round(avg(rev / (mrev + slope * (tt - mtt))), 6) AS seasonal_index
FROM fitted
GROUP BY month(month)
""",
)
def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative seasonal decomposition of monthly revenue: OLS
    trend fit over the month index, then the mean actual/trend ratio per
    calendar month — the '12-number seasonality profile' of the order
    book. Everything past the first groupBy runs on the months-sized
    relation (windows over ~80 rows); the OLS uses raw power sums so
    both engines fit the identical line."""
    t = Tables(spark, sf_dir)
    monthly = t.orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.partitionBy()
    idx = monthly.select(
        "month",
        "rev",
        F.months_between(
            F.col("month"), F.min("month").over(w)
        ).cast("double").alias("tt"),
    )
    tt, rev = F.col("tt"), F.col("rev")
    fitted = idx.select(
        "month",
        "rev",
        "tt",
        (
            (F.avg(tt * rev).over(w) - F.avg(tt).over(w) * F.avg(rev).over(w))
            / (F.avg(tt * tt).over(w) - F.avg(tt).over(w) * F.avg(tt).over(w))
        ).alias("slope"),
        F.avg(rev).over(w).alias("mrev"),
        F.avg(tt).over(w).alias("mtt"),
    )
    trend = F.col("mrev") + F.col("slope") * (tt - F.col("mtt"))
    return fitted.groupBy(F.month("month").alias("cal_month")).agg(
        F.count(F.lit(1)).alias("n_months"),
        F.round(F.avg(rev / trend), 6).alias("seasonal_index"),
    )
