"""Round-5 forty-fourth wave (SURVEY.md §2.Q, continued): cohort
fulfillment vintage curves, higher-order array reduction (Horner), and
circular (directional) time-of-day statistics.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "orders_fulfillment_vintage_curves",
    oracle="""
WITH li AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS cohort_year,
         least(greatest(CAST(floor(datediff('day', o_orderdate, l_shipdate)
                                   / 30.0) AS INTEGER), 0), 5) AS mbucket
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
cells AS (
  SELECT cohort_year, mbucket, count(*) AS c
  FROM li GROUP BY cohort_year, mbucket
)
SELECT cohort_year, mbucket AS months_since_order,
       CAST(c AS BIGINT) AS n_lines,
       round(CAST(sum(c) OVER (PARTITION BY cohort_year ORDER BY mbucket
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / sum(c) OVER (PARTITION BY cohort_year), 6)
         AS cum_fulfilled_share
FROM cells
""",
)
def orders_fulfillment_vintage_curves(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vintage (cohort-maturity) fulfillment curves: for each order-year
    cohort, the cumulative share of lineitems shipped within 0,1,…,5+
    months of ordering — the credit-risk 'vintage triangle' shape
    applied to operations, which answers 'is this year's backlog
    clearing slower than last year's at the same age' (a question the
    global delay histogram can't see because it mixes cohort ages).
    Day deltas are exact integers clamped to [0, 5+] — the lower clamp
    absorbs this synthetic corpus's order-independent ship dates AND
    sidesteps the §5.4 negative-division trap — and both windows run
    over the ≤ years×6 cell aggregate; one corpus-sized join+groupBy,
    everything after is bounded."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.year("o_orderdate").cast("int").alias("cohort_year"),
        F.least(
            F.greatest(
                F.floor(
                    F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                    / 30.0
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(5),
        ).alias("mbucket"),
    )
    cells = li.groupBy("cohort_year", "mbucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = Window.partitionBy("cohort_year").orderBy("mbucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_coh = Window.partitionBy("cohort_year")
    return cells.select(
        "cohort_year",
        F.col("mbucket").alias("months_since_order"),
        F.col("c").cast("bigint").alias("n_lines"),
        F.round(
            F.sum("c").over(w_cum).cast("double") / F.sum("c").over(w_coh),
            6,
        ).alias("cum_fulfilled_share"),
    )


@register(
    "fn_array_reduce_horner",
    oracle="""
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS c,
         generate_subscripts(embedding, 1) - 1 AS i
  FROM embeddings
),
vals AS (
  SELECT vec_id, sum(c * power(0.5, i)) AS h FROM ex GROUP BY vec_id
)
SELECT count(*) AS n_vectors,
       round(avg(h), 6) AS mean_value,
       round(min(h), 6) AS min_value,
       round(max(h), 6) AS max_value
FROM vals
""",
)
def fn_array_reduce_horner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order ARRAY REDUCTION with a non-commutative fold:
    each embedding, read as polynomial coefficients, is evaluated at
    x = 0.5 by Horner's rule — F.aggregate over the reversed array
    with acc ← acc·x + cᵢ, the fold shape fn_array_hof's map/filter
    lambdas don't exercise (order matters; the lambda carries state).
    The whole evaluation happens INSIDE codegen per row — no explode,
    no shuffle until the 1-row corpus summary. The oracle evaluates
    the mathematically identical power sum Σ cᵢ·0.5^i; with |x| < 1
    the two orderings agree far beyond the 6-dp comparison."""
    e = Tables(spark, sf_dir).embeddings
    vals = e.select(
        F.aggregate(
            F.reverse(F.col("embedding")),
            F.lit(0.0),
            lambda acc, c: acc * 0.5 + c.cast("double"),
        ).alias("h")
    )
    return vals.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("h"), 6).alias("mean_value"),
        F.round(F.min("h"), 6).alias("min_value"),
        F.round(F.max("h"), 6).alias("max_value"),
    )


_TWO_PI = 2 * math.pi


@register(
    "events_circular_time_stats",
    oracle=f"""
WITH ang AS (
  SELECT event_type,
         {_TWO_PI} * (CAST(floor(epoch(ts)) AS BIGINT) % 86400) / 86400.0
           AS theta
  FROM events
),
mom AS (
  SELECT event_type, count(*) AS n,
         round(sum(cos(theta)), 6) AS sc,
         round(sum(sin(theta)), 6) AS ss
  FROM ang GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       round(sqrt(sc * sc + ss * ss) / n, 6) AS resultant_length,
       round(
         (CASE WHEN atan2(ss, sc) < 0
               THEN atan2(ss, sc) + {_TWO_PI}
               ELSE atan2(ss, sc) END) * 24.0 / {_TWO_PI}, 4)
         AS mean_hour
FROM mom
""",
)
def events_circular_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular (directional) statistics of event time-of-day per type:
    hours live on a circle, so the arithmetic mean of 23:00 and 01:00
    is the nonsense 12:00 — the right estimator maps each time to an
    angle and averages the unit vectors: mean hour from atan2(Σsin,
    Σcos) and concentration R = |Σe^iθ|/n (R→0: uniform around the
    clock, R→1: sharply peaked). The stability rule: on near-uniform
    data Σcos/Σsin are small differences of large sums, and atan2
    AMPLIFIES accumulation-order noise — so both vector sums are
    rounded to 6 dp BEFORE atan2 on both engines, making the angle
    bit-identical. One shuffle to the 5-type rollup."""
    e = Tables(spark, sf_dir).events
    theta = (
        F.lit(_TWO_PI)
        * (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
            )
            % 86400
        )
        / 86400.0
    )
    mom = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.cos(theta)), 6).alias("sc"),
        F.round(F.sum(F.sin(theta)), 6).alias("ss"),
    )
    ang = F.atan2(F.col("ss"), F.col("sc"))
    wrapped = F.when(ang < 0, ang + _TWO_PI).otherwise(ang)
    return mom.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(
            F.sqrt(F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"))
            / F.col("n"),
            6,
        ).alias("resultant_length"),
        F.round(wrapped * 24.0 / _TWO_PI, 4).alias("mean_hour"),
    )
