"""Round-5 thirty-fifth wave (SURVEY.md §2.Q, continued): skyline
(Pareto-optimal set) via sort + running max, Theil inequality-index
decomposition, and rolling bivariate correlation.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables


@register(
    "part_skyline_price_size",
    oracle="""
WITH pts AS (
  SELECT p_retailprice AS price, p_size AS sz, count(*) AS n_parts
  FROM part GROUP BY 1, 2
)
SELECT price AS p_retailprice, sz AS p_size,
       CAST(n_parts AS BIGINT) AS n_parts
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price <= p.price AND q.sz >= p.sz
    AND (q.price < p.price OR q.sz > p.sz)
)
""",
)
def part_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE / Pareto-optimal set over (minimize retailprice, maximize
    size): the parts no other part beats on both axes — the classic
    multi-objective shortlist operator. The oracle states the O(n²)
    NOT-EXISTS dominance DEFINITION; the engine computes it as
    sort + running max: keep only the max size at each price (window
    over price), then a point survives iff its size strictly exceeds
    the running max over all strictly-cheaper prices. One shuffle on
    price (the partition window and the per-price groupBy reuse the
    same exchange) + one window over the distinct-price relation —
    O(n log n), no self-join, no candidate blow-up at any corpus size.
    Equal-price ties keep only the largest size; duplicate (price,
    size) points collapse to one row with their part count."""
    t = Tables(spark, sf_dir)
    wp = Window.partitionBy("p_retailprice")
    p2 = t.part.select(
        "p_retailprice",
        "p_size",
        F.max("p_size").over(wp).alias("pmax"),
    )
    per_price = (
        p2.where(F.col("p_size") == F.col("pmax"))
        .groupBy("p_retailprice", "p_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    )
    w_prev = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = per_price.select(
        "p_retailprice",
        "p_size",
        "n_parts",
        F.max("p_size").over(w_prev).alias("s1"),
    )
    return sky.where(
        F.col("s1").isNull() | (F.col("p_size") > F.col("s1"))
    ).select("p_retailprice", "p_size", "n_parts")


@register(
    "agg_theil_decomposition",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS sk,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2))) AS DOUBLE) AS x
  FROM lineitem GROUP BY l_suppkey
),
sup AS (
  SELECT n_name, x FROM rev
  JOIN supplier ON sk = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
),
grp AS (
  SELECT n_name, sum(x) AS gx, count(*) AS gn FROM sup GROUP BY n_name
),
tot AS (
  SELECT n_name, gx, gn,
         sum(gx) OVER () AS tx, sum(gn) OVER () AS tn
  FROM grp
),
terms AS (
  SELECT s.n_name,
         sum((s.x / (t.gx / t.gn)) * ln(s.x / (t.gx / t.gn))) / t.gn
           AS t_within,
         max(t.gx / t.tx) AS share,
         max((t.gx / t.tx) * ln((t.gx / t.gn) / (t.tx / t.tn)))
           AS between_term
  FROM sup s JOIN tot t ON s.n_name = t.n_name
  GROUP BY s.n_name, t.gn
)
SELECT n_name AS nation,
       round(share, 6) AS revenue_share,
       round(t_within, 6) AS t_within,
       round(share * t_within, 6) AS contrib_within,
       round(between_term, 6) AS between_term
FROM terms
""",
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality decomposition of supplier revenue by nation:
    T_total = Σ_g s_g·T_g (within) + Σ_g s_g·ln(μ_g/μ) (between) — the
    additive inequality index Gini lacks (supplier_revenue_gini is the
    non-decomposable sibling). Per-supplier revenue accumulates in
    DECIMAL so the x_i doubles are bit-identical across engines before
    any ln touches them; nation-level means/shares derive from the
    nations-sized aggregate (window sums over 25 rows), broadcast back
    for the per-supplier entropy terms, and the only corpus-sized
    shuffle is the l_suppkey revenue groupBy."""
    t = Tables(spark, sf_dir)
    rev = t.lineitem.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(19,2)"))
        .cast("double")
        .alias("x")
    )
    sup = (
        rev.join(
            broadcast_if_small(
                t.supplier.select("s_suppkey", "s_nationkey"), sf_dir, "supplier"
            ),
            F.col("sk") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "x")
    )
    grp = sup.groupBy("n_name").agg(
        F.sum("x").alias("gx"), F.count(F.lit(1)).alias("gn")
    )
    w_all = Window.partitionBy()
    tot = grp.select(
        F.col("n_name").alias("tn_name"),
        "gx",
        "gn",
        F.sum("gx").over(w_all).alias("tx"),
        F.sum("gn").over(w_all).alias("tn"),
    )
    mu_g = F.col("gx") / F.col("gn")
    joined = sup.join(
        F.broadcast(tot), F.col("n_name") == F.col("tn_name")
    )
    terms = joined.groupBy("n_name", "gn").agg(
        (
            F.sum((F.col("x") / mu_g) * F.log(F.col("x") / mu_g))
            / F.first("gn")
        ).alias("t_within"),
        F.max(F.col("gx") / F.col("tx")).alias("share"),
        F.max(
            (F.col("gx") / F.col("tx"))
            * F.log(mu_g / (F.col("tx") / F.col("tn")))
        ).alias("between_term"),
    )
    return terms.select(
        F.col("n_name").alias("nation"),
        F.round("share", 6).alias("revenue_share"),
        F.round("t_within", 6).alias("t_within"),
        F.round(F.col("share") * F.col("t_within"), 6).alias(
            "contrib_within"
        ),
        F.round("between_term", 6).alias("between_term"),
    )


@register(
    "events_rolling_corr_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS x,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS y
  FROM events GROUP BY 1
),
mom AS (
  SELECT day,
         count(*) OVER w AS n,
         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         sum(x * y) OVER w AS sxy,
         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
         row_number() OVER (ORDER BY day) AS rn
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT CAST(day AS VARCHAR) AS day,
       CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
            ELSE round(
              CAST(n * sxy - sx * sy AS DOUBLE)
              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)), 6)
       END AS corr_7d
FROM mom WHERE rn >= 7
""",
)
def events_rolling_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between daily click and
    purchase volumes — the co-movement monitor behind 'did engagement
    decouple from conversion this week'. Correlation over a sliding
    frame isn't a built-in window aggregate in either engine, so it is
    assembled from the five moment sums (Σx, Σy, Σxy, Σx², Σy²), each
    an INTEGER window sum over the days-sized daily relation — exact in
    any accumulation order, so the only float op is the final fraction.
    Days with a degenerate window (zero variance) yield NULL on both
    sides; the first six ramp-up days are excluded by row_number."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    mom = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return mom.where(F.col("rn") >= 7).select(
        F.col("day").cast("string").alias("day"),
        F.when(vx * vy == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                cov.cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double")),
                6,
            )
        )
        .alias("corr_7d"),
    )
