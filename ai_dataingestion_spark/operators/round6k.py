"""Round-5 thirty-seventh wave (SURVEY.md §2.Q, continued): customer
segment migration, Kaplan–Meier survival with censoring, and a
deterministic Poisson-bootstrap confidence interval.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.ai.dedup import _duck_h, _spark_h

_SPLIT_DATE = "1998-01-01"


@register(
    "customer_segment_migration",
    oracle=f"""
WITH rev AS (
  SELECT o_custkey AS ck,
         CASE WHEN o_orderdate < DATE '{_SPLIT_DATE}' THEN 'A' ELSE 'B' END
           AS period,
         sum(CAST(o_totalprice AS DECIMAL(19,2))) AS r
  FROM orders GROUP BY 1, 2
),
seg AS (
  SELECT ck, period,
         ntile(3) OVER (PARTITION BY period ORDER BY r DESC, ck) AS tercile
  FROM rev
),
a AS (SELECT ck, tercile FROM seg WHERE period = 'A'),
b AS (SELECT ck, tercile FROM seg WHERE period = 'B')
SELECT coalesce(CAST(a.tercile AS VARCHAR), 'absent') AS seg_early,
       coalesce(CAST(b.tercile AS VARCHAR), 'absent') AS seg_late,
       count(*) AS n_customers
FROM a FULL OUTER JOIN b ON a.ck = b.ck
GROUP BY 1, 2
""",
)
def customer_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue-tercile migration matrix between the early
    (pre-1998) and late order eras: who moved up, who churned out
    ('absent'), who appeared — the segment-churn view behind retention
    planning, generalizing customer_rfm_segments to a transition
    matrix. Terciles come from ntile(3) over each period's
    customer-revenue aggregate with (revenue DESC, custkey) ordering —
    the unique tie-break key that makes rank assignment deterministic
    across engines — and revenues accumulate in DECIMAL before any
    ordering. Two customer-sized windows + one full-outer join on
    custkey; output ≤ 4×4 rows at any scale."""
    o = Tables(spark, sf_dir).orders
    rev = o.groupBy(
        F.col("o_custkey").alias("ck"),
        F.when(
            F.col("o_orderdate") < F.lit(_SPLIT_DATE).cast("timestamp_ntz"),
            "A",
        )
        .otherwise("B")
        .alias("period"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(19,2)")).alias("r"))
    seg = rev.select(
        "ck",
        "period",
        F.ntile(3)
        .over(
            Window.partitionBy("period").orderBy(F.desc("r"), F.asc("ck"))
        )
        .alias("tercile"),
    )
    a = seg.where(F.col("period") == "A").select(
        F.col("ck").alias("ck_a"), F.col("tercile").alias("t_a")
    )
    b = seg.where(F.col("period") == "B").select(
        F.col("ck").alias("ck_b"), F.col("tercile").alias("t_b")
    )
    return (
        a.join(b, F.col("ck_a") == F.col("ck_b"), "full_outer")
        .groupBy(
            F.coalesce(F.col("t_a").cast("string"), F.lit("absent")).alias(
                "seg_early"
            ),
            F.coalesce(F.col("t_b").cast("string"), F.lit("absent")).alias(
                "seg_late"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "events_kaplan_meier_daily",
    oracle="""
WITH uw AS (
  SELECT user_id,
         max(CAST(datediff('day', DATE '2024-01-01',
                          CAST(ts AS DATE)) + 1 AS INTEGER)) AS last_day
  FROM events GROUP BY user_id
),
mx AS (SELECT max(last_day) AS mw FROM uw),
cnt AS (
  SELECT last_day, count(*) AS ended FROM uw GROUP BY last_day
),
days AS (
  SELECT last_day AS day, ended,
         sum(ended) OVER (ORDER BY last_day DESC
                          ROWS UNBOUNDED PRECEDING) AS n_at_risk,
         CASE WHEN last_day < (SELECT mw FROM mx) THEN ended ELSE 0 END
           AS churned
  FROM cnt
)
SELECT day,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(churned AS BIGINT) AS n_churned,
       round(exp(sum(ln(1.0 - CAST(churned AS DOUBLE) / n_at_risk))
                 OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)), 6)
         AS survival
FROM days
""",
)
def events_kaplan_meier_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier product-limit survival curve over user activity
    days WITH censoring — the estimator events_survival_weeks's naive
    share-active curve is not: users whose last activity falls on the
    final observed day are censored (still alive at cutoff), not
    churned, so they contribute to the risk set but not to any failure
    count. S(t) = Π_{i≤t}(1 − d_i/n_i) computed as exp∘cumsum∘ln over
    the days-sized relation; the risk set n_i is a DESCENDING
    cumulative sum (everyone whose last day is ≥ i), so the whole
    estimator runs in two windows over ≤ n_days rows after one
    per-user max aggregate — the only corpus-sized shuffle."""
    e = Tables(spark, sf_dir).events
    day = (
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        + 1
    ).cast("int")
    uw = e.groupBy("user_id").agg(F.max(day).alias("last_day"))
    cnt = uw.groupBy("last_day").agg(F.count(F.lit(1)).alias("ended"))
    w_all = Window.partitionBy()
    w_desc = Window.orderBy(F.desc("last_day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    days = cnt.select(
        F.col("last_day").alias("day"),
        "ended",
        F.sum("ended").over(w_desc).alias("n_at_risk"),
        F.when(
            F.col("last_day") < F.max("last_day").over(w_all),
            F.col("ended"),
        )
        .otherwise(F.lit(0))
        .alias("churned"),
    )
    w_asc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return days.select(
        "day",
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("churned").cast("bigint").alias("n_churned"),
        F.round(
            F.exp(
                F.sum(
                    F.log(
                        1.0
                        - F.col("churned").cast("double")
                        / F.col("n_at_risk")
                    )
                ).over(w_asc)
            ),
            6,
        ).alias("survival"),
    )


# Truncated-Poisson(1) weight thresholds: P(0)=e⁻¹, P(1)=e⁻¹, P(2)=e⁻¹/2,
# remaining mass (~0.019) lumped into w=3. Written as literals so both
# engines compare the SAME doubles against the SAME portable-hash uniform.
_P0 = "0.36787944117144233"
_P1 = "0.7357588823428847"
_P2 = "0.9196986029286058"
_B_REPS = 32
_HASH_SCALE = float(1 << 60)


@register(
    "agg_bootstrap_mean_ci",
    oracle=f"""
WITH reps AS (SELECT unnest(range(0, {_B_REPS})) AS b),
wts AS (
  SELECT b,
         CAST(o_totalprice AS DECIMAL(19,2)) AS x,
         CASE
           WHEN u < {_P0} THEN 0
           WHEN u < {_P1} THEN 1
           WHEN u < {_P2} THEN 2
           ELSE 3
         END AS w
  FROM (
    SELECT b, o_totalprice,
           CAST({_duck_h("CAST(o_orderkey AS VARCHAR) || '-' || CAST(b AS VARCHAR)")}
                AS DOUBLE) / {_HASH_SCALE} AS u
    FROM orders CROSS JOIN reps
  )
),
means AS (
  SELECT b, CAST(sum(w * x) AS DOUBLE) / sum(w) AS m
  FROM wts GROUP BY b HAVING sum(w) > 0
),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m) AS rn,
         count(*) OVER () AS nb
  FROM means
)
SELECT CAST(max(nb) AS BIGINT) AS n_replicas,
       round(max(CASE WHEN rn = 2 THEN m END), 6) AS ci_lo,
       round(max(CASE WHEN rn = nb - 1 THEN m END), 6) AS ci_hi,
       (SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(19,2)))
                          AS DOUBLE) / count(*), 6)
        FROM orders) AS grand_mean
FROM ranked
""",
)
def agg_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value,
    fully deterministic and shuffle-light: each of 32 replicas
    reweights every order by a truncated-Poisson(1) draw derived from
    the portable md5 hash of (orderkey, replica) — the classic
    single-pass bootstrap for distributed data (Chamandy 2012, no
    resampling shuffle, no driver collect). The explode is a map-side
    ×32 flatMap; the only shuffle carries 32 partially-aggregated
    (Σwx DECIMAL, Σw) pairs per task, so cost is linear in B and the
    CI never sees a skewed key. The interval is the 2nd/31st order
    statistics of the replica means (≈90% percentile CI); weights w>3
    are truncated identically on both sides."""
    o = Tables(spark, sf_dir).orders
    b = F.explode(
        F.sequence(F.lit(0), F.lit(_B_REPS - 1))
    ).alias("b")
    ex = o.select(
        F.col("o_orderkey"),
        F.col("o_totalprice").cast("decimal(19,2)").alias("x"),
        b,
    )
    u = (
        F.expr(
            _spark_h(
                "concat(CAST(o_orderkey AS STRING), '-', CAST(b AS STRING))"
            )
        ).cast("double")
        / F.lit(_HASH_SCALE)
    )
    wts = ex.select(
        "b",
        "x",
        F.when(u < float(_P0), 0)
        .when(u < float(_P1), 1)
        .when(u < float(_P2), 2)
        .otherwise(3)
        .alias("w"),
    )
    means = (
        wts.groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("x")).alias("swx"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select((F.col("swx").cast("double") / F.col("sw")).alias("m"))
    )
    ranked = means.select(
        "m",
        F.row_number().over(Window.orderBy("m")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"),
    )
    grand = o.agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(19,2)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("grand_mean")
    )
    ci = ranked.agg(
        F.max("nb").cast("bigint").alias("n_replicas"),
        F.round(
            F.max(F.when(F.col("rn") == 2, F.col("m"))), 6
        ).alias("ci_lo"),
        F.round(
            F.max(F.when(F.col("rn") == F.col("nb") - 1, F.col("m"))), 6
        ).alias("ci_hi"),
    )
    return ci.crossJoin(F.broadcast(grand)).select(
        "n_replicas", "ci_lo", "ci_hi", "grand_mean"
    )
