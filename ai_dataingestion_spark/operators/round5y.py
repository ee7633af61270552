"""Round-5 twenty-fifth wave (SURVEY.md §2.Q, continued): business-day
latency arithmetic, min-max feature scaling with invariant checks,
readability scoring, and YTD-vs-prior-year alignment.

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


@register(
    "fn_business_days_diff",
    oracle="""
WITH lat AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS cal_days,
         -- business days between d1 (excl) and d2 (incl), Mon=1..Sun=7:
         -- full weeks x5 + weekday-remainder correction via a
         -- cumulative-business-day index bd(d) = 5*(d//7) + min(d%7, 5)
         -- anchored on a known Monday epoch
         (5 * ((date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)))
               // 7)
          + least((date_diff('day', DATE '1990-01-01',
                             CAST(l_shipdate AS DATE))) % 7, 5))
         - (5 * ((date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)))
                 // 7)
            + least((date_diff('day', DATE '1990-01-01',
                               CAST(o_orderdate AS DATE))) % 7, 5))
           AS bus_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
       count(*) AS n,
       floor(CAST(sum(cal_days) AS DOUBLE) / count(*) * 1000000 + 0.5)
         / 1000000 AS mean_cal_days,
       floor(CAST(sum(bus_days) AS DOUBLE) / count(*) * 1000000 + 0.5)
         / 1000000 AS mean_bus_days,
       CAST(sum(CASE WHEN bus_days > 65 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sla_breach
FROM lat GROUP BY o_orderpriority
""",
)
def fn_business_days_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day latency arithmetic: order→ship deltas counted in
    WEEKDAYS via the cumulative-business-day index bd(d) = 5·⌊d/7⌋ +
    min(d mod 7, 5) anchored on a known Monday — bus_days = bd(ship) −
    bd(order), the closed form that replaces a calendar explode (and
    the correction every "datediff/7·5" approximation gets wrong at
    week boundaries). Calendar vs business means side by side per
    priority, plus a 65-business-day SLA breach count. Exact integer
    arithmetic throughout; one orderkey join, fixed literals shared
    with the oracle."""
    t = Tables(spark, sf_dir)
    anchor = F.lit("1990-01-01")  # a Monday BEFORE every corpus date: keeps
    # every offset d non-negative — Spark floor-division and
    # DuckDB // DIVERGE on negative operands (floor vs trunc)

    def bd(col):
        d = F.datediff(F.to_date(col), F.to_date(anchor))
        return 5 * F.floor(d / 7) + F.least(d % 7, F.lit(5))

    lat = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .select(
            "o_orderpriority",
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("cal_days"),
            (bd(F.col("l_shipdate")) - bd(F.col("o_orderdate"))).alias(
                "bus_days"
            ),
        )
    )
    n = F.count(F.lit(1))
    return lat.groupBy("o_orderpriority").agg(
        n.alias("n"),
        _pround(F.sum("cal_days").cast("double") / n).alias("mean_cal_days"),
        _pround(F.sum("bus_days").cast("double") / n).alias("mean_bus_days"),
        F.sum(F.when(F.col("bus_days") > 65, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sla_breach"),
    )


@register(
    "fn_minmax_scale_check",
    oracle="""
WITH cuts AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type
),
scaled AS (
  SELECT e.event_type,
         (e.value - c.lo) / nullif(c.hi - c.lo, 0) AS s
  FROM events e JOIN cuts c ON e.event_type = c.event_type
)
SELECT event_type,
       count(*) AS n,
       floor(min(s) * 1000000 + 0.5) / 1000000 AS scaled_min,
       floor(max(s) * 1000000 + 0.5) / 1000000 AS scaled_max,
       floor(CAST(sum(CAST(floor(s * 1000000000 + 0.5) / 1000000000
                           AS DECIMAL(28, 9))) AS DOUBLE) / count(*)
             * 1000000 + 0.5) / 1000000 AS scaled_mean
FROM scaled GROUP BY event_type
""",
)
def fn_minmax_scale_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max feature scaling with its invariants emitted as output:
    per type, scaled min must be 0 and max must be 1 (nullif guards
    the degenerate constant column), and the scaled mean summarizes
    the distribution's position in-range — the feature-engineering
    normalization step with its unit test built into the result. The
    mean uses the 9dp-round-then-DECIMAL-sum idiom
    (events_attribution_linear) so the Σ of scaled doubles is
    order-independent; min/max are order-free already. Cuts are
    types-sized and broadcast."""
    e = Tables(spark, sf_dir).events
    cuts = e.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    s = (F.col("value") - F.col("lo")) / F.nullif(
        F.col("hi") - F.col("lo"), F.lit(0.0)
    )
    scaled = e.join(F.broadcast(cuts), "event_type").select(
        "event_type", s.alias("s")
    )
    n = F.count(F.lit(1))
    return scaled.groupBy("event_type").agg(
        n.alias("n"),
        _pround(F.min("s")).alias("scaled_min"),
        _pround(F.max("s")).alias("scaled_max"),
        _pround(
            F.sum(_pround(F.col("s"), 9).cast("decimal(28,9)")).cast("double")
            / n
        ).alias("scaled_mean"),
    )


@register(
    "text_readability_score",
    oracle="""
WITH scored AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_words,
         greatest(len(regexp_split_to_array(text, '[.!?]+')) - 1, 1)
           AS n_sentences,
         len(regexp_extract_all(text, '[aeiouy]+')) AS n_syllables
  FROM documents
),
fk AS (
  SELECT source,
         floor((0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59)
               * 1000000 + 0.5) / 1000000 AS grade
  FROM scored
)
SELECT source,
       count(*) AS n_docs,
       CAST(quantile_cont(grade, 0.5) AS DOUBLE) AS p50_grade,
       floor(CAST(sum(CAST(grade AS DECIMAL(28, 6))) AS DOUBLE) / count(*)
             * 1000000 + 0.5) / 1000000 AS mean_grade
FROM fk GROUP BY source
""",
)
def text_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade-level readability per source, with the
    standard syllable proxy (vowel-run count — the deterministic
    heuristic used when no pronunciation dictionary ships): grade =
    0.39·(words/sentences) + 11.8·(syllables/words) − 15.59. The
    text-difficulty signal that routes corpora toward child-safe,
    simplified, or technical training mixes. Per-doc grades are
    portable-rounded once, then the per-source mean accumulates the
    ROUNDED values in DECIMAL (order-independent) and the median
    interpolates on them. Expression-only until the sources-sized
    rollup."""
    d = Tables(spark, sf_dir).documents
    n_words = F.size(F.split("text", " "))
    n_sentences = F.greatest(
        F.size(F.split("text", r"[.!?]+")) - 1, F.lit(1)
    )
    n_syll = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[aeiouy]+"), F.lit(0))
    )
    grade = _pround(
        0.39 * (n_words.cast("double") / n_sentences)
        + 11.8 * (n_syll.cast("double") / n_words)
        - 15.59
    )
    fk = d.select("source", grade.alias("grade"))
    n = F.count(F.lit(1))
    return fk.groupBy("source").agg(
        n.alias("n_docs"),
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY grade)").alias(
            "p50_grade"
        ),
        _pround(
            F.sum(F.col("grade").cast("decimal(28,6)")).cast("double") / n
        ).alias("mean_grade"),
    )


@register(
    "orders_ytd_vs_prior_year",
    oracle="""
WITH daily AS (
  SELECT year(o_orderdate) AS y, dayofyear(o_orderdate) AS doy,
         sum(CAST(o_totalprice AS DECIMAL(19, 2))) AS rev
  FROM orders GROUP BY 1, 2
),
ytd AS (
  SELECT y, doy,
         sum(rev) OVER (PARTITION BY y ORDER BY doy
                        ROWS UNBOUNDED PRECEDING) AS ytd_rev
  FROM daily
),
paired AS (
  SELECT c.y, c.doy,
         CAST(round(c.ytd_rev, 2) AS DOUBLE) AS ytd_rev,
         CAST(round(p.ytd_rev, 2) AS DOUBLE) AS prior_ytd_rev
  FROM ytd c LEFT JOIN ytd p ON p.y = c.y - 1 AND p.doy = c.doy
)
SELECT y, doy, ytd_rev, prior_ytd_rev,
       CASE WHEN prior_ytd_rev IS NOT NULL THEN
         floor((ytd_rev - prior_ytd_rev) / prior_ytd_rev * 1000000 + 0.5)
           / 1000000
       END AS yoy_ytd_growth
FROM paired
WHERE doy <= 28 AND y >= 1996
""",
)
def orders_ytd_vs_prior_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-to-date revenue aligned against the SAME day-of-year of the
    prior year — the finance dashboard's "are we ahead of last year"
    curve, which a plain cumulative sum can't answer without the
    day-of-year self-join alignment. Cumulative windows run over the
    years×days aggregate (broadcast-sized); the prior-year pairing is
    a keyed self-join on (y−1, doy); DECIMAL accumulations, one
    rounded growth division. Clamped to the first 28 days × full
    prior years so leap-day and partial-first-year artifacts stay out
    of the comparison."""
    o = Tables(spark, sf_dir).orders
    daily = o.groupBy(
        F.year("o_orderdate").alias("y"),
        F.dayofyear("o_orderdate").alias("doy"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(19,2)")).alias("rev"))
    w = Window.partitionBy("y").orderBy("doy").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ytd = daily.select(
        "y", "doy", F.sum("rev").over(w).alias("ytd_rev_d")
    )
    cur = ytd.select(
        "y", "doy", F.round("ytd_rev_d", 2).cast("double").alias("ytd_rev")
    )
    prior = ytd.select(
        (F.col("y") + 1).alias("y"),
        "doy",
        F.round("ytd_rev_d", 2).cast("double").alias("prior_ytd_rev"),
    )
    growth = _pround(
        (F.col("ytd_rev") - F.col("prior_ytd_rev")) / F.col("prior_ytd_rev")
    )
    return (
        cur.join(prior, ["y", "doy"], "left")
        .filter((F.col("doy") <= 28) & (F.col("y") >= 1996))
        .select(
            "y",
            "doy",
            "ytd_rev",
            "prior_ytd_rev",
            F.when(F.col("prior_ytd_rev").isNotNull(), growth).alias(
                "yoy_ytd_growth"
            ),
        )
    )
