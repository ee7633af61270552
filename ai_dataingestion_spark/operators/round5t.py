"""Round-5 twentieth wave (SURVEY.md §2.Q, continued): a declarative
alert-rules engine, empty-relation aggregate semantics, the default-
window-frame ties pin, and pairwise Jensen-Shannon source drift.

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
    "events_alert_rules",
    oracle="""
WITH totals AS (
  SELECT count(*) AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
  FROM events
),
daily AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n FROM events GROUP BY 1
),
daily_stats AS (
  SELECT min(CAST(n AS DOUBLE)) AS min_daily,
         CAST(sum(n) AS DOUBLE) / count(*) AS mean_daily
  FROM daily
),
p95v AS (
  SELECT CAST(quantile_cont(value, 0.95) AS DOUBLE) AS p95 FROM events
)
SELECT 'error_rate_gt_19pct' AS rule,
       floor(CAST(n_err AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS metric,
       0.19 AS threshold,
       CAST(CASE WHEN CAST(n_err AS DOUBLE) / n > 0.19
                 THEN 1 ELSE 0 END AS INT) AS fired
FROM totals
UNION ALL
SELECT 'daily_volume_drop_gt_50pct',
       floor(min_daily / mean_daily * 1000000 + 0.5) / 1000000,
       0.5,
       CAST(CASE WHEN min_daily / mean_daily < 0.5 THEN 1 ELSE 0 END AS INT)
FROM daily_stats
UNION ALL
SELECT 'value_p95_gt_100',
       floor(p95 * 1000000 + 0.5) / 1000000,
       100.0,
       CAST(CASE WHEN p95 > 100 THEN 1 ELSE 0 END AS INT)
FROM p95v
""",
)
def events_alert_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative monitoring rules engine: three alert rules (error
    share, worst-day volume drop vs mean, value p95 ceiling) evaluated
    over the corpus into one (rule, metric, threshold, fired) report —
    the operator a scheduler runs after every ingest, and the shape
    (metric expression + threshold + comparator per row) that makes
    alert definitions DATA instead of code. Each rule is an
    aggregate-first scalar; thresholds are literals shared verbatim
    with the oracle; metrics are portable-rounded, firing decisions
    computed on the UNROUNDED metric in both engines."""
    e = Tables(spark, sf_dir).events
    totals = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_err"
        ),
    )
    err_rate = F.col("n_err").cast("double") / F.col("n")
    r1 = totals.select(
        F.lit("error_rate_gt_19pct").alias("rule"),
        _pround(err_rate).alias("metric"),
        F.lit(0.19).alias("threshold"),
        F.when(err_rate > 0.19, 1).otherwise(0).cast("int").alias("fired"),
    )
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    ds = daily.agg(
        F.min(F.col("n").cast("double")).alias("min_daily"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_daily"),
    )
    drop = F.col("min_daily") / F.col("mean_daily")
    r2 = ds.select(
        F.lit("daily_volume_drop_gt_50pct").alias("rule"),
        _pround(drop).alias("metric"),
        F.lit(0.5).alias("threshold"),
        F.when(drop < 0.5, 1).otherwise(0).cast("int").alias("fired"),
    )
    p95 = e.agg(
        F.expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY value)").alias(
            "p95"
        )
    )
    r3 = p95.select(
        F.lit("value_p95_gt_100").alias("rule"),
        _pround(F.col("p95")).alias("metric"),
        F.lit(100.0).alias("threshold"),
        F.when(F.col("p95") > 100, 1).otherwise(0).cast("int").alias("fired"),
    )
    return r1.unionByName(r2).unionByName(r3)


@register(
    "agg_empty_relation_semantics",
    oracle="""
WITH empty AS (SELECT * FROM orders WHERE o_orderkey < 0)
SELECT
  (SELECT count(*) FROM empty) AS count_star,
  (SELECT count(o_totalprice) FROM empty) AS count_col,
  CAST((SELECT sum(o_totalprice) FROM empty) IS NULL AS INT) AS sum_is_null,
  CAST((SELECT min(o_orderdate) FROM empty) IS NULL AS INT) AS min_is_null,
  CAST((SELECT avg(o_totalprice) FROM empty) IS NULL AS INT) AS avg_is_null,
  (SELECT count(*) FROM (SELECT o_orderstatus, count(*) AS c
                         FROM empty GROUP BY o_orderstatus))
    AS grouped_rows
""",
)
def agg_empty_relation_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Aggregate semantics over the EMPTY relation, pinned: global
    count(*) returns 0 (a row, not nothing), sum/min/avg return NULL
    (not 0 — the bug every naive "default 0" rewrite introduces), and
    a GROUP BY over empty input yields ZERO rows (no null-group row) —
    the asymmetry between global and grouped aggregation that ANSI
    mandates and downstream coalesce logic must respect. One
    impossible-predicate scan (pruned to nothing at planning time);
    every check lands in a single comparison row."""
    o = Tables(spark, sf_dir).orders
    empty = o.filter(F.col("o_orderkey") < 0)
    glob = empty.agg(
        F.count(F.lit(1)).alias("count_star"),
        F.count("o_totalprice").alias("count_col"),
        F.sum("o_totalprice").isNull().cast("int").alias("sum_is_null"),
        F.min("o_orderdate").isNull().cast("int").alias("min_is_null"),
        F.avg("o_totalprice").isNull().cast("int").alias("avg_is_null"),
    )
    grouped = (
        empty.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.count(F.lit(1)).alias("grouped_rows"))
    )
    return glob.crossJoin(F.broadcast(grouped))


@register(
    "win_default_frame_ties",
    oracle="""
SELECT c_mktsegment, c_custkey,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(19, 2))) OVER (
              PARTITION BY c_mktsegment
              ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT)), 2)
            AS DOUBLE) AS running_default_frame,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(19, 2))) OVER (
              PARTITION BY c_mktsegment
              ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT), c_custkey
              ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE)
         AS running_rows_tiebroken,
       CAST(count(*) OVER (
              PARTITION BY c_mktsegment,
                           CAST(floor(c_acctbal / 1000) AS BIGINT))
            AS BIGINT) AS n_peers
FROM customer
""",
)
def win_default_frame_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The default-window-frame ties pin (§2.E semantics completion):
    with ORDER BY on a non-unique band, the ANSI default frame is
    RANGE UNBOUNDED PRECEDING..CURRENT ROW — all PEERS of the current
    row are included at once, so the running sum jumps by whole tied
    groups — while the ROWS spelling with a unique tiebreak advances
    row by row. Both are emitted side by side (they differ exactly
    where n_peers > 1), pinning the classic silent running-total bug
    in both engines. DECIMAL sums keep every value exact; ties are
    engineered via the coarse floor(bal/1000) band."""
    c = Tables(spark, sf_dir).customer
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    dec = F.col("c_acctbal").cast("decimal(19,2)")
    w_default = Window.partitionBy("c_mktsegment").orderBy("band")
    w_rows = (
        Window.partitionBy("c_mktsegment")
        .orderBy("band", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_peers = Window.partitionBy("c_mktsegment", "band")
    return c.withColumn("band", band).select(
        "c_mktsegment",
        "c_custkey",
        "band",
        F.round(F.sum(dec).over(w_default), 2)
        .cast("double")
        .alias("running_default_frame"),
        F.round(F.sum(dec).over(w_rows), 2)
        .cast("double")
        .alias("running_rows_tiebroken"),
        F.count(F.lit(1)).over(w_peers).cast("bigint").alias("n_peers"),
    )


@register(
    "text_js_divergence_pairwise",
    oracle="""
WITH src AS (
  SELECT source, token, count(*) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        FROM documents)
  GROUP BY source, token
),
tot AS (SELECT source, CAST(sum(c) AS DOUBLE) AS n FROM src GROUP BY source),
p AS (
  SELECT s.source, s.token, CAST(s.c AS DOUBLE) / t.n AS p
  FROM src s JOIN tot t ON s.source = t.source
),
pairs AS (
  SELECT a.source AS src1, b.source AS src2, a.token,
         a.p AS pa, b.p AS pb, (a.p + b.p) / 2 AS m
  FROM p a JOIN p b ON a.token = b.token AND a.source < b.source
)
SELECT src1, src2,
       count(*) AS n_shared_tokens,
       floor((0.5 * sum(pa * ln(pa / m)) + 0.5 * sum(pb * ln(pb / m)))
             * 1000000 + 0.5) / 1000000 AS js_divergence
FROM pairs GROUP BY src1, src2
""",
)
def text_js_divergence_pairwise(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between sources' token
    unigram distributions — the SYMMETRIC, bounded drift metric
    (0..ln 2) corpus monitoring actually dashboards, complementing the
    asymmetric text_kl_divergence_sources. Token probabilities come
    from exact integer counts with one double division each; the
    token-keyed self-join is bounded by |sources| per token partition
    (the KL op's no-hot-token argument), and each pair's sum spans the
    shared vocabulary, 6dp-rounded per the float-aggregate rule.
    Tokens absent from one source contribute their finite half-terms
    only when shared — absent-token mass needs smoothing, documented
    as out of scope (this corpus shares its full vocabulary)."""
    t = Tables(spark, sf_dir)
    src = (
        t.documents.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = src.groupBy("source").agg(F.sum("c").cast("double").alias("n"))
    p = src.join(F.broadcast(tot), "source").select(
        "source", "token", (F.col("c").cast("double") / F.col("n")).alias("p")
    )
    a = p.select(
        F.col("source").alias("src1"),
        "token",
        F.col("p").alias("pa"),
    )
    b = p.select(
        F.col("source").alias("src2"),
        "token",
        F.col("p").alias("pb"),
    )
    pairs = (
        a.join(b, "token")
        .filter(F.col("src1") < F.col("src2"))
        .withColumn("m", (F.col("pa") + F.col("pb")) / 2)
    )
    js = 0.5 * F.sum(
        F.col("pa") * F.log(F.col("pa") / F.col("m"))
    ) + 0.5 * F.sum(F.col("pb") * F.log(F.col("pb") / F.col("m")))
    return pairs.groupBy("src1", "src2").agg(
        F.count(F.lit(1)).alias("n_shared_tokens"),
        _pround(js).alias("js_divergence"),
    )
