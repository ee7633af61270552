"""Round-5 twenty-ninth wave (SURVEY.md §2.Q, continued): Population
Stability Index drift, the median-of-means robust estimator, and
quality-aware dedup representative selection.

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


_PSI_CUT = "2024-01-15"


@register(
    "quality_psi_drift",
    oracle=f"""
WITH pre AS (
  SELECT value FROM events WHERE ts < TIMESTAMP '{_PSI_CUT}'
),
cuts AS (
  SELECT CAST(quantile_cont(value, 0.1) AS DOUBLE) AS q1,
         CAST(quantile_cont(value, 0.2) AS DOUBLE) AS q2,
         CAST(quantile_cont(value, 0.3) AS DOUBLE) AS q3,
         CAST(quantile_cont(value, 0.4) AS DOUBLE) AS q4,
         CAST(quantile_cont(value, 0.5) AS DOUBLE) AS q5,
         CAST(quantile_cont(value, 0.6) AS DOUBLE) AS q6,
         CAST(quantile_cont(value, 0.7) AS DOUBLE) AS q7,
         CAST(quantile_cont(value, 0.8) AS DOUBLE) AS q8,
         CAST(quantile_cont(value, 0.9) AS DOUBLE) AS q9
  FROM pre
),
binned AS (
  SELECT CASE WHEN ts < TIMESTAMP '{_PSI_CUT}' THEN 'pre' ELSE 'post' END
           AS period,
         (CASE WHEN value > q1 THEN 1 ELSE 0 END) +
         (CASE WHEN value > q2 THEN 1 ELSE 0 END) +
         (CASE WHEN value > q3 THEN 1 ELSE 0 END) +
         (CASE WHEN value > q4 THEN 1 ELSE 0 END) +
         (CASE WHEN value > q5 THEN 1 ELSE 0 END) +
         (CASE WHEN value > q6 THEN 1 ELSE 0 END) +
         (CASE WHEN value > q7 THEN 1 ELSE 0 END) +
         (CASE WHEN value > q8 THEN 1 ELSE 0 END) +
         (CASE WHEN value > q9 THEN 1 ELSE 0 END) AS bin
  FROM events CROSS JOIN cuts
),
shares AS (
  SELECT bin,
         CAST(sum(CASE WHEN period = 'pre' THEN 1 ELSE 0 END) AS DOUBLE)
           / (SELECT count(*) FROM binned WHERE period = 'pre') AS p,
         CAST(sum(CASE WHEN period = 'post' THEN 1 ELSE 0 END) AS DOUBLE)
           / (SELECT count(*) FROM binned WHERE period = 'post') AS q
  FROM binned GROUP BY bin
),
terms AS (
  SELECT bin,
         CAST(floor((p - q) * ln(p / q) * 1000000000 + 0.5) / 1000000000
              AS DECIMAL(28, 9)) AS term
  FROM shares
)
SELECT count(*) AS n_bins,
       floor(CAST(sum(term) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS psi,
       CAST(CASE WHEN CAST(sum(term) AS DOUBLE) >= 0.2 THEN 1 ELSE 0 END
            AS INT) AS drift_alarm
FROM terms
""",
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between pre- and post-cutover value
    distributions: decile bins fitted on the PRE period (the expected
    distribution), PSI = Σ(pᵢ−qᵢ)·ln(pᵢ/qᵢ), with the standard
    ≥0.2 drift alarm — the binned drift score risk/model monitoring
    standardizes on, complementing quality_ks_two_sample's sup-gap.
    Bin edges are bit-identical interpolated quantiles broadcast once;
    per-bin terms are 9dp-rounded then DECIMAL-summed (order-
    independent); the alarm fires on the UNROUNDED sum in both
    engines."""
    e = Tables(spark, sf_dir).events
    pre_pred = F.col("ts") < F.lit(_PSI_CUT).cast("timestamp")
    cuts = e.filter(pre_pred).agg(
        *[
            F.expr(
                f"percentile_cont({q / 10}) WITHIN GROUP (ORDER BY value)"
            ).alias(f"q{q}")
            for q in range(1, 10)
        ]
    )
    bin_ = sum(
        F.when(F.col("value") > F.col(f"q{q}"), 1).otherwise(0)
        for q in range(1, 10)
    )
    binned = e.crossJoin(F.broadcast(cuts)).select(
        F.when(pre_pred, "pre").otherwise("post").alias("period"),
        bin_.alias("bin"),
    )
    totals = binned.groupBy().pivot("period", ["pre", "post"]).count()
    shares = (
        binned.groupBy("bin")
        .agg(
            F.sum(F.when(F.col("period") == "pre", 1).otherwise(0)).alias(
                "c_pre"
            ),
            F.sum(F.when(F.col("period") == "post", 1).otherwise(0)).alias(
                "c_post"
            ),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "bin",
            (F.col("c_pre").cast("double") / F.col("pre")).alias("p"),
            (F.col("c_post").cast("double") / F.col("post")).alias("q"),
        )
    )
    term = _pround(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 9
    ).cast("decimal(28,9)")
    agg = shares.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(term).cast("double").alias("psi_raw"),
    )
    return agg.select(
        "n_bins",
        _pround(F.col("psi_raw")).alias("psi"),
        F.when(F.col("psi_raw") >= 0.2, 1)
        .otherwise(0)
        .cast("int")
        .alias("drift_alarm"),
    )


_MOM_BUCKETS = 10


@register(
    "agg_median_of_means",
    oracle=f"""
WITH bucketed AS (
  SELECT CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)
              AS BIGINT) % {_MOM_BUCKETS} AS bkt,
         CAST(o_totalprice AS DECIMAL(19, 2)) AS v
  FROM orders
),
bucket_means AS (
  SELECT bkt,
         floor(CAST(sum(v) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
           AS m
  FROM bucketed GROUP BY bkt
),
overall AS (
  SELECT floor(CAST(sum(v) AS DOUBLE)
               / count(*) * 1000000 + 0.5) / 1000000 AS plain_mean
  FROM bucketed
)
SELECT {_MOM_BUCKETS} AS n_buckets,
       (SELECT plain_mean FROM overall) AS plain_mean,
       CAST((SELECT quantile_cont(m, 0.5) FROM bucket_means) AS DOUBLE)
         AS median_of_means
""",
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means robust mean estimation: rows hash into
    {_MOM_BUCKETS} buckets (deterministic md5 assignment — the
    split_train_eval idiom), each bucket's mean is computed from exact
    DECIMAL sums, and the estimator is the MEDIAN of those bucket
    means — sub-Gaussian concentration under heavy tails where the
    plain mean is hostage to outliers, and the estimator behind
    sketch-style robust aggregation at scale (each bucket is a
    partial-aggregable group; only k means meet the median). Plain
    mean emitted alongside for the comparison the estimator exists to
    win."""
    o = Tables(spark, sf_dir).orders
    bkt = (
        F.expr(
            "CAST(conv(substring(md5(cast(o_orderkey as string)), 1, 15),"
            " 16, 10) AS BIGINT)"
        )
        % _MOM_BUCKETS
    )
    dec = F.col("o_totalprice").cast("decimal(19,2)")
    bucketed = o.select(bkt.alias("bkt"), dec.alias("v"))
    bucket_means = bucketed.groupBy("bkt").agg(
        _pround(F.sum("v").cast("double") / F.count(F.lit(1))).alias("m")
    )
    overall = bucketed.agg(
        _pround(F.sum("v").cast("double") / F.count(F.lit(1))).alias(
            "plain_mean"
        )
    )
    mom = bucket_means.agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY m)").alias(
            "median_of_means"
        )
    )
    return (
        overall.crossJoin(F.broadcast(mom))
        .select(
            F.lit(_MOM_BUCKETS).alias("n_buckets"),
            "plain_mean",
            "median_of_means",
        )
    )


@register(
    "dedup_representative_selection",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  -- truncated inferior copies of every 4th doc under offset ids
  SELECT doc_id + 3000000,
         array_to_string(list_slice(string_split(text, ' '), 1,
           greatest(len(string_split(text, ' ')) - 5, 1)), ' ')
  FROM documents WHERE doc_id % 4 = 0
),
keyed AS (
  -- family key: first 5 tokens (the prefix-template family rule)
  SELECT doc_id, text,
         md5(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' '))
           AS family,
         len(string_split(text, ' ')) AS n_tokens
  FROM corpus
),
ranked AS (
  SELECT doc_id, family, n_tokens,
         row_number() OVER (PARTITION BY family
                            ORDER BY n_tokens DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY family) AS family_size
  FROM keyed
)
SELECT doc_id AS representative_id, family,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(family_size AS BIGINT) AS family_size
FROM ranked
WHERE rn = 1 AND family_size >= 2
""",
)
def dedup_representative_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QUALITY-AWARE canonical selection for dedup families: within each
    family (shared-5-token-prefix key — the template rule), keep the
    RICHEST copy (most tokens, id tiebreak) instead of the arbitrary
    smallest id that plain keep-min dedup retains — the policy layer
    that decides WHICH duplicate survives, which matters when copies
    are truncated or stripped versions of each other (injected here:
    every 4th doc re-enters minus its last 5 tokens and must LOSE to
    its fuller original). One family-partitioned window over
    (family-hash, token-count) — text leaves the scan only as its
    hash and length."""
    d = Tables(spark, sf_dir).documents.select("doc_id", "text")
    toks = F.split("text", " ")
    inferior = d.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.array_join(
            F.slice(toks, 1, F.greatest(F.size(toks) - 5, F.lit(1))), " "
        ).alias("text"),
    )
    corpus = d.unionByName(inferior)
    keyed = corpus.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5))).alias(
            "family"
        ),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = Window.partitionBy("family").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    ranked = keyed.select(
        "doc_id",
        "family",
        "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("family")).alias(
            "family_size"
        ),
    )
    return ranked.filter(
        (F.col("rn") == 1) & (F.col("family_size") >= 2)
    ).select(
        F.col("doc_id").alias("representative_id"),
        "family",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("family_size").cast("bigint").alias("family_size"),
    )
