"""Round-5 twenty-sixth wave (SURVEY.md §2.Q, continued): tokenizer
vocabulary coverage, as-of join direction variants, key-sequence gap
auditing via the two-level decomposition, and a snapshot-retention GC
planner.

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


_VOCAB = [
    "join", "hash", "row", "batch", "scan", "filter", "merge", "order",
    "column", "index", "sort", "cache", "spill", "page", "key", "block",
]


@register(
    "text_vocab_oov_rate",
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN w IN ({", ".join(f"'{w}'" for w in _VOCAB)})
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
       floor(CAST(sum(CASE WHEN w IN ({", ".join(f"'{w}'" for w in _VOCAB)})
                           THEN 0 ELSE 1 END) AS DOUBLE) / count(*)
             * 1000000 + 0.5) / 1000000 AS oov_rate
FROM toks GROUP BY source
""",
)
def text_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: per source, the share of corpus
    tokens OUTSIDE a fixed 16-entry vocabulary — the out-of-vocabulary
    rate that decides whether a tokenizer (or its replacement) fits a
    data source before a single training step is paid. The vocab is a
    literal shared verbatim with the oracle (the sentiment-lexicon
    fixture idiom); one token explode + conditional counts,
    partial-aggregable, sources-sized output."""
    d = Tables(spark, sf_dir).documents
    toks = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    oov = F.sum(F.when(F.col("w").isin(_VOCAB), 0).otherwise(1))
    n = F.count(F.lit(1))
    return toks.groupBy("source").agg(
        n.cast("bigint").alias("n_tokens"),
        oov.cast("bigint").alias("n_oov"),
        _pround(oov.cast("double") / n).alias("oov_rate"),
    )


@register(
    "join_asof_directions",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         epoch_us(ts) AS t
  FROM events
),
windowed AS (
  SELECT user_id, event_id, t, event_type,
         last_value(CASE WHEN event_type = 'error' THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS err_before,
         first_value(CASE WHEN event_type = 'error' THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS err_after
  FROM seq
),
enriched AS (SELECT * FROM windowed WHERE event_type = 'purchase')
SELECT user_id,
       count(*) AS n_purchases,
       CAST(sum(CASE WHEN err_before IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_prior_error,
       CAST(max(t - err_before) AS BIGINT) AS max_us_since_error,
       CAST(min(err_after - t) AS BIGINT) AS min_us_to_next_error,
       CAST(sum(CASE WHEN err_before IS NOT NULL AND err_after IS NOT NULL
                      AND t - err_before <= err_after - t THEN 1
                     WHEN err_before IS NOT NULL AND err_after IS NULL THEN 1
                     ELSE 0 END) AS BIGINT) AS n_nearest_is_backward
FROM enriched GROUP BY user_id
""",
)
def join_asof_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full as-of direction family — BACKWARD (most recent error
    before each purchase), FORWARD (next error after), and NEAREST
    (whichever is closer, backward winning ties) — computed for every
    purchase without any self-join: two ignore-nulls windows over ONE
    user partitioning carry the prior/next error timestamps along the
    timeline (join_asof covers backward via join; this is the
    window-spelled generalization the direction argument of a real
    asof API maps to). Exact integer µs arithmetic; per-user rollup."""
    e = Tables(spark, sf_dir).events
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = e.select(
        "user_id", "event_id", "event_type", t.alias("t")
    )
    err_t = F.when(F.col("event_type") == "error", F.col("t"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    enriched = seq.select(
        "user_id",
        "event_id",
        "t",
        "event_type",
        F.last(err_t, ignorenulls=True).over(wb).alias("err_before"),
        F.first(err_t, ignorenulls=True).over(wf).alias("err_after"),
    ).filter(F.col("event_type") == "purchase")
    nearest_back = F.when(
        F.col("err_before").isNotNull()
        & F.col("err_after").isNotNull()
        & (
            F.col("t") - F.col("err_before")
            <= F.col("err_after") - F.col("t")
        ),
        1,
    ).when(
        F.col("err_before").isNotNull() & F.col("err_after").isNull(), 1
    ).otherwise(0)
    return enriched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.when(F.col("err_before").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_prior_error"),
        F.max(F.col("t") - F.col("err_before"))
        .cast("bigint")
        .alias("max_us_since_error"),
        F.min(F.col("err_after") - F.col("t"))
        .cast("bigint")
        .alias("min_us_to_next_error"),
        F.sum(nearest_back).cast("bigint").alias("n_nearest_is_backward"),
    )


_GAP_BUCKET = 4096


@register(
    "quality_key_sequence_gaps",
    oracle=f"""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
buckets AS (
  SELECT k // {_GAP_BUCKET} AS b, min(k) AS kmin, max(k) AS kmax,
         count(*) AS n
  FROM keys GROUP BY b
),
intra AS (
  -- gap mass inside each bucket: span+1 minus present keys
  SELECT CAST(sum(kmax - kmin + 1 - n) AS BIGINT) AS intra_missing
  FROM buckets
),
inter AS (
  -- gap mass between consecutive buckets' boundary keys
  SELECT CAST(sum(kmin - prev_kmax - 1) AS BIGINT) AS inter_missing,
         CAST(max(kmin - prev_kmax - 1) AS BIGINT) AS largest_boundary_gap
  FROM (SELECT kmin, lag(kmax) OVER (ORDER BY b) AS prev_kmax FROM buckets)
  WHERE prev_kmax IS NOT NULL
),
bounds AS (
  SELECT min(k) AS k_lo, max(k) AS k_hi, count(*) AS n_keys FROM keys
)
SELECT n_keys,
       k_hi - k_lo + 1 AS span,
       CAST(k_hi - k_lo + 1 - n_keys AS BIGINT) AS total_missing,
       intra_missing,
       inter_missing,
       largest_boundary_gap
FROM bounds CROSS JOIN intra CROSS JOIN inter
""",
)
def quality_key_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-sequence gap audit — lost-data detection for a should-be-
    dense key space: total missing keys in the observed span,
    decomposed into intra-bucket and bucket-boundary gap mass (the two
    must sum to the total — an internal consistency check the oracle
    hashes). Scale shape: keys aggregate into {_GAP_BUCKET}-wide
    buckets FIRST, so the only ordered window runs over the
    buckets-sized relation — the two-level decomposition
    (events_peak_concurrency's prefix-sum argument) applied to gap
    detection; a naive lag over raw sorted keys would serialize the
    whole key space through one partition."""
    o = Tables(spark, sf_dir).orders
    keys = o.select(F.col("o_orderkey").alias("k")).distinct()
    buckets = keys.groupBy(
        (F.col("k") / _GAP_BUCKET).cast("bigint").alias("b")
    ).agg(
        F.min("k").alias("kmin"),
        F.max("k").alias("kmax"),
        F.count(F.lit(1)).alias("n"),
    )
    intra = buckets.agg(
        F.sum(F.col("kmax") - F.col("kmin") + 1 - F.col("n"))
        .cast("bigint")
        .alias("intra_missing")
    )
    w = Window.orderBy("b")
    inter = (
        buckets.select(
            "kmin", F.lag("kmax").over(w).alias("prev_kmax")
        )
        .filter(F.col("prev_kmax").isNotNull())
        .agg(
            F.sum(F.col("kmin") - F.col("prev_kmax") - 1)
            .cast("bigint")
            .alias("inter_missing"),
            F.max(F.col("kmin") - F.col("prev_kmax") - 1)
            .cast("bigint")
            .alias("largest_boundary_gap"),
        )
    )
    bounds = keys.agg(
        F.min("k").alias("k_lo"),
        F.max("k").alias("k_hi"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        bounds.crossJoin(F.broadcast(intra))
        .crossJoin(F.broadcast(inter))
        .select(
            "n_keys",
            (F.col("k_hi") - F.col("k_lo") + 1).alias("span"),
            (F.col("k_hi") - F.col("k_lo") + 1 - F.col("n_keys"))
            .cast("bigint")
            .alias("total_missing"),
            "intra_missing",
            "inter_missing",
            "largest_boundary_gap",
        )
    )


@register(
    "pipeline_retention_gc_plan",
    oracle="""
WITH snapshots AS (
  SELECT DISTINCT date_trunc('month', o_orderdate) AS snap FROM orders
),
ranked AS (
  SELECT snap,
         row_number() OVER (ORDER BY snap DESC) AS age_rank
  FROM snapshots
)
SELECT snap,
       CAST(age_rank AS BIGINT) AS age_rank,
       CASE WHEN age_rank <= 3 THEN 'keep_recent'
            WHEN (age_rank - 4) % 3 = 0 THEN 'keep_thinned'
            ELSE 'delete' END AS action
FROM ranked
""",
)
def pipeline_retention_gc_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-retention GC planner (the VACUUM work-list): monthly
    snapshots ranked newest-first, the 3 most recent kept outright,
    every 3rd older snapshot kept as the thinned history, the rest
    marked delete — the keep-recent + exponential/periodic-thinning
    policy every lakehouse table ages under. Rank arithmetic only, over
    the snapshots-sized relation; the emitted plan is the input a GC
    executor consumes (and what retention audits diff against)."""
    o = Tables(spark, sf_dir).orders
    snaps = o.select(
        F.date_trunc("month", "o_orderdate").alias("snap")
    ).distinct()
    w = Window.orderBy(F.desc("snap"))
    ranked = snaps.withColumn("age_rank", F.row_number().over(w))
    action = (
        F.when(F.col("age_rank") <= 3, "keep_recent")
        .when((F.col("age_rank") - 4) % 3 == 0, "keep_thinned")
        .otherwise("delete")
    )
    return ranked.select(
        "snap",
        F.col("age_rank").cast("bigint").alias("age_rank"),
        action.alias("action"),
    )
