"""Round-5 twenty-third wave (SURVEY.md §2.Q, continued): partial-
aggregation merge proof, transition dwell-time stats, training-shard
manifest build, and median-split quadrant classification.

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
    "agg_partial_merge_proof",
    oracle="""
WITH whole AS (
  SELECT count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(19, 2))) AS s,
         sum(CAST(o_totalprice AS DECIMAL(19, 2))
             * CAST(o_totalprice AS DECIMAL(19, 2))) AS s2
  FROM orders
),
h1 AS (
  SELECT count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(19, 2))) AS s,
         sum(CAST(o_totalprice AS DECIMAL(19, 2))
             * CAST(o_totalprice AS DECIMAL(19, 2))) AS s2
  FROM orders WHERE o_orderkey % 2 = 0
),
h2 AS (
  SELECT count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(19, 2))) AS s,
         sum(CAST(o_totalprice AS DECIMAL(19, 2))
             * CAST(o_totalprice AS DECIMAL(19, 2))) AS s2
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT w.n AS n_rows,
       floor((CAST(w.s2 AS DOUBLE) - CAST(w.s AS DOUBLE)
              * CAST(w.s AS DOUBLE) / w.n) / (w.n - 1) * 1000000 + 0.5)
         / 1000000 AS variance_whole,
       floor((CAST(h1.s2 + h2.s2 AS DOUBLE) - CAST(h1.s + h2.s AS DOUBLE)
              * CAST(h1.s + h2.s AS DOUBLE) / (h1.n + h2.n))
             / (h1.n + h2.n - 1) * 1000000 + 0.5) / 1000000
         AS variance_merged,
       CAST(CASE WHEN w.n = h1.n + h2.n AND w.s = h1.s + h2.s
                  AND w.s2 = h1.s2 + h2.s2
                 THEN 0 ELSE 1 END AS INT) AS merge_mismatch
FROM whole w CROSS JOIN h1 CROSS JOIN h2
""",
)
def agg_partial_merge_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregation merge soundness, proven as output: the
    (n, Σx, Σx²) moment state computed over the WHOLE relation must
    equal the component-wise merge of the two half-relations' states —
    the algebraic property that makes map-side combine, AQE re-plans,
    and incremental rollups all return the same answer. States live in
    DECIMAL so the equality is EXACT (merge_mismatch is pinned 0, not
    approximately 0), and the variance derived from whole vs merged
    states is emitted from both paths with identical IEEE order. This
    is the engine-correctness invariant behind every partial-aggregable
    claim in SCALE.md, made hash-checkable."""
    o = Tables(spark, sf_dir).orders
    dec = F.col("o_totalprice").cast("decimal(19,2)")

    def state(df: DataFrame, prefix: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias(f"{prefix}n"),
            F.sum(dec).alias(f"{prefix}s"),
            F.sum(dec * dec).alias(f"{prefix}s2"),
        )

    whole = state(o, "w_")
    h1 = state(o.filter(F.col("o_orderkey") % 2 == 0), "a_")
    h2 = state(o.filter(F.col("o_orderkey") % 2 == 1), "b_")
    j = whole.crossJoin(F.broadcast(h1)).crossJoin(F.broadcast(h2))
    var_whole = (
        F.col("w_s2").cast("double")
        - F.col("w_s").cast("double") * F.col("w_s").cast("double") / F.col("w_n")
    ) / (F.col("w_n") - 1)
    ms = F.col("a_s") + F.col("b_s")
    ms2 = F.col("a_s2") + F.col("b_s2")
    mn = F.col("a_n") + F.col("b_n")
    var_merged = (
        ms2.cast("double") - ms.cast("double") * ms.cast("double") / mn
    ) / (mn - 1)
    mismatch = F.when(
        (F.col("w_n") == mn)
        & (F.col("w_s") == ms)
        & (F.col("w_s2") == ms2),
        0,
    ).otherwise(1)
    return j.select(
        F.col("w_n").alias("n_rows"),
        _pround(var_whole).alias("variance_whole"),
        _pround(var_merged).alias("variance_merged"),
        mismatch.cast("int").alias("merge_mismatch"),
    )


@register(
    "events_transition_dwell_stats",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS dwell_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type, event_type AS next_type,
       count(*) AS n_transitions,
       CAST(sum(dwell_us) AS BIGINT) AS dwell_us_sum,
       floor(CAST(sum(dwell_us) AS DOUBLE) / count(*) / 1000000
             * 1000000 + 0.5) / 1000000 AS mean_dwell_s,
       CAST(quantile_cont(dwell_us, 0.5) AS DOUBLE) AS p50_dwell_us
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
)
def events_transition_dwell_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dwell time per transition: how long users linger BETWEEN each
    (from → to) event-type pair — the timing layer the count-only
    events_transition_matrix lacks (a view→purchase edge that takes 2
    seconds vs 20 minutes is a different product story). One
    user-partitioned lag window emits (prev, next, µs delta); exact
    integer µs sums, one rounded division for the mean, interpolating
    median over exact integers. Output bounded by types²."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dwell = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(w).cast("timestamp")
    )
    seq = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
        dwell.alias("dwell_us"),
    ).filter(F.col("prev_type").isNotNull())
    n = F.count(F.lit(1))
    return seq.groupBy("prev_type", "next_type").agg(
        n.alias("n_transitions"),
        F.sum("dwell_us").cast("bigint").alias("dwell_us_sum"),
        _pround(F.sum("dwell_us").cast("double") / n / 1_000_000).alias(
            "mean_dwell_s"
        ),
        F.expr(
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY dwell_us)"
        ).alias("p50_dwell_us"),
    )


_SHARD_DOCS = 500


@register(
    "pipeline_shard_manifest",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 8 AS shard_id
  FROM documents
)
SELECT shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS token_sum,
       CAST(sum(n_chars) AS BIGINT) AS char_sum,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc,
       CAST(CASE WHEN count(*) > {_SHARD_DOCS} THEN 1 ELSE 0 END AS INT)
         AS needs_split
FROM assigned GROUP BY shard_id
""",
)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest build (the WebDataset/tar-shard prep
    step): docs are hash-assigned to 8 shards (md5 of the id — stable
    under re-runs and appends, the split_train_eval idiom), and the
    manifest reports per-shard doc/token/char budgets plus a
    needs_split flag against the {_SHARD_DOCS}-doc target — exactly
    what a dataloader needs to plan balanced, reproducible epochs.
    One partial-aggregable pass; hash assignment means shard sizes
    stay balanced at any corpus size without a shuffle-by-range."""
    d = Tables(spark, sf_dir).documents
    shard = (
        F.expr(
            "CAST(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
            " AS BIGINT)"
        )
        % 8
    )
    assigned = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        shard.alias("shard_id"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("token_sum"),
        F.sum("n_chars").cast("bigint").alias("char_sum"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.when(F.count(F.lit(1)) > _SHARD_DOCS, 1)
        .otherwise(0)
        .cast("int")
        .alias("needs_split"),
    )


@register(
    "supplier_quadrant_classification",
    oracle="""
WITH vol AS (
  SELECT s_suppkey, s_acctbal,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19, 2))) AS DOUBLE)
           AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
  GROUP BY s_suppkey, s_acctbal
),
cuts AS (
  SELECT CAST(quantile_cont(s_acctbal, 0.5) AS DOUBLE) AS bal_med,
         CAST(quantile_cont(volume, 0.5) AS DOUBLE) AS vol_med
  FROM vol
)
SELECT CASE WHEN s_acctbal >= bal_med AND volume >= vol_med
            THEN 'strong_partner'
            WHEN s_acctbal >= bal_med THEN 'underutilized'
            WHEN volume >= vol_med THEN 'exposure_risk'
            ELSE 'marginal' END AS quadrant,
       count(*) AS n_suppliers,
       min(s_suppkey) AS example_supplier
FROM vol CROSS JOIN cuts
GROUP BY 1
""",
)
def supplier_quadrant_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Median-split quadrant classification of suppliers on (account
    balance × traded volume): strong partners, underutilized capital,
    volume-on-weak-balance exposure risk, and the marginal tail — the
    2×2 a procurement review starts from. Both medians interpolate on
    exact inputs and broadcast as one cut row; classification is pure
    comparison. DECIMAL volume sums keep the median's input exact."""
    t = Tables(spark, sf_dir)
    vol = (
        t.supplier.join(
            t.lineitem, F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_suppkey", "s_acctbal")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(19,2)"))
            .cast("double")
            .alias("volume")
        )
    )
    cuts = vol.agg(
        F.expr(
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY s_acctbal)"
        ).alias("bal_med"),
        F.expr(
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY volume)"
        ).alias("vol_med"),
    )
    quadrant = (
        F.when(
            (F.col("s_acctbal") >= F.col("bal_med"))
            & (F.col("volume") >= F.col("vol_med")),
            "strong_partner",
        )
        .when(F.col("s_acctbal") >= F.col("bal_med"), "underutilized")
        .when(F.col("volume") >= F.col("vol_med"), "exposure_risk")
        .otherwise("marginal")
    )
    return (
        vol.crossJoin(F.broadcast(cuts))
        .groupBy(quadrant.alias("quadrant"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.min("s_suppkey").alias("example_supplier"),
        )
    )
