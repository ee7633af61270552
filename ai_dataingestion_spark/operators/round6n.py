"""Round-5 fortieth wave (SURVEY.md §2.Q, continued): foreachBatch
streaming UPSERT (merge, not append), stratified-sampling estimator
variance, and a p-chart attribute control chart.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir


@register(
    "stream_foreachbatch_upsert",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       (SELECT count(*) FROM events e WHERE e.user_id = ranked.user_id)
         AS n_events,
       (SELECT CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE)
        FROM events e WHERE e.user_id = ranked.user_id) AS total_value,
       event_type AS last_type
FROM ranked WHERE rn = 1
""",
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UPSERT via foreachBatch — last-writer-wins state merge,
    the semantics ingest_incremental's dedup-append cannot express:
    each micro-batch folds into a per-user state table (event count,
    DECIMAL value total, latest event type by (ts, event_id)) by
    re-aggregating old ⊕ new. The merge is associative because every
    state column is a monoid — counts add, decimals add, and 'latest'
    is max over a (ts, event_id, type) struct — which is exactly what
    makes the pattern batch-order-independent and therefore
    replay-safe at scale. State lands in alternating generation dirs
    (write-new-then-advance), never read-and-overwrite in place. Final
    answer must equal the batch aggregate over all events."""
    from ai_dataingestion_spark.streaming.incremental import (
        _RAW_EVENTS_DDL,
        _read_stream,
        _run_available_now,
        stage_event_files,
    )

    staging = stage_event_files(spark, sf_dir, n_files=3)
    root = op_tmpdir("upsert_state_")
    ckpt = op_tmpdir("upsert_ckpt_")
    state_schema = (
        "user_id bigint, n_events bigint, sum_value decimal(38,6), "
        "latest struct<ts:timestamp_ntz,event_id:bigint,event_type:string>"
    )

    def _gen_dir(gen: int) -> str:
        return os.path.join(root, f"gen={gen}")

    def _latest_gen() -> int:
        gens = [
            int(d.split("=", 1)[1])
            for d in os.listdir(root)
            if d.startswith("gen=")
        ]
        return max(gens, default=-1)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        batch_state = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("decimal(38,6)")
            .alias("sum_value"),
            F.max(F.struct("ts", "event_id", "event_type")).alias("latest"),
        )
        gen = _latest_gen()
        if gen >= 0:
            old = sess.read.schema(state_schema).parquet(_gen_dir(gen))
            merged = (
                old.unionByName(batch_state)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
                    F.max("latest").alias("latest"),
                )
            )
        else:
            merged = batch_state
        merged.write.mode("overwrite").parquet(_gen_dir(gen + 1))

    _run_available_now(
        _read_stream(spark, staging)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", ckpt)
    )
    gen = _latest_gen()
    if gen < 0:
        # empty corpus: zero micro-batches fired, no state generation
        # exists — return the empty result in the contract schema
        return spark.createDataFrame(
            [],
            "user_id bigint, n_events bigint, total_value double, "
            "last_type string",
        )
    final = spark.read.schema(state_schema).parquet(_gen_dir(gen))
    return final.select(
        "user_id",
        "n_events",
        F.round("sum_value", 2).cast("double").alias("total_value"),
        F.col("latest.event_type").alias("last_type"),
    )


@register(
    "agg_stratified_estimator_variance",
    oracle="""
WITH strat AS (
  SELECT c_mktsegment,
         count(*) AS nh,
         sum(CAST(c_acctbal AS DECIMAL(38,2))) AS s1,
         sum(CAST(c_acctbal AS DECIMAL(38,2))
             * CAST(c_acctbal AS DECIMAL(38,2))) AS s2
  FROM customer GROUP BY c_mktsegment
),
g AS (
  SELECT nh, s1, s2,
         CAST(s1 AS DOUBLE) / nh AS mh,
         CAST(nh * s2 - s1 * s1 AS DOUBLE) / (CAST(nh AS DOUBLE) * (nh - 1))
           AS vh,
         sum(nh) OVER () AS n,
         sum(s1) OVER () AS t1,
         sum(s2) OVER () AS t2
  FROM strat
)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       round(CAST(max(t1) AS DOUBLE) / max(n), 6) AS strat_mean,
       round(sqrt(sum((CAST(nh AS DOUBLE) / n) * (CAST(nh AS DOUBLE) / n)
                      * vh / nh)), 6) AS se_stratified,
       round(sqrt(CAST(max(n) * max(t2) - max(t1) * max(t1) AS DOUBLE)
                  / (CAST(max(n) AS DOUBLE) * (max(n) - 1)) / max(n)), 6)
         AS se_srs,
       round(sum((CAST(nh AS DOUBLE) / n) * (CAST(nh AS DOUBLE) / n)
                 * vh / nh)
             / (CAST(max(n) * max(t2) - max(t1) * max(t1) AS DOUBLE)
                / (CAST(max(n) AS DOUBLE) * (max(n) - 1)) / max(n)), 6)
         AS design_effect
FROM g
""",
)
def agg_stratified_estimator_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stratified-sampling estimator variance for mean account balance
    with c_mktsegment strata: SE under proportional stratification
    (Σ W_h² s_h²/n_h), SE under simple random sampling, and their
    ratio — the DESIGN EFFECT that says how much a stratified sample
    plan buys (deff < 1: strata explain balance variance; ≈ 1: they
    don't). The survey-sampling math every data-subsample pipeline
    (split_train_eval, sample_stratified) implicitly relies on. All
    variances assemble from EXACT decimal moment sums (Σx, Σx² per
    stratum, window-totaled over the 5-row strata relation) — the
    events_interarrival_burstiness portability rule — so both engines
    evaluate identical doubles."""
    c = Tables(spark, sf_dir).customer
    xd = F.col("c_acctbal").cast("decimal(38,2)")
    strat = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(xd).alias("s1"),
        F.sum(xd * xd).alias("s2"),
    )
    w_all = Window.partitionBy()
    g = strat.select(
        "nh",
        "s1",
        "s2",
        (
            (
                F.col("nh") * F.col("s2") - F.col("s1") * F.col("s1")
            ).cast("double")
            / (F.col("nh").cast("double") * (F.col("nh") - 1))
        ).alias("vh"),
        F.sum("nh").over(w_all).alias("n"),
        F.sum("s1").over(w_all).alias("t1"),
        F.sum("s2").over(w_all).alias("t2"),
    )
    nn = F.max("n").cast("double")
    var_strat = F.sum(
        (F.col("nh").cast("double") / F.col("n"))
        * (F.col("nh").cast("double") / F.col("n"))
        * F.col("vh")
        / F.col("nh")
    )
    var_srs = (
        (F.max("n") * F.max("t2") - F.max("t1") * F.max("t1")).cast(
            "double"
        )
        / (nn * (F.max("n") - 1))
        / F.max("n")
    )
    return g.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.max("t1").cast("double") / F.max("n"), 6).alias(
            "strat_mean"
        ),
        F.round(F.sqrt(var_strat), 6).alias("se_stratified"),
        F.round(F.sqrt(var_srs), 6).alias("se_srs"),
        F.round(var_strat / var_srs, 6).alias("design_effect"),
    )


@register(
    "events_pchart_error_rate",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         count(*) AS n,
         count(CASE WHEN event_type = 'error' THEN 1 END) AS x
  FROM events GROUP BY 1
),
g AS (
  SELECT day, n, x,
         CAST(sum(x) OVER () AS DOUBLE) / sum(n) OVER () AS pbar
  FROM daily
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(n AS BIGINT) AS n_events,
       CAST(x AS BIGINT) AS n_errors,
       round(CAST(x AS DOUBLE) / n, 6) AS rate,
       round(greatest(pbar - 3 * sqrt(pbar * (1 - pbar) / n), 0.0), 6)
         AS lcl,
       round(pbar + 3 * sqrt(pbar * (1 - pbar) / n), 6) AS ucl,
       CAST(x AS DOUBLE) / n
         > pbar + 3 * sqrt(pbar * (1 - pbar) / n)
       OR CAST(x AS DOUBLE) / n
         < greatest(pbar - 3 * sqrt(pbar * (1 - pbar) / n), 0.0)
         AS out_of_control
FROM g
""",
)
def events_pchart_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart over the daily error-event share: 3σ binomial
    control limits around the center line p̄ = Σx/Σn, with per-day
    limits widening on low-volume days (the √(p̄(1−p̄)/n_t) term) — the
    attribute-control-chart sibling of lineitem_quantity_cusum_shift
    (which detects small sustained shifts; the p-chart flags single
    out-of-control days). Everything derives from exact integer daily
    counts and two window totals over the days-sized relation; the
    flag compares the SAME float expressions on both engines, so no
    epsilon is needed at the boundary."""
    e = Tables(spark, sf_dir).events
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("x"),
    )
    w_all = Window.partitionBy()
    g = daily.select(
        "day",
        "n",
        "x",
        (
            F.sum("x").over(w_all).cast("double")
            / F.sum("n").over(w_all)
        ).alias("pbar"),
    )
    rate = F.col("x").cast("double") / F.col("n")
    sig = F.sqrt(
        F.col("pbar") * (1 - F.col("pbar")) / F.col("n")
    )
    lcl = F.greatest(F.col("pbar") - 3 * sig, F.lit(0.0))
    ucl = F.col("pbar") + 3 * sig
    return g.select(
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        F.col("x").cast("bigint").alias("n_errors"),
        F.round(rate, 6).alias("rate"),
        F.round(lcl, 6).alias("lcl"),
        F.round(ucl, 6).alias("ucl"),
        ((rate > ucl) | (rate < lcl)).alias("out_of_control"),
    )
