"""Round-5 sixteenth wave (SURVEY.md §2.Q, continued): exactly-once
batch ledger semantics, stable k-per-group sampling, deterministic
content-UUID minting, and session-bounded CEP-style pattern matching.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "pipeline_idempotent_ledger",
    oracle="""
WITH feed AS (
  -- at-least-once delivery: batches 0-4 once, batches 1 and 3 replayed
  SELECT o_orderkey % 5 AS batch_id, o_orderkey, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderkey % 5, o_orderkey, o_totalprice FROM orders
  WHERE o_orderkey % 5 IN (1, 3)
),
delivery AS (
  SELECT batch_id, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY batch_id, o_orderkey
                            ORDER BY o_orderkey) AS attempt
  FROM feed
),
applied AS (SELECT * FROM delivery WHERE attempt = 1)
SELECT batch_id,
       count(*) AS n_applied,
       CAST((SELECT count(*) FROM delivery d
             WHERE d.batch_id = a.batch_id AND d.attempt > 1) AS BIGINT)
         AS n_deduped_replays,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(19, 2))), 2) AS DOUBLE)
         AS applied_total
FROM applied a
GROUP BY batch_id
""",
)
def pipeline_idempotent_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once semantics over an at-least-once feed: batches land
    once, two of them are replayed (the crash-retry reality of every
    delivery system), and the ledger — first-attempt-wins per
    (batch, key) — makes application idempotent: per-batch applied
    counts and totals must equal the single-delivery truth, with the
    replayed rows accounted as deduped. This is the keystone pipeline
    guarantee the write-mode matrix (sink_write_modes) builds toward:
    append-landing + ledger = effective exactly-once. One window over
    the delivery log keyed (batch, key); totals in DECIMAL."""
    o = Tables(spark, sf_dir).orders
    base = o.select(
        (F.col("o_orderkey") % 5).alias("batch_id"),
        "o_orderkey",
        "o_totalprice",
    )
    feed = base.unionByName(base.filter(F.col("batch_id").isin(1, 3)))
    w = Window.partitionBy("batch_id", "o_orderkey").orderBy("o_orderkey")
    delivery = feed.withColumn("attempt", F.row_number().over(w))
    applied = delivery.filter(F.col("attempt") == 1)
    replays = (
        delivery.filter(F.col("attempt") > 1)
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n_deduped_replays"))
    )
    return (
        applied.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_applied"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(19,2)")), 2
            )
            .cast("double")
            .alias("applied_total"),
        )
        .join(F.broadcast(replays), "batch_id", "left")
        .select(
            "batch_id",
            "n_applied",
            F.coalesce("n_deduped_replays", F.lit(0))
            .cast("bigint")
            .alias("n_deduped_replays"),
            "applied_total",
        )
    )


@register(
    "sample_k_per_group_stable",
    oracle="""
SELECT c_mktsegment, c_custkey, sample_rank FROM (
  SELECT c_mktsegment, c_custkey,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey
         ) AS sample_rank
  FROM customer)
WHERE sample_rank <= 10
""",
)
def sample_k_per_group_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling: exactly 10 customers per
    segment, chosen by ranking on the md5 of the key — uniform-ish,
    seedless, and STABLE under repartitioning, re-runs, and engine
    choice (rand()-based sampling is none of those; this is the
    debugging/eyeballing sample you can cite in a bug report and
    reproduce tomorrow). The per-group rank plans as WindowGroupLimit:
    each partition locally top-k's before the shuffle, so the full
    group never moves — the split_train_eval hash idiom applied to
    fixed-size sampling."""
    c = Tables(spark, sf_dir).customer
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.row_number().over(w).alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= 10)
    )


@register(
    "fn_content_uuid",
    oracle="""
SELECT doc_id,
       substring(md5(text), 1, 8) || '-' ||
       substring(md5(text), 9, 4) || '-' ||
       substring(md5(text), 13, 4) || '-' ||
       substring(md5(text), 17, 4) || '-' ||
       substring(md5(text), 21, 12) AS content_uuid
FROM documents
""",
)
def fn_content_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-derived UUID minting (the UUIDv3/v5 idea
    with the portable md5 digest): the same bytes always mint the same
    id, so re-ingestion is naturally idempotent and ids survive
    backfills — unlike uuid()/monotonically_increasing_id(), which are
    non-deterministic and unusable as content keys. Pure string
    slicing of the hex digest into 8-4-4-4-12; zero shuffles."""
    d = Tables(spark, sf_dir).documents
    h = F.md5("text")
    uuid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return d.select("doc_id", uuid.alias("content_uuid"))


@register(
    "events_cep_triple_pattern",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM seq
),
pat AS (
  SELECT user_id, session_id, event_type AS e1,
         lead(event_type, 1) OVER w2 AS e2,
         lead(event_type, 2) OVER w2 AS e3,
         lead(session_id, 2) OVER w2 AS s3
  FROM sess
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, count(*) AS n_matches
FROM pat
WHERE e1 = 'view' AND e2 = 'click' AND e3 = 'purchase'
  AND s3 = session_id
GROUP BY user_id
""",
)
def events_cep_triple_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style pattern detection without a CEP engine:
    strictly consecutive view→click→purchase triples, all three inside
    ONE 30-minute session (a lead() across a session boundary must not
    match — checked by comparing the 3rd row's session id). The
    Flink-CEP/MATCH_RECOGNIZE workload expressed as two stacked windows
    over one user partitioning: sessionize, then a lead-chain predicate.
    Per-user match counts; strict contiguity is what separates this
    from events_markov_2step_paths' unconditional trigram census."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(prev.isNull() | (gap_us > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = seq.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("is_new").over(cum).alias("session_id"),
    )
    pat = sess.select(
        "user_id",
        "session_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead("session_id", 2).over(w).alias("s3"),
    )
    return (
        pat.filter(
            (F.col("e1") == "view")
            & (F.col("e2") == "click")
            & (F.col("e3") == "purchase")
            & (F.col("s3") == F.col("session_id"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
