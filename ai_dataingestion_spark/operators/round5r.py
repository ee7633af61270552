"""Round-5 eighteenth wave (SURVEY.md §2.Q, continued): top session
paths, linear multi-touch attribution, conversion-latency quantiles,
and a small-files compaction planner.

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
    "events_top_session_paths",
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
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sess
  GROUP BY user_id, session_id
  HAVING count(*) <= 8
),
counted AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY path)
SELECT path, n_sessions FROM (
  SELECT path, n_sessions,
         row_number() OVER (ORDER BY n_sessions DESC, path) AS rn
  FROM counted)
WHERE rn <= 20
""",
)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session paths: each 30-minute session rendered as its
    ordered event-type string (view>click>purchase…), counted across
    sessions — the "what do users actually do" report behind every
    funnel hypothesis. Sessions longer than 8 events are excluded (long
    tails are unique paths that never rank and only bloat the shuffle).
    Path strings are built ORDER-DETERMINISTICALLY: Spark sorts the
    collected (ts, event_id, type) structs before joining — collect_list
    alone has nondeterministic shuffle order (the §5.4 trap) — matching
    DuckDB's ordered string_agg. Top-20 cut is count-then-path
    deterministic."""
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
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s.getField("event_type"),
                ),
                ">",
            ).alias("path"),
        )
        .filter(F.col("n_events") <= 8)
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        counted.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
        .select("path", "n_sessions")
    )


@register(
    "events_attribution_linear",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(ts AS DATE) AS day
  FROM events
),
purchases AS (
  SELECT user_id, day, ts, event_id FROM seq WHERE event_type = 'purchase'
),
touches AS (
  SELECT s.user_id, p.event_id AS purchase_id, s.event_type AS touch_type,
         count(*) OVER (PARTITION BY p.event_id) AS k
  FROM purchases p
  JOIN seq s
    ON s.user_id = p.user_id AND s.day = p.day
   AND (s.ts < p.ts OR (s.ts = p.ts AND s.event_id < p.event_id))
   AND s.event_type <> 'purchase'
),
credited AS (
  SELECT touch_type,
         CAST(floor(1.0 / k * 1000000000 + 0.5) / 1000000000
              AS DECIMAL(28, 9)) AS credit
  FROM touches
)
SELECT touch_type,
       count(*) AS n_touches,
       CAST(sum(credit) AS DOUBLE) AS linear_credit
FROM credited GROUP BY touch_type
""",
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every same-day touch preceding a
    purchase shares the conversion credit equally (1/k each) — the
    equal-weight sibling of events_attribution_last_touch, the model
    marketing uses when no single touch deserves the win. Determinism
    trick: each 1/k credit is portable-rounded to 9dp FIRST and then
    accumulated as DECIMAL(28,9) — rounded terms sum exactly and
    order-independently, where a raw double Σ(1/k) would differ by
    summation order across engines/partitionings. The purchase⇄touch
    join is keyed (user, day): fan-out bounded by a user's daily
    activity, never cross-user."""
    e = Tables(spark, sf_dir).events
    seq = e.select(
        "user_id", "ts", "event_id", "event_type", F.to_date("ts").alias("day")
    )
    purchases = seq.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "day",
        F.col("ts").alias("pts"),
        F.col("event_id").alias("purchase_id"),
    )
    touches = (
        purchases.join(seq, ["user_id", "day"])
        .filter(
            (
                (F.col("ts") < F.col("pts"))
                | (
                    (F.col("ts") == F.col("pts"))
                    & (F.col("event_id") < F.col("purchase_id"))
                )
            )
            & (F.col("event_type") != "purchase")
        )
        .select("purchase_id", F.col("event_type").alias("touch_type"))
    )
    k = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    credited = touches.select(
        "touch_type",
        _pround(F.lit(1.0) / k, 9).cast("decimal(28,9)").alias("credit"),
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("credit").cast("double").alias("linear_credit"),
    )


@register(
    "events_time_to_convert_quantiles",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
),
lat AS (
  SELECT user_id,
         CAST((epoch_us(first_purchase) - epoch_us(first_view)) / 60000000.0
              AS DOUBLE) AS minutes
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_view
)
SELECT count(*) AS n_converted,
       floor(CAST(quantile_cont(minutes, 0.5) AS DOUBLE) * 1000000 + 0.5)
         / 1000000 AS p50_minutes,
       floor(CAST(quantile_cont(minutes, 0.9) AS DOUBLE) * 1000000 + 0.5)
         / 1000000 AS p90_minutes,
       floor(CAST(max(minutes) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS max_minutes
FROM lat
""",
)
def events_time_to_convert_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversion-latency distribution: minutes from each user's FIRST
    view to their FIRST subsequent purchase, summarized as p50/p90/max —
    the funnel-velocity headline ("half convert within X minutes") that
    events_funnel's pure counts can't answer. One per-user conditional-
    min reduce (partial-aggregable), then quantiles over the
    users-sized latency relation. Latency is exact integer µs divided
    once by 6e7 — bit-identical before the interpolating quantile."""
    e = Tables(spark, sf_dir).events
    firsts = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("first_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    lat = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            (
                F.unix_micros(F.col("first_purchase").cast("timestamp"))
                - F.unix_micros(F.col("first_view").cast("timestamp"))
            )
            / 60_000_000.0
        ).alias("minutes")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        _pround(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY minutes)")
        ).alias("p50_minutes"),
        _pround(
            F.expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY minutes)")
        ).alias("p90_minutes"),
        _pround(F.max("minutes")).alias("max_minutes"),
    )


_TARGET_FILE_BYTES = 4 * 1024 * 1024  # 4 MiB scratch-scale stand-in


@register(
    "pipeline_compaction_planner",
    oracle=f"""
WITH sized AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         -- serialized-width proxy: fixed numeric widths + string bytes
         8 + 8 + 8 + octet_length(encode(o_orderstatus))
           + octet_length(encode(o_orderpriority)) AS row_bytes
  FROM orders
)
SELECT day,
       count(*) AS n_rows,
       CAST(sum(row_bytes) AS BIGINT) AS est_bytes,
       CAST(greatest(1, ceil(CAST(sum(row_bytes) AS DOUBLE)
                             / {_TARGET_FILE_BYTES})) AS BIGINT)
         AS planned_files
FROM sized GROUP BY day
""",
)
def pipeline_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner: per day-partition, estimate the
    serialized byte weight (fixed numeric widths + measured string
    bytes) and emit the target file count ceil(bytes/target) — the
    work-list a nightly OPTIMIZE/compaction job executes, and the
    repartition(n) argument pipeline_compact_latest would consume. The
    byte model is a proxy (parquet encodes/compresses), but it is the
    SAME deterministic proxy in both engines, and proxy-driven planning
    is exactly how real compactors size output without a dry-run write.
    One partial-aggregable pass; output is days-sized."""
    o = Tables(spark, sf_dir).orders
    row_bytes = (
        F.lit(8 + 8 + 8)
        + F.octet_length(F.encode("o_orderstatus", "UTF-8"))
        + F.octet_length(F.encode("o_orderpriority", "UTF-8"))
    )
    sized = o.select(
        F.date_trunc("day", "o_orderdate").alias("day"),
        row_bytes.alias("row_bytes"),
    )
    return sized.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("row_bytes").cast("bigint").alias("est_bytes"),
        F.greatest(
            F.lit(1),
            F.ceil(
                F.sum("row_bytes").cast("double") / _TARGET_FILE_BYTES
            ),
        )
        .cast("bigint")
        .alias("planned_files"),
    )
