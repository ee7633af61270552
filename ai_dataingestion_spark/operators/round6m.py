"""Round-5 thirty-ninth wave (SURVEY.md §2.Q, continued): epsilon
similarity join on scalars without a cartesian, time-interval RANGE
frames, and dynamic partition overwrite semantics.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir

_EPS = 5.0


@register(
    "join_epsilon_float",
    oracle=f"""
SELECT n_name AS nation, count(*) AS n_pairs
FROM supplier
JOIN customer ON abs(s_acctbal - c_acctbal) <= {_EPS}
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def join_epsilon_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-join on a scalar (|s_acctbal − c_acctbal| ≤ ε) WITHOUT
    the cartesian product the theta-join definition implies: both
    sides bucket to floor(bal/ε), the customer side expands to its
    three candidate buckets {b−1, b, b+1} (a row within ε of bal must
    sit in one of them), and the join becomes a hash-partitioned
    EQUALITY join on bucket followed by the exact |Δ| ≤ ε verify —
    candidate volume is bounded by 3× the true near-pair density
    instead of |S|×|C|. Each true pair is counted exactly once because
    a supplier's single bucket matches exactly one of the three
    expanded candidates. The oracle states the quadratic theta-join
    definition; the plan test pins no-cartesian on the engine side."""
    t = Tables(spark, sf_dir)
    s = t.supplier.select(
        "s_nationkey",
        F.col("s_acctbal").alias("sb"),
        F.floor(F.col("s_acctbal") / _EPS).alias("bk"),
    )
    c = t.customer.select(
        F.col("c_acctbal").alias("cb"),
        F.explode(
            F.array(
                F.floor(F.col("c_acctbal") / _EPS) - 1,
                F.floor(F.col("c_acctbal") / _EPS),
                F.floor(F.col("c_acctbal") / _EPS) + 1,
            )
        ).alias("bk"),
    )
    pairs = s.join(c, "bk").where(
        F.abs(F.col("sb") - F.col("cb")) <= _EPS
    )
    return (
        pairs.join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "events_max_sliding_hour_rate",
    oracle="""
WITH sec AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
),
rates AS (
  SELECT event_type,
         count(*) OVER (PARTITION BY event_type ORDER BY t
                        RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
           AS hour_count
  FROM sec
)
SELECT event_type,
       CAST(max(hour_count) AS BIGINT) AS max_hour_count,
       count(*) AS n_events
FROM rates GROUP BY event_type
""",
)
def events_max_sliding_hour_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Peak TRUE-sliding one-hour event rate per type: for every event,
    how many same-type events landed in the trailing 3600 s, then the
    max — the rate-limiter / burst-SLA view that bucketed variants
    (events_error_burst_5min) systematically understate when a burst
    straddles a bucket edge. The time-interval RANGE frame (§2.E's
    value-range frame applied to epoch seconds) makes the window
    VALUE-based: timestamp ties all share one frame, so the count is
    deterministic with no tie-break key needed. One shuffle on
    event_type; the frame never materializes the hour — Spark's
    running RANGE frame is O(n) per partition."""
    e = Tables(spark, sf_dir).events
    sec = e.select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        ).alias("t"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rangeBetween(-3599, Window.currentRow)
    )
    rates = sec.select(
        "event_type", F.count(F.lit(1)).over(w).alias("hour_count")
    )
    return rates.groupBy("event_type").agg(
        F.max("hour_count").cast("bigint").alias("max_hour_count"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "sink_dynamic_partition_overwrite",
    oracle="""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day, event_type FROM events
),
touched AS (
  SELECT count(*) AS c FROM d
  WHERE day <= DATE '2024-01-05' AND event_type = 'click'
),
untouched AS (
  SELECT count(*) AS c FROM d WHERE day > DATE '2024-01-05'
)
SELECT 'rows_after' AS metric,
       (SELECT c FROM touched) + (SELECT c FROM untouched) AS value
UNION ALL
SELECT 'days_present', (SELECT count(DISTINCT day) FROM d)
UNION ALL
SELECT 'touched_day_rows', (SELECT c FROM touched)
UNION ALL
SELECT 'untouched_day_rows', (SELECT c FROM untouched)
""",
)
def sink_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC partition-overwrite semantics, the incremental-reload
    contract sink_write_modes's whole-table modes can't express:
    overwrite mode with partitionOverwriteMode=dynamic replaces ONLY
    the partitions present in the incoming frame (here: days ≤ Jan 5,
    clicks only) and leaves every other day's files untouched — under
    the default static mode the same write would TRUNCATE the table to
    5 days. The op lands the full day-partitioned table, re-writes the
    filtered slice, then audits the target: total rows, surviving day
    partitions, rows inside vs outside the touched days. The session
    conf is restored in a finally block; expectations on the oracle
    side derive from the same events relation."""
    e = Tables(spark, sf_dir).events
    day = F.col("ts").cast("date").alias("day")
    base = e.select("event_id", "event_type", day)
    target = op_tmpdir("sink_dpo_")
    base.write.mode("overwrite").partitionBy("day").parquet(target)
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    try:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        base.where(
            (F.col("day") <= F.lit("2024-01-05").cast("date"))
            & (F.col("event_type") == "click")
        ).write.mode("overwrite").partitionBy("day").parquet(target)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # explicit schema: an empty corpus writes zero partition dirs and
    # schema inference has nothing to read (the ingest_incremental rule)
    got = spark.read.schema(
        "event_id bigint, event_type string, day date"
    ).parquet(target)
    cutoff = F.lit("2024-01-05").cast("date")
    audit = got.agg(
        F.count(F.lit(1)).alias("rows_after"),
        F.countDistinct("day").alias("days_present"),
        F.count(F.when(F.col("day") <= cutoff, 1)).alias(
            "touched_day_rows"
        ),
        F.count(F.when(F.col("day") > cutoff, 1)).alias(
            "untouched_day_rows"
        ),
    )
    return audit.select(
        F.expr(
            "stack(4, 'rows_after', rows_after,"
            " 'days_present', CAST(days_present AS BIGINT),"
            " 'touched_day_rows', touched_day_rows,"
            " 'untouched_day_rows', untouched_day_rows) AS (metric, value)"
        )
    )
