"""§2.E Window functions.

Every ORDER BY inside a window carries a unique tie-break key (o_orderkey /
event_id) — rank ties are the #1 cross-engine hash killer (SURVEY.md §5.4).
Window partitioning keys (o_custkey, user_id) are the natural distribution
keys at 100 TB: one shuffle on the partition key, then each window evaluates
partition-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

_HOUR_US = 3_600_000_000  # one hour in microseconds


def _epoch_us(col):
    """TIMESTAMP_NTZ → int64 epoch microseconds (session TZ is UTC, so the
    NTZ→TS cast is instant-preserving; mirrors DuckDB epoch_us)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


@register(
    "win_rank",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank of orders per customer by price."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return Tables(spark, sf_dir).orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_topk_group",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (rank + filter). Catalyst inserts a
    WindowGroupLimit so each partition only keeps 3 rows before the final
    window evaluation — the grouped-top-k plan that scales."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        Tables(spark, sf_dir)
        .orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            "rn",
        )
    )


@register(
    "win_lag_lead",
    oracle="""
SELECT event_id, user_id,
       epoch_us(ts) - epoch_us(lag(ts) OVER w)  AS gap_us,
       lead(event_type) OVER w                  AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap (µs) via lag; next event type via lead, per user."""
    w = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc("event_id"))
    e = Tables(spark, sf_dir).events.withColumn("_us", _epoch_us("ts"))
    return e.select(
        "event_id",
        "user_id",
        (F.col("_us") - F.lag("_us").over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "win_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS running_spend
FROM orders
""",
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer in order-date order."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return Tables(spark, sf_dir).orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "win_moving",
    oracle="""
SELECT event_id, user_id,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ), 4) AS mavg3
FROM events
""",
)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average of value over the last 3 events per user (ROWS frame)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts"), F.asc("event_id"))
        .rowsBetween(-2, Window.currentRow)
    )
    return Tables(spark, sf_dir).events.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("mavg3"),
    )


@register(
    "win_moving_range",
    oracle=f"""
SELECT event_id, user_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts) ASC
         RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW
       ), 4) AS sum_1h
FROM events
""",
)
def win_moving_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour sum of value per user (RANGE frame over epoch µs) —
    time-based frames need a numeric ordering column in Spark."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("_us"))
        .rangeBetween(-_HOUR_US, Window.currentRow)
    )
    e = Tables(spark, sf_dir).events.withColumn("_us", _epoch_us("ts"))
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
    )


@register(
    "win_ntile_dist",
    oracle="""
SELECT c_custkey,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
""",
)
def win_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucket + distribution ranks over account balances.
    percent_rank/cume_dist are exact rationals of row counts, so raw doubles
    match bit-for-bit; ntile is cast to bigint (DuckDB's type)."""
    w = Window.orderBy(F.asc_nulls_last("c_acctbal"), F.asc("c_custkey"))
    return Tables(spark, sf_dir).customer.select(
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "win_first_last",
    oracle="""
WITH ranked AS (
  SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts ASC,  event_id ASC)  AS rn_a,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id, day,
       max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
       max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type
FROM ranked
GROUP BY user_id, day
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user-day (deterministic orderBy, day emitted
    as ISO string to keep DATE out of the output schema)."""
    e = Tables(spark, sf_dir).events.withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    w = Window.partitionBy("user_id", "day").orderBy(F.asc_nulls_last("ts"), F.asc("event_id"))
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        e.select(
            "user_id",
            "day",
            F.first("event_type").over(wfull).alias("first_type"),
            F.last("event_type").over(wfull).alias("last_type"),
        )
        .distinct()
    )


@register(
    "win_lag_default",
    oracle="""
SELECT event_id, user_id,
       lag(event_type, 2, 'none') OVER w  AS type_2back,
       lead(event_type, 3, 'end') OVER w  AS type_3ahead
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def win_lag_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with multi-row offsets and explicit defaults (the partition
    edges take the default instead of NULL)."""
    w = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc("event_id"))
    return Tables(spark, sf_dir).events.select(
        "event_id",
        "user_id",
        F.lag("event_type", 2, "none").over(w).alias("type_2back"),
        F.lead("event_type", 3, "end").over(w).alias("type_3ahead"),
    )
