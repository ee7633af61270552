"""Round-5 thirtieth wave (SURVEY.md §2.Q, continued): moving annual
total, session-depth survival, session-gap parameter sensitivity, and
token-length histograms.

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
    "orders_moving_annual_total",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         sum(CAST(o_totalprice AS DECIMAL(19, 2))) AS rev,
         count(*) AS n
  FROM orders GROUP BY 1
),
indexed AS (
  SELECT m, rev, n,
         row_number() OVER (ORDER BY m) AS idx
  FROM monthly
)
SELECT m,
       CAST(round(sum(rev) OVER (ORDER BY idx
              ROWS BETWEEN 11 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS mat_revenue,
       CAST(sum(n) OVER (ORDER BY idx
              ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS mat_orders,
       CAST(count(*) OVER (ORDER BY idx
              ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS INT)
         AS months_in_window
FROM indexed
""",
)
def orders_moving_annual_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving Annual Total — trailing-12-month revenue per month, the
    de-seasonalized trend line commercial reporting defaults to (each
    point contains every season exactly once, so seasonality cancels
    without decomposition). A months-indexed ROWS frame over the
    monthly aggregate (contiguous months in this corpus make the
    row frame ≡ a month-range frame); months_in_window exposes the
    warm-up period where the window is still partial. DECIMAL sums,
    broadcast-sized relation at any order volume."""
    o = Tables(spark, sf_dir).orders
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(19,2)")).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    w_idx = Window.orderBy("m")
    indexed = monthly.withColumn("idx", F.row_number().over(w_idx))
    w_mat = Window.orderBy("idx").rowsBetween(-11, Window.currentRow)
    return indexed.select(
        "m",
        F.round(F.sum("rev").over(w_mat), 2)
        .cast("double")
        .alias("mat_revenue"),
        F.sum("n").over(w_mat).cast("bigint").alias("mat_orders"),
        F.count(F.lit(1)).over(w_mat).cast("int").alias("months_in_window"),
    )


_SESSION_SQL_PREFIX = """
seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {gap} MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM seq
),
lengths AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
"""


@register(
    "events_session_depth_survival",
    oracle="WITH "
    + _SESSION_SQL_PREFIX.format(gap=30)
    + """,
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_sessions FROM lengths)
SELECT k,
       CAST(n_ge_k AS BIGINT) AS n_sessions_ge_k,
       floor(CAST(n_ge_k AS DOUBLE) / n_sessions * 1000000 + 0.5) / 1000000
         AS survival
FROM (
  SELECT g.k, count(*) AS n_ge_k
  FROM (SELECT unnest(generate_series(1, 8)) AS k) g
  JOIN lengths l ON l.n_events >= g.k
  GROUP BY g.k
) CROSS JOIN tot
""",
)
def events_session_depth_survival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-depth survival curve: the share of sessions reaching at
    least k events, k = 1..8 — the engagement-depth complement of the
    bounce rate (its k=2 point is 1 − bounce), and the curve whose
    slope says where sessions die. Session lengths come from one
    sessionize pass; the ≥k counts join the 8-row k spine against the
    AGGREGATED lengths relation (the events_survival_weeks explode
    pattern) — never against raw events."""
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
        F.when(prev.isNull() | (gap_us > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lengths = (
        seq.select(
            "user_id", F.sum("is_new").over(cum).alias("session_id")
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    tot = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n_sessions")
    )
    spine = spark.range(1, 9).select(F.col("id").alias("k"))
    ge_k = (
        F.broadcast(spine)
        .join(lengths, lengths.n_events >= F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_ge_k"))
    )
    return ge_k.crossJoin(F.broadcast(tot)).select(
        "k",
        F.col("n_ge_k").cast("bigint").alias("n_sessions_ge_k"),
        _pround(F.col("n_ge_k").cast("double") / F.col("n_sessions")).alias(
            "survival"
        ),
    )


_GAPS_MIN = [15, 30, 60]


def _gap_cfg_sql(gap: int) -> str:
    return (
        "SELECT "
        + str(gap)
        + " AS gap_minutes, count(*) AS n_sessions, "
        + "CAST(quantile_cont(n_events, 0.5) AS DOUBLE) AS p50_events, "
        + "floor(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) "
        + "AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000 AS bounce_rate "
        + "FROM lengths_"
        + str(gap)
    )


@register(
    "events_session_gap_sensitivity",
    oracle="WITH "
    + ",".join(
        _SESSION_SQL_PREFIX.format(gap=g)
        .replace("seq AS", f"seq_{g} AS")
        .replace("sess AS", f"sess_{g} AS")
        .replace("FROM seq", f"FROM seq_{g}")
        .replace("FROM sess", f"FROM sess_{g}")
        .replace("lengths AS", f"lengths_{g} AS")
        for g in _GAPS_MIN
    )
    + "\n"
    + "\nUNION ALL\n".join(_gap_cfg_sql(g) for g in _GAPS_MIN),
)
def events_session_gap_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sessionization gap-parameter sensitivity: the same corpus
    sessionized under 15 / 30 / 60-minute inactivity gaps, reporting
    session count, median depth, and bounce rate per configuration —
    the sweep that turns the 30-minute industry default into a
    justified choice for THIS traffic (the dedup_lsh_band_tuning
    introspection pattern applied to sessionization). Each config is
    one user-partitioned window pass; all three share the same scan."""
    e = Tables(spark, sf_dir).events
    out = None
    for gap in _GAPS_MIN:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        prev = F.lag("ts").over(w)
        gap_us = F.unix_micros(
            F.col("ts").cast("timestamp")
        ) - F.unix_micros(prev.cast("timestamp"))
        seq = e.select(
            "user_id",
            "ts",
            "event_id",
            F.when(prev.isNull() | (gap_us > gap * 60 * 1_000_000), 1)
            .otherwise(0)
            .alias("is_new"),
        )
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lengths = (
            seq.select(
                "user_id", F.sum("is_new").over(cum).alias("session_id")
            )
            .groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        cfg = lengths.agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.expr(
                "percentile_cont(0.5) WITHIN GROUP (ORDER BY n_events)"
            ).alias("p50_events"),
            _pround(bounce.cast("double") / F.count(F.lit(1))).alias(
                "bounce_rate"
            ),
        ).select(
            F.lit(gap).alias("gap_minutes"),
            "n_sessions",
            "p50_events",
            "bounce_rate",
        )
        out = cfg if out is None else out.unionByName(cfg)
    return out


@register(
    "text_token_length_histogram",
    oracle="""
WITH toks AS (
  SELECT len(unnest(string_split(text, ' '))) AS tok_len FROM documents
)
SELECT CAST(least(tok_len, 15) AS BIGINT) AS len_band,
       count(*) AS n_tokens
FROM toks WHERE tok_len > 0
GROUP BY 1
""",
)
def text_token_length_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-length histogram (15+ capped): the tokenizer diagnostic
    that predicts subword fertility — a corpus heavy in long tokens
    fragments into more subwords per word, inflating effective token
    budgets (text_token_count measures totals; this explains them).
    One explode + bounded-band aggregate; output ≤15 rows at any
    scale."""
    d = Tables(spark, sf_dir).documents
    toks = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .select(F.length("tok").alias("tok_len"))
        .filter(F.col("tok_len") > 0)
    )
    return toks.groupBy(
        F.least(F.col("tok_len"), F.lit(15)).cast("bigint").alias("len_band")
    ).agg(F.count(F.lit(1)).alias("n_tokens"))
