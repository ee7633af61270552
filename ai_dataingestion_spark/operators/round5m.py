"""Round-5 thirteenth wave (SURVEY.md §2.Q, continued): linear-
interpolation gap fill (the two-sided sibling of LOCF), supplier
market-concentration HHI, binary-payload exact dedup over the
multimodal column, and winsorized robust statistics.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables


def _pround(col, dp: int = 6):
    """Portable IEEE rounding floor(x*10^dp + 0.5)/10^dp (see
    tpch_q2_min_cost_supplier)."""
    scale = 10**dp
    return F.floor(col * scale + 0.5) / scale


@register(
    "events_gap_fill_linear",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         round(sum(value), 6) AS day_value
  FROM events WHERE user_id % 50 = 0
  GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
),
spans AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
),
calendar AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM spans
),
joined AS (
  SELECT c.user_id, c.day, d.day_value,
         last_value(d.day_value IGNORE NULLS) OVER (
           PARTITION BY c.user_id ORDER BY c.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN d.day_value IS NOT NULL THEN c.day END
                    IGNORE NULLS) OVER (
           PARTITION BY c.user_id ORDER BY c.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(d.day_value IGNORE NULLS) OVER (
           PARTITION BY c.user_id ORDER BY c.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN d.day_value IS NOT NULL THEN c.day END
                     IGNORE NULLS) OVER (
           PARTITION BY c.user_id ORDER BY c.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM calendar c LEFT JOIN daily d USING (user_id, day)
)
SELECT user_id, day,
       CASE
         WHEN day_value IS NOT NULL THEN day_value
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           floor((pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                                    / CAST(nd - pd AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000
         WHEN pv IS NOT NULL THEN pv
         ELSE nv
       END AS filled_value,
       CAST(day_value IS NULL AS BOOLEAN) AS was_gap
FROM joined
""",
)
def events_gap_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification with LINEAR interpolation — the two-sided
    sibling of events_gap_fill_locf for series where a gap should ramp
    between its endpoints (sensor readings, balances) instead of
    holding flat: filled = prev + (next − prev) · elapsed/gap_span,
    with one-sided gaps extended from the available endpoint. Four
    ignore-nulls windows over the SAME user-partitioned ordering — one
    shuffle serves them all; the calendar explode is bounded by each
    user's own span. The interpolation formula is written with
    identical operation order in both engines and portable-6dp-rounded
    (observed values pass through un-re-rounded)."""
    t = Tables(spark, sf_dir)
    daily = (
        t.events.filter(F.col("user_id") % 50 == 0)
        .groupBy(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(F.round(F.sum("value"), 6).alias("day_value"))
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    joined = calendar.join(daily, ["user_id", "day"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    pv = F.last("day_value", ignorenulls=True).over(wb)
    pd_ = F.last(obs_day, ignorenulls=True).over(wb)
    nv = F.first("day_value", ignorenulls=True).over(wf)
    nd = F.first(obs_day, ignorenulls=True).over(wf)
    interp = _pround(
        pv
        + (nv - pv)
        * (
            F.datediff(F.col("day"), pd_).cast("double")
            / F.datediff(nd, pd_).cast("double")
        )
    )
    filled = (
        F.when(F.col("day_value").isNotNull(), F.col("day_value"))
        .when(pv.isNotNull() & nv.isNotNull(), interp)
        .when(pv.isNotNull(), pv)
        .otherwise(nv)
    )
    # day crosses as timestamp_ntz (the events_gap_fill_locf rule: DuckDB
    # DATE lands in pandas as midnight datetime64, Spark DateType as
    # datetime.date — distinct to the driver canonicalizer)
    return joined.select(
        "user_id",
        F.col("day").cast("timestamp_ntz").alias("day"),
        filled.alias("filled_value"),
        F.col("day_value").isNull().alias("was_gap"),
    )


@register(
    "supplier_hhi_by_nation",
    oracle="""
WITH rev AS (
  SELECT n_name, l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19, 2)))
              AS DECIMAL(19, 2)) AS r
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY n_name, l_suppkey
)
SELECT n_name,
       count(*) AS n_suppliers,
       floor(CAST(sum(r * r) AS DOUBLE)
             / CAST(CAST(sum(r) AS DECIMAL(19, 2))
                    * CAST(sum(r) AS DECIMAL(19, 2)) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS hhi
FROM rev GROUP BY n_name
""",
)
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index per supplier
    nation: Σᵢ(rᵢ/T)² over each nation's suppliers — 1/n for perfectly
    split markets, →1 for monopoly; the antitrust-style twin of
    supplier_revenue_gini. Float discipline: revenues and BOTH
    quadratic forms (Σr², T²) accumulate in DECIMAL — exact, order-
    independent — so the only IEEE operation is one final division,
    portable-6dp-rounded. DECIMAL(19,2) is the portable width window:
    at 18 digits DuckDB multiplies in int64 and OVERFLOWS on real
    revenue totals (measured), while ≥19 digits are hugeint-backed;
    on the Spark side the declared (39,4) product narrows to the
    38-precision cap without touching these values' 24 significant
    digits. One big join keyed on suppkey, dims broadcast,
    nations-sized output."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.join(
            broadcast_if_small(
                t.supplier.select("s_suppkey", "s_nationkey"), sf_dir, "supplier"
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(19,2)"))
            .cast("decimal(19,2)")
            .alias("r")
        )
    )
    tot = F.sum("r").cast("decimal(19,2)")
    return rev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        _pround(
            F.sum(F.col("r") * F.col("r")).cast("double")
            / (tot * tot).cast("double")
        ).alias("hhi"),
    )


_PAYLOAD_PREFIX = 64
_REPLAY_OFFSET = 5_000_000


@register(
    "multimodal_payload_dedup",
    oracle=f"""
WITH assets AS (
  SELECT doc_id, substring(text, 1, {_PAYLOAD_PREFIX}) AS payload_str
  FROM documents
  UNION ALL
  SELECT doc_id + {_REPLAY_OFFSET}, substring(text, 1, {_PAYLOAD_PREFIX})
  FROM documents WHERE doc_id % 11 = 0
)
SELECT md5(payload_str) AS payload_md5,
       count(*) AS n_copies,
       min(doc_id) AS first_id,
       max(doc_id) AS last_id,
       CAST(octet_length(encode(payload_str)) AS BIGINT) AS payload_bytes
FROM assets
GROUP BY payload_str
HAVING count(*) >= 2
""",
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the BINARY payload column — the asset-level
    twin of dedup_exact for image/audio blobs, where byte-identical
    payloads recur under different asset ids (re-uploads, replayed
    ingest batches). Payloads are the deterministic UTF-8 stub bytes
    (multimodal.py's documented codec posture); a replayed batch is
    injected (every 11th asset re-enters under a shifted id) so the
    detector provably catches it. Spark hashes the BINARY column
    directly — md5(bytes) ≡ DuckDB md5(varchar) on UTF-8 — and groups
    by the digest: payload bytes never shuffle, only 16-byte hashes
    do. The grouping key at scale is the digest of a multi-MB blob —
    the only workable equality key for binary assets."""
    d = Tables(spark, sf_dir).documents.select("doc_id", "text")
    replays = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + _REPLAY_OFFSET).alias("doc_id"), "text"
    )
    assets = d.unionByName(replays).select(
        "doc_id",
        F.encode(F.substring("text", 1, _PAYLOAD_PREFIX), "UTF-8").alias(
            "payload"
        ),
    )
    return (
        assets.groupBy(F.md5("payload").alias("payload_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
            F.max(F.octet_length("payload")).cast("bigint").alias(
                "payload_bytes"
            ),
        )
        .filter(F.col("n_copies") >= 2)
    )


@register(
    "events_value_winsorized_stats",
    oracle="""
WITH cuts AS (
  SELECT event_type,
         CAST(quantile_cont(value, 0.05) AS DOUBLE) AS p05,
         CAST(quantile_cont(value, 0.95) AS DOUBLE) AS p95
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       floor(CAST(sum(CAST(e.value AS DECIMAL(20, 6))) AS DOUBLE)
             / count(*) * 1000000 + 0.5) / 1000000 AS mean_raw,
       floor(CAST(sum(CAST(least(greatest(e.value, c.p05), c.p95)
                           AS DECIMAL(20, 6))) AS DOUBLE)
             / count(*) * 1000000 + 0.5) / 1000000 AS mean_winsorized,
       CAST(sum(CASE WHEN e.value < c.p05 OR e.value > c.p95
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
FROM events e JOIN cuts c ON e.event_type = c.event_type
GROUP BY e.event_type
""",
)
def events_value_winsorized_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winsorized mean per event type: values clamped to [p05, p95]
    before averaging — the robust-stats answer to 'one whale event
    wrecked the average' that a trimmed count can't give (n is
    preserved). The corpus value column carries exactly 2 decimals, so
    the DECIMAL(20,6) accumulation is EXACT (order-independent) and
    each mean is one portable-rounded IEEE division; the percentile
    cut relation is types-sized and broadcasts back. Two aggregate
    passes over events, no window."""
    e = Tables(spark, sf_dir).events
    cuts = e.groupBy("event_type").agg(
        F.expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY value)").alias(
            "p05"
        ),
        F.expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY value)").alias(
            "p95"
        ),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    n = F.count(F.lit(1))
    return (
        e.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            n.alias("n"),
            _pround(
                F.sum(F.col("value").cast("decimal(20,6)")).cast("double") / n
            ).alias("mean_raw"),
            _pround(
                F.sum(clamped.cast("decimal(20,6)")).cast("double") / n
            ).alias("mean_winsorized"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("p05"))
                    | (F.col("value") > F.col("p95")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clamped"),
        )
    )
