"""Round-5 twelfth wave (SURVEY.md §2.Q, continued): session bounce
rate, embedding label-confusion matrix, per-brand Pareto coverage
depth, and IANA timezone conversion parity.

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
    "events_sessions_bounce_rate",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM seq
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         date_trunc('day', min(ts)) AS day
  FROM sess GROUP BY user_id, session_id
)
SELECT day,
       count(*) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       floor(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) * 1000000 + 0.5) / 1000000 AS bounce_rate
FROM per_session GROUP BY day
""",
)
def events_sessions_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions containing
    exactly one event, attributed to the day the session started — the
    engagement-quality headline next to events_dau_mau's volume view.
    Same single user-partitioned shuffle as events_sessionize_batch;
    the daily rollup is days-sized."""
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
    sess = seq.select(
        "user_id", "ts", F.sum("is_new").over(cum).alias("session_id")
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_trunc("day", F.min("ts")).alias("day"),
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounces.cast("bigint").alias("n_bounces"),
        _pround(bounces.cast("double") / F.count(F.lit(1))).alias(
            "bounce_rate"
        ),
    )


@register(
    "embed_label_confusion",
    oracle="""
WITH cent AS (
  SELECT label, list(c ORDER BY dim) AS cvec FROM (
    SELECT label, i AS dim, round(avg(x), 6) AS c FROM (
      SELECT label, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ) GROUP BY label, i
  ) GROUP BY label
),
dists AS (
  SELECT e.vec_id, e.label AS true_label, c.label AS other_label,
         floor(list_sum(list_transform(e.embedding,
                 (x, i) -> (CAST(x AS DOUBLE) - c.cvec[i])
                           * (CAST(x AS DOUBLE) - c.cvec[i])))
               * 1000000 + 0.5) / 1000000 AS d2
  FROM embeddings e JOIN cent c ON e.label <> c.label
),
nearest AS (
  SELECT vec_id, true_label, other_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, other_label) AS rn
  FROM dists
)
SELECT true_label, other_label AS nearest_other_label, count(*) AS n
FROM nearest WHERE rn = 1
GROUP BY true_label, other_label
""",
)
def embed_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-confusion matrix for the embedding space: each vector is
    assigned the nearest OTHER label's centroid, and the (true label →
    nearest other label) counts expose which classes blur together —
    the prototype-based confusability screen run before spending on a
    classifier. Centroids are rounded to 6dp on BOTH sides before any
    distance (the rounded-before-compare rule), distances are
    left-to-right folds (Spark aggregate ≡ DuckDB list_sum — the
    similarity.py float discipline) rounded before the argmin with an
    other-label tiebreak. Scale shape: the labels-sized centroid
    relation broadcasts; distances are map-side n×(k−1); output is
    bounded by labels² at any corpus size."""
    e = Tables(spark, sf_dir).embeddings
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda s: s.getField("c"),
            ).alias("cvec")
        )
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("cvec"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dists = (
        e.crossJoin(
            F.broadcast(
                cent.select(
                    F.col("label").alias("other_label"), "cvec"
                )
            )
        )
        .filter(F.col("label") != F.col("other_label"))
        .select(
            "vec_id",
            F.col("label").alias("true_label"),
            "other_label",
            _pround(d2).alias("d2"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "other_label")
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("true_label", F.col("other_label").alias("nearest_other_label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "brand_pareto_coverage",
    oracle="""
WITH rev AS (
  SELECT p_brand, l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(20, 2))) AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, l_partkey
),
ranked AS (
  SELECT p_brand, l_partkey, r,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY r DESC, l_partkey) AS rn,
         sum(r) OVER (PARTITION BY p_brand
                      ORDER BY r DESC, l_partkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(r) OVER (PARTITION BY p_brand) AS tot
  FROM rev
)
SELECT p_brand,
       count(*) AS n_parts,
       CAST(min(CASE WHEN cum * 5 >= tot * 4 THEN rn END) AS BIGINT)
         AS parts_to_80pct,
       floor(CAST(max(CASE WHEN rn = 1 THEN r END) AS DOUBLE)
             / CAST(max(tot) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS top_part_share
FROM ranked GROUP BY p_brand
""",
)
def brand_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto depth: how many parts cover 80% of each brand's
    revenue, plus the top part's share — the grouped twin of the global
    lineitem_abc_pareto, answering "is this brand's demand concentrated
    or long-tail?" per brand. Revenue accumulates in DECIMAL, and the
    80% cut is the EXACT integer-free comparison cum·5 ≥ tot·4 — no
    decimal division crosses engines (division scale rules differ);
    the only double division (top share) is portable-6dp-rounded.
    Brand-partitioned windows over the (brand, part)-sized aggregate."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.join(
            broadcast_if_small(t.part.select("p_partkey", "p_brand"), sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(20,2)")).alias("r")
        )
    )
    ws = Window.partitionBy("p_brand").orderBy(F.desc("r"), F.asc("l_partkey"))
    ranked = rev.select(
        "p_brand",
        "l_partkey",
        "r",
        F.row_number().over(ws).alias("rn"),
        F.sum("r")
        .over(ws.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("r").over(Window.partitionBy("p_brand")).alias("tot"),
    )
    return ranked.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min(
            F.when(F.col("cum") * 5 >= F.col("tot") * 4, F.col("rn"))
        )
        .cast("bigint")
        .alias("parts_to_80pct"),
        _pround(
            F.max(F.when(F.col("rn") == 1, F.col("r")))
            .cast("double")
            / F.max("tot").cast("double")
        ).alias("top_part_share"),
    )


_TZ_ZONES = ["America/New_York", "Asia/Tokyo", "Europe/Berlin"]


@register(
    "fn_timezone_convert",
    oracle="""
WITH zoned AS (
  {}
)
SELECT zone, local_hour, count(*) AS n
FROM zoned GROUP BY zone, local_hour
""".format(
        "\n  UNION ALL\n  ".join(
            f"SELECT '{z}' AS zone, "
            f"hour((ts AT TIME ZONE 'UTC') AT TIME ZONE '{z}') AS local_hour "
            f"FROM events"
            for z in _TZ_ZONES
        )
    ),
)
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA timezone conversion parity (§2.H family completion): UTC
    event times rendered into three zones' local wall clocks, counted
    per local hour — the localization step every global analytics
    rollup needs, pinned so both engines agree on tzdata semantics
    (offset application, not just formatting). Spark from_utc_timestamp
    ≡ DuckDB (ts AT TIME ZONE 'UTC') AT TIME ZONE zone. Pure
    expressions before a 3×24-row aggregate."""
    e = Tables(spark, sf_dir).events
    out = None
    for z in _TZ_ZONES:
        part = e.select(
            F.lit(z).alias("zone"),
            F.hour(
                F.from_utc_timestamp(F.col("ts").cast("timestamp"), z)
            ).alias("local_hour"),
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("zone", "local_hour").agg(
        F.count(F.lit(1)).alias("n")
    )
