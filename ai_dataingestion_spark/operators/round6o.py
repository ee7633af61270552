"""Round-5 forty-first wave (SURVEY.md §2.Q, continued): leakage-safe
point-in-time feature assembly, closed-form sign-binarized Hamming
separation, and hierarchical share-of-parent rollups.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables

_WEEK_S = 7 * 24 * 3600


@register(
    "events_pit_training_features",
    oracle=f"""
WITH sec AS (
  SELECT user_id, event_type, CAST(ts AS DATE) AS day,
         CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
),
feat AS (
  SELECT day, event_type,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           OVER w AS trailing_clicks,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER w AS trailing_views,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           OVER w AS trailing_errors
  FROM sec
  WINDOW w AS (PARTITION BY user_id ORDER BY t
               RANGE BETWEEN {_WEEK_S} PRECEDING AND 1 PRECEDING)
)
SELECT CAST(day AS VARCHAR) AS day,
       count(*) AS n_purchases,
       round(avg(coalesce(trailing_clicks, 0)), 6) AS avg_trailing_clicks,
       round(avg(coalesce(trailing_views, 0)), 6) AS avg_trailing_views,
       round(avg(coalesce(trailing_errors, 0)), 6) AS avg_trailing_errors
FROM feat WHERE event_type = 'purchase'
GROUP BY day
""",
)
def events_pit_training_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time-correct training-feature assembly — the
    feature-store pattern behind leakage-free ML datasets: for every
    purchase (the label event), per-user behavioral counts over the
    trailing 7 days STRICTLY BEFORE the purchase second (the RANGE
    frame ends at 1 PRECEDING, so nothing co-timed with or after the
    label leaks into its features; join_asof picks one nearest value,
    this aggregates a whole window). The frame is value-based on epoch
    seconds — deterministic under timestamp ties, no tie-break key
    needed — and all three feature columns come from ONE window pass
    over the user partition; the label filter then drops to the
    days-sized report. One corpus shuffle on user_id."""
    e = Tables(spark, sf_dir).events
    sec = e.select(
        "user_id",
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
        ).alias("t"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-_WEEK_S, -1)
    )
    feat = sec.select(
        "day",
        "event_type",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w)
        .alias("trailing_clicks"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(w)
        .alias("trailing_views"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w)
        .alias("trailing_errors"),
    )
    return (
        feat.where(F.col("event_type") == "purchase")
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.avg(F.coalesce("trailing_clicks", F.lit(0))), 6
            ).alias("avg_trailing_clicks"),
            F.round(
                F.avg(F.coalesce("trailing_views", F.lit(0))), 6
            ).alias("avg_trailing_views"),
            F.round(
                F.avg(F.coalesce("trailing_errors", F.lit(0))), 6
            ).alias("avg_trailing_errors"),
        )
    )


@register(
    "embed_sign_hamming_separation",
    oracle="""
WITH bits AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CASE WHEN unnest(embedding) > 0 THEN 1.0 ELSE 0.0 END AS b
  FROM embeddings
),
marg AS (
  SELECT label, dim, avg(b) AS p FROM bits GROUP BY label, dim
)
SELECT a.label AS label_a, b.label AS label_b,
       round(sum(a.p * (1 - b.p) + (1 - a.p) * b.p), 6) AS mean_hamming
FROM marg a JOIN marg b ON a.dim = b.dim
GROUP BY a.label, b.label
""",
)
def embed_sign_hamming_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sign-binarized (1-bit-per-dim) Hamming separation between label
    groups — does the 64× compression of sign-LSH codes (Charikar
    2002) preserve label structure? The key identity: the EXACT mean
    pairwise Hamming distance between groups A and B is
    Σ_d [p_A(1−p_B) + (1−p_A)p_B] where p is each group's per-dim
    1-bit rate — so the all-pairs O(n²) comparison collapses to an
    O(labels × dims) join over bit marginals. That closed form IS the
    100 TB plan: one explode + one (label, dim) aggregate, then a
    640-row self-join; within-label diagonal (self-pairs included)
    low vs off-diagonal high = codes separate the labels."""
    e = Tables(spark, sf_dir).embeddings
    bits = e.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.when(F.col("x") > 0, 1.0).otherwise(0.0).alias("b"),
    )
    # cache the labels×dims marginal (≤640 rows): the self-join would
    # otherwise re-run the corpus explode+aggregate once per side
    # (measured: 2 Generate posexplode nodes without it)
    marg = bits.groupBy("label", "dim").agg(F.avg("b").alias("p")).cache()
    a = marg.select(
        F.col("label").alias("label_a"),
        F.col("dim").alias("dim_a"),
        F.col("p").alias("pa"),
    )
    b = marg.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim_b"),
        F.col("p").alias("pb"),
    )
    return (
        a.join(F.broadcast(b), F.col("dim_a") == F.col("dim_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sum(
                    F.col("pa") * (1 - F.col("pb"))
                    + (1 - F.col("pa")) * F.col("pb")
                ),
                6,
            ).alias("mean_hamming")
        )
    )


@register(
    "orders_hierarchy_share_of_parent",
    oracle="""
WITH base AS (
  SELECT r_name, n_name, c_mktsegment AS seg,
         sum(CAST(o_totalprice AS DECIMAL(19,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3
),
seg_lvl AS (
  SELECT 'segment' AS level, n_name || '/' || seg AS key, n_name AS parent,
         rev,
         sum(rev) OVER (PARTITION BY n_name) AS parent_rev
  FROM base
),
nat_lvl AS (
  SELECT 'nation' AS level, n_name AS key, r_name AS parent,
         sum(rev) AS rev
  FROM base GROUP BY n_name, r_name
),
nat_w AS (
  SELECT level, key, parent, rev,
         sum(rev) OVER (PARTITION BY parent) AS parent_rev
  FROM nat_lvl
),
reg_lvl AS (
  SELECT 'region' AS level, r_name AS key, 'ALL' AS parent,
         sum(rev) AS rev
  FROM base GROUP BY r_name
),
reg_w AS (
  SELECT level, key, parent, rev, sum(rev) OVER () AS parent_rev
  FROM reg_lvl
),
u AS (
  SELECT * FROM seg_lvl UNION ALL
  SELECT * FROM nat_w UNION ALL
  SELECT * FROM reg_w
)
SELECT level, key, parent,
       CAST(round(rev, 2) AS DOUBLE) AS revenue,
       round(CAST(rev AS DOUBLE) / CAST(parent_rev AS DOUBLE), 6)
         AS share_of_parent
FROM u
""",
)
def orders_hierarchy_share_of_parent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hierarchical share-of-parent report over region → nation →
    market segment: every node's revenue as a fraction of its PARENT's
    total — the drill-down ratio agg_rollup's grand-margin rows don't
    give you (a rollup shares against the grand total; planners want
    'this segment is 40% of its nation'). One corpus-sized groupBy to
    the (region, nation, segment) base relation; every level and every
    parent total is then a window or re-aggregate over those ≤ 125
    rows, DECIMAL until the final ratio."""
    t = Tables(spark, sf_dir)
    base = (
        t.orders.join(
            broadcast_if_small(
                t.customer.select("c_custkey", "c_nationkey", "c_mktsegment"),
                sf_dir,
                "customer",
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name", F.col("c_mktsegment").alias("seg"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(19,2)")).alias("rev")
        )
    )
    seg_lvl = base.select(
        F.lit("segment").alias("level"),
        F.concat_ws("/", "n_name", "seg").alias("key"),
        F.col("n_name").alias("parent"),
        "rev",
        F.sum("rev").over(Window.partitionBy("n_name")).alias("parent_rev"),
    )
    nat_lvl = base.groupBy("n_name", "r_name").agg(
        F.sum("rev").alias("rev")
    )
    nat_w = nat_lvl.select(
        F.lit("nation").alias("level"),
        F.col("n_name").alias("key"),
        F.col("r_name").alias("parent"),
        "rev",
        F.sum("rev").over(Window.partitionBy("r_name")).alias("parent_rev"),
    )
    reg_lvl = base.groupBy("r_name").agg(F.sum("rev").alias("rev"))
    reg_w = reg_lvl.select(
        F.lit("region").alias("level"),
        F.col("r_name").alias("key"),
        F.lit("ALL").alias("parent"),
        "rev",
        F.sum("rev").over(Window.partitionBy()).alias("parent_rev"),
    )
    u = seg_lvl.unionByName(nat_w).unionByName(reg_w)
    return u.select(
        "level",
        "key",
        "parent",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.col("parent_rev").cast("double"),
            6,
        ).alias("share_of_parent"),
    )
