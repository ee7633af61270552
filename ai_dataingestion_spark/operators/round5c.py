"""Round-5 third wave (SURVEY.md §2.Q, continued): the two partition-
pruning scan paths every 100 TB lake lives on (static partition pruning
and dynamic partition pruning through a join), cohort lifetime value,
brand co-purchase lift, calendar hour-gap detection, activity survival
curves, bigram conditional entropy, and binary-codec function parity.

Deferred to the r6 driver window like round5b (catalog
._DEFER_TO_NEXT_ROUND); locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir


# ---------------------------------------------------------------------------
# §2.Q.7 partition-pruning scan paths
# ---------------------------------------------------------------------------


@register(
    "scan_partition_pruned",
    oracle="""
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
         AS revenue
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderstatus
""",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static partition pruning: orders written partitionBy(priority) to
    a scratch lake, read back with a priority predicate — the scan must
    touch ONLY the two matching partition directories (PartitionFilters
    in the formatted plan, pinned by tests/test_plans.py). At 100 TB
    this is the difference between reading 2/5 of the table and all of
    it; the oracle is the equivalent filter on the logical relation."""
    out = op_tmpdir("scan_part_prune_")
    o = Tables(spark, sf_dir).orders
    (
        o.repartition("o_orderpriority")
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    back = spark.read.schema(o.schema).parquet(out)
    return (
        back.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "join_dpp_partitioned",
    oracle="""
-- NB: explicit OR equalities, not IN: DuckDB 1.0.0 rewrites
-- `CAST(ts AS DATE) IN (<date literals>)` under WHERE into a timestamp
-- IN that only matches midnight (verified: 0 rows vs 339/day equality).
SELECT event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-02'
   OR CAST(ts AS DATE) = DATE '2024-01-03'
   OR CAST(ts AS DATE) = DATE '2024-01-05'
GROUP BY event_type
""",
)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: events written partitionBy(day), then
    joined to a tiny filtered dim of flagged days. Catalyst injects the
    dim's day set as a runtime partition filter into the fact scan
    (dynamicpruning#N in the plan, pinned by tests/test_plans.py), so
    only the 3 matching day directories are read — the canonical
    star-join scan path at 100 TB, where the pruning predicate isn't
    known until the dim side is evaluated. Oracle: the equivalent
    static IN filter."""
    out = op_tmpdir("join_dpp_")
    ev = Tables(spark, sf_dir).events.withColumn(
        "day", F.col("ts").cast("date")
    )
    ev.repartition("day").write.mode("overwrite").partitionBy("day").parquet(out)
    # explicit schema: an empty corpus writes zero data files and schema
    # inference over the bare directory fails (the sink_parquet_part rule);
    # the day partition column still resolves from directory names when
    # files exist
    fact = spark.read.schema(ev.schema).parquet(out)
    dim = spark.createDataFrame(
        [("2024-01-02", 1), ("2024-01-03", 1), ("2024-01-05", 1)],
        "d string, flagged int",
    ).select(F.col("d").cast("date").alias("d"), "flagged")
    return (
        fact.join(F.broadcast(dim.filter(F.col("flagged") == 1)),
                  fact.day == dim.d)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# §2.Q.8 cohort LTV + basket analytics
# ---------------------------------------------------------------------------


@register(
    "customer_cohort_ltv",
    oracle="""
WITH seq AS (
  SELECT o_custkey, o_totalprice,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(date_trunc('month', min(o_orderdate) OVER (PARTITION BY o_custkey))
              AS TIMESTAMP) AS cohort
  FROM orders
)
SELECT cohort,
       datediff('month', cohort, month) AS month_index,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
         AS revenue
FROM seq
GROUP BY cohort, datediff('month', cohort, month)
""",
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, revenue tracked per months-since-acquisition — the orders-side
    twin of events_cohort_retention. One custkey-partitioned window
    (min first order), one (cohort, month_index) rollup; output is
    months² at any corpus size."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    seq = t.orders.select(
        "o_custkey",
        "o_totalprice",
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.date_trunc("month", F.min("o_orderdate").over(w)).alias("cohort"),
    )
    month_index = (
        F.months_between(F.col("month"), F.col("cohort")).cast("bigint")
    )
    return seq.groupBy("cohort", month_index.alias("month_index")).agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2)
        .cast("double")
        .alias("revenue"),
    )


@register(
    "orders_basket_size_histogram",
    oracle="""
WITH sizes AS (
  SELECT l_orderkey, count(*) AS basket_size FROM lineitem GROUP BY l_orderkey
)
SELECT basket_size, count(*) AS n_orders,
       round(CAST(count(*) AS DOUBLE)
             / (sum(count(*)) OVER ()), 6) AS share
FROM sizes GROUP BY basket_size
""",
)
def orders_basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: line count per order, rolled into a
    histogram with shares. Two chained partial-aggregable groupBys; the
    share window runs over the ≤ max-basket-size histogram rows."""
    t = Tables(spark, sf_dir)
    sizes = t.lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("basket_size")
    )
    hist = sizes.groupBy("basket_size").agg(F.count(F.lit(1)).alias("n_orders"))
    return hist.select(
        "basket_size",
        "n_orders",
        F.round(
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(Window.partitionBy()),
            6,
        ).alias("share"),
    )


@register(
    "brand_copurchase_lift",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM ob),
brand_n AS (SELECT p_brand, count(*) AS cb FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS c_ab
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
)
SELECT brand_a, brand_b, c_ab,
       round(CAST(c_ab AS DOUBLE) * n.n / (ca.cb * cb.cb), 6) AS lift
FROM pairs
JOIN brand_n ca ON brand_a = ca.p_brand
JOIN brand_n cb ON brand_b = cb.p_brand
CROSS JOIN n_orders n
WHERE c_ab >= 5
""",
)
def brand_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-purchase lift: P(a,b)/(P(a)·P(b)) over orders — the
    normalized version of market_basket_pairs that separates 'popular
    pair' from 'associated pair'. The self-join is keyed on orderkey
    (quadratic only within an order's ≤ brands-per-basket distinct
    brands); the brand marginals and order count are brands-sized /
    scalar broadcasts onto the pairs relation."""
    t = Tables(spark, sf_dir)
    ob = (
        t.lineitem.join(
            broadcast_if_small(t.part.select("p_partkey", "p_brand"), sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = ob.agg(F.count_distinct("l_orderkey").alias("n"))
    brand_n = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("cb"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    ca = brand_n.select(
        F.col("p_brand").alias("ba"), F.col("cb").alias("ca_n")
    )
    cb = brand_n.select(
        F.col("p_brand").alias("bb"), F.col("cb").alias("cb_n")
    )
    return (
        pairs.join(F.broadcast(ca), F.col("brand_a") == F.col("ba"))
        .join(F.broadcast(cb), F.col("brand_b") == F.col("bb"))
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            F.round(
                F.col("c_ab").cast("double") * F.col("n")
                / (F.col("ca_n") * F.col("cb_n")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# §2.Q.9 calendar gaps + survival
# ---------------------------------------------------------------------------


@register(
    "events_hour_gap_ranges",
    oracle="""
WITH span AS (
  SELECT event_type,
         min(date_trunc('hour', ts)) AS h0,
         max(date_trunc('hour', ts)) AS h1
  FROM events GROUP BY event_type
),
calendar AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM span
),
observed AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour FROM events
),
missing AS (
  SELECT c.event_type, c.hour,
         row_number() OVER (PARTITION BY c.event_type ORDER BY c.hour) AS rn
  FROM calendar c ANTI JOIN observed o
    ON c.event_type = o.event_type AND c.hour = o.hour
)
SELECT event_type,
       min(hour) AS gap_start, max(hour) AS gap_end,
       count(*) AS n_hours
FROM missing
GROUP BY event_type, hour - rn * INTERVAL 1 HOUR
""",
)
def events_hour_gap_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-gap detection: for each event type, the contiguous hour
    ranges inside its [first, last] span with NO events — the backfill
    work-list of an ingest pipeline. Aggregate-first: the dense hourly
    calendar is sequence()-exploded from the types-sized span relation
    (span-bounded, not event-bounded), missing hours are an anti join
    against the distinct observed hours, and ranges come from the
    gaps-and-islands rn-difference key. Everything past the two distinct
    reductions is calendar-sized."""
    t = Tables(spark, sf_dir)
    hour = F.date_trunc("hour", "ts")
    span = t.events.groupBy("event_type").agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    calendar = span.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    observed = t.events.select(
        "event_type", hour.alias("hour")
    ).distinct()
    missing = calendar.join(observed, ["event_type", "hour"], "left_anti")
    w = Window.partitionBy("event_type").orderBy("hour")
    keyed = missing.select(
        "event_type",
        "hour",
        (
            F.col("hour").cast("long") - F.row_number().over(w) * 3600
        ).alias("island"),
    )
    return keyed.groupBy("event_type", "island").agg(
        F.min("hour").alias("gap_start"),
        F.max("hour").alias("gap_end"),
        F.count(F.lit(1)).alias("n_hours"),
    ).select("event_type", "gap_start", "gap_end", "n_hours")


@register(
    "events_survival_weeks",
    oracle="""
WITH lifespans AS (
  SELECT user_id,
         datediff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) // 7
           AS weeks_active
  FROM events GROUP BY user_id
),
ks AS (
  SELECT unnest(generate_series(0, weeks_active)) AS week FROM lifespans
),
counts AS (SELECT week, count(*) AS n_surviving FROM ks GROUP BY week)
SELECT week, n_surviving,
       round(CAST(n_surviving AS DOUBLE)
             / max(n_surviving) OVER (), 6) AS survival_rate
FROM counts
""",
)
def events_survival_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-retention survival curve: the fraction of users whose
    observed activity span reaches ≥ k weeks, for every k. Per-user
    lifespans aggregate first (one shuffle on user_id); each user then
    explodes into weeks_active+1 rows — fan-out bounded by the
    observation window in weeks, not by event volume — and the share
    normalizes against the k=0 row (every user survives week 0) via a
    window over the weeks-sized histogram."""
    t = Tables(spark, sf_dir)
    lifespans = t.events.groupBy("user_id").agg(
        (
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            / 7
        )
        .cast("bigint")
        .alias("weeks_active")
    )
    ks = lifespans.select(
        F.explode(F.sequence(F.lit(0).cast("bigint"), "weeks_active")).alias(
            "week"
        )
    )
    counts = ks.groupBy("week").agg(F.count(F.lit(1)).alias("n_surviving"))
    return counts.select(
        "week",
        "n_surviving",
        F.round(
            F.col("n_surviving").cast("double")
            / F.max("n_surviving").over(Window.partitionBy()),
            6,
        ).alias("survival_rate"),
    )


# ---------------------------------------------------------------------------
# §2.Q.10 bigram conditional entropy + codec parity
# ---------------------------------------------------------------------------


@register(
    "text_bigram_cond_entropy",
    oracle="""
WITH big AS (
  SELECT source, t[i] AS prev, t[i + 1] AS nxt, count(*) AS c
  FROM (SELECT source, string_split(text, ' ') AS t FROM documents),
       unnest(generate_series(1, len(t) - 1)) g(i)
  GROUP BY source, t[i], t[i + 1]
),
marged AS (
  SELECT source, c, sum(c) OVER (PARTITION BY source, prev) AS cu
  FROM big
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       count(*) AS vocab_bigrams,
       round(-sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / cu))
             / sum(c), 6) AS cond_entropy
FROM marged GROUP BY source
""",
)
def text_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional entropy H(next|prev) per source — near-zero
    means deterministic continuations (templated/boilerplate text), high
    means diverse language; the sequence-aware sibling of
    corpus_source_entropy. Bigrams come from zip_with over the token
    array (map-side, no shuffle before aggregation); the only window is
    the (source, prev) marginal — partition sizes bounded by the
    per-prefix continuation vocabulary — because the normalizer N
    factors out: H = -(1/N)·Σ c·ln(c/cu), with N from the final groupBy
    itself (the text_kl_divergence_sources trick). Oracle computes the
    IDENTICAL decomposition."""
    t = Tables(spark, sf_dir)
    toks = F.split("text", " ")
    pair = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda x, y: F.struct(x.alias("prev"), y.alias("nxt")),
    )
    big = (
        t.documents.select("source", F.explode(pair).alias("p"))
        .select("source", F.col("p.prev").alias("prev"), F.col("p.nxt").alias("nxt"))
        .groupBy("source", "prev", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    marged = big.select(
        "source",
        "c",
        F.sum("c").over(Window.partitionBy("source", "prev")).alias("cu"),
    )
    c_d = F.col("c").cast("double")
    return marged.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).alias("vocab_bigrams"),
        F.round(
            -F.sum(c_d * F.log(c_d / F.col("cu"))) / F.sum("c"), 6
        ).alias("cond_entropy"),
    )


@register(
    "fn_string_codec",
    oracle="""
SELECT doc_id,
       to_base64(encode(substring(text, 1, 24))) AS b64_prefix,
       decode(from_base64(to_base64(encode(substring(text, 1, 24)))))
         = substring(text, 1, 24) AS b64_roundtrip_ok,
       lower(hex(lang)) AS lang_hex,
       decode(unhex(hex(lang))) = lang AS hex_roundtrip_ok
FROM documents
""",
)
def fn_string_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-codec scalar functions: base64/unbase64 and hex/unhex
    round-trips over document text (§2.H family completion — the codecs
    every wire-format ingest path needs). The 24-char prefix stays under
    every base64 line-wrap threshold so both engines emit the unchunked
    form; hex is case-normalized (Spark uppercases, DuckDB lowercases).
    Pure expression plan — no shuffle, no UDF."""
    t = Tables(spark, sf_dir)
    prefix = F.substring("text", 1, 24)
    return t.documents.select(
        "doc_id",
        F.base64(prefix.cast("binary")).alias("b64_prefix"),
        (
            F.unbase64(F.base64(prefix.cast("binary"))).cast("string") == prefix
        ).alias("b64_roundtrip_ok"),
        F.lower(F.hex("lang")).alias("lang_hex"),
        (F.unhex(F.hex("lang")).cast("string") == F.col("lang")).alias(
            "hex_roundtrip_ok"
        ),
    )
