"""Round-5 ninth wave (SURVEY.md §2.Q, continued): peak session
concurrency via a DISTRIBUTED prefix sum (the scale-shaped sweep-line),
robust MAD anomaly screening, duplicate-invoice detection against
injected duplicates, ship-latency quantiles per supplier nation, the
string-formatting parity family, and a deterministic A/B two-proportion
z-test.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables


def _pround(col, dp: int = 6):
    """Portable IEEE rounding floor(x*10^dp + 0.5)/10^dp — bit-identical
    on both engines (built-in round() diverges on exact decimal ties;
    see tpch_q2_min_cost_supplier)."""
    scale = 10**dp
    return F.floor(col * scale + 0.5) / scale


_SESSION_BOUNDS_SQL = """
seq AS (
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
intervals AS (
  SELECT user_id, session_id,
         epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
  FROM sess GROUP BY user_id, session_id
)
"""


@register(
    "events_peak_concurrency",
    oracle="""
WITH """
    + _SESSION_BOUNDS_SQL
    + """,
deltas AS (
  SELECT start_us AS t, 1 AS d FROM intervals
  UNION ALL
  SELECT end_us + 1 AS t, -1 AS d FROM intervals
),
bounds AS (
  SELECT t, CAST(sum(d) AS BIGINT) AS net FROM deltas GROUP BY t
),
running AS (
  SELECT t,
         CAST(sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS conc
  FROM bounds
),
peaks AS (
  SELECT date_trunc('day', make_timestamp(t)) AS day,
         max(conc) AS peak_concurrency,
         count(*) AS n_boundary_points
  FROM running GROUP BY 1
),
starts AS (
  SELECT date_trunc('day', make_timestamp(start_us)) AS day,
         count(*) AS sessions_started
  FROM intervals GROUP BY 1
)
SELECT p.day, coalesce(s.sessions_started, 0) AS sessions_started,
       p.peak_concurrency, p.n_boundary_points
FROM peaks p LEFT JOIN starts s ON p.day = s.day
""",
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line / interval-
    concurrency primitive (capacity planning, rate limiting). Sessions
    are 30-minute-gap sessionized (the events_sessionize_batch rule);
    each interval [start, end] emits +1 at start and -1 at end+1µs, and
    peak concurrency is the max of the boundary-point prefix sum.

    The prefix sum is DISTRIBUTED: a single global ordered window would
    serialize session-count boundary points through one partition at
    100 TB, so Spark computes it in two levels — a within-day running
    sum (partitioned window) plus each day's carried-in offset from a
    days-sized cumulative of per-day totals — the classic parallel
    scan decomposition. The oracle spells the same quantity as one
    global window; peaks are always attained at +1 boundary points, so
    the per-day max over boundary points is the true within-day peak.
    """
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
    # intervals feeds THREE branches (start deltas, end deltas, per-day
    # session starts): cache the sessions-sized relation so the two-window
    # sessionize chain over events runs once, not per branch
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.unix_micros(F.min("ts").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("end_us"),
    ).cache()
    deltas = intervals.select(
        F.col("start_us").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        intervals.select(
            (F.col("end_us") + 1).alias("t"), F.lit(-1).alias("d")
        )
    )
    bounds = deltas.groupBy("t").agg(F.sum("d").alias("net"))
    # UTC session tz: LTZ->NTZ cast renders the same wall clock DuckDB's
    # tz-less make_timestamp(µs) produces; date_trunc timestamps (not
    # DATE) cross the compare harness losslessly (events_dau_mau idiom)
    day = F.date_trunc(
        "day", F.timestamp_micros(F.col("t")).cast("timestamp_ntz")
    )
    # level 1: running sum within each day (parallel across days)
    w_day = Window.partitionBy("day").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    within = bounds.withColumn("day", day).withColumn(
        "within", F.sum("net").over(w_day)
    )
    # level 2: days-sized carried-in offsets (broadcast back to level 1)
    day_tot = within.groupBy("day").agg(F.sum("net").alias("day_net"))
    w_days = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = day_tot.select(
        "day", F.coalesce(F.sum("day_net").over(w_days), F.lit(0)).alias("off")
    )
    conc = within.join(F.broadcast(offsets), "day").withColumn(
        "conc", F.col("off") + F.col("within")
    )
    peaks = conc.groupBy("day").agg(
        F.max("conc").alias("peak_concurrency"),
        F.count(F.lit(1)).alias("n_boundary_points"),
    )
    starts = intervals.groupBy(
        F.date_trunc(
            "day",
            F.timestamp_micros(F.col("start_us")).cast("timestamp_ntz"),
        ).alias("day")
    ).agg(F.count(F.lit(1)).alias("sessions_started"))
    return peaks.join(F.broadcast(starts), "day", "left").select(
        "day",
        F.coalesce("sessions_started", F.lit(0)).alias("sessions_started"),
        "peak_concurrency",
        "n_boundary_points",
    )


@register(
    "events_anomaly_mad",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, median(n) AS med FROM daily GROUP BY 1
),
dev AS (
  SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS adev
  FROM daily d JOIN med m ON d.event_type = m.event_type
),
mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
)
SELECT d.event_type, d.day, d.n,
       floor(0.6745 * (d.n - d.med) / nullif(m.mad, 0) * 1000000 + 0.5)
         / 1000000 AS robust_z,
       CAST(CASE WHEN abs(0.6745 * (d.n - d.med) / nullif(m.mad, 0)) > 3.5
                 THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM dev d JOIN mad m ON d.event_type = m.event_type
""",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly screen on daily event volumes: the median-absolute-
    deviation z-score 0.6745·(x − median)/MAD with the |z| > 3.5 flag
    (Iglewicz-Hoaglin) — the outlier-resistant twin of
    events_anomaly_zscore, which a single traffic spike can mask by
    inflating the stddev it is judged against. Two types-sized median
    aggregates broadcast back onto the (type, day) grid; daily counts are
    integers and medians interpolate at exact binary halves, so the only
    rounding layer needed is the portable 6-dp formula on the ratio."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy("event_type").agg(F.expr("median(n)").alias("med"))
    # dev feeds BOTH the MAD aggregate and the final select: cache the
    # (types x days)-sized grid so events is scanned once, not per branch
    dev = (
        daily.join(F.broadcast(med), "event_type")
        .withColumn("adev", F.abs(F.col("n") - F.col("med")))
        .cache()
    )
    mad = dev.groupBy("event_type").agg(F.expr("median(adev)").alias("mad"))
    z = (
        F.lit(0.6745)
        * (F.col("n") - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            _pround(z).alias("robust_z"),
            F.when(F.abs(z) > 3.5, 1).otherwise(0).cast("int").alias(
                "is_anomaly"
            ),
        )
    )


@register(
    "orders_duplicate_invoice_detect",
    oracle="""
WITH feed AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         date_trunc('day', o_orderdate) AS order_day
  FROM orders
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, o_totalprice,
         date_trunc('day', o_orderdate)
  FROM orders WHERE o_orderkey % 53 = 0
)
SELECT o_custkey, order_day, o_totalprice AS amount,
       count(*) AS n_claims,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
FROM feed
GROUP BY o_custkey, order_day, o_totalprice
HAVING count(*) >= 2
""",
)
def orders_duplicate_invoice_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-invoice / double-ingestion screen: invoices agreeing on
    (customer, day, exact amount) under DIFFERENT keys — the signature of
    a replayed ingest batch or a double-submitted claim. Duplicates are
    deterministically injected (every 53rd orderkey re-enters with a
    shifted key, the quality_referential_integrity injection idiom) so
    the detector's recall is verifiable. One hash-aggregate on the
    composite key — amount is part of the grouping key, so identical
    doubles collide exactly; no float comparison tolerance is involved."""
    o = Tables(spark, sf_dir).orders
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_trunc("day", "o_orderdate").alias("order_day"),
    )
    injected = base.filter(F.col("o_orderkey") % 53 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1_000_000_000
    )
    return (
        base.unionAll(injected)
        .groupBy("o_custkey", "order_day", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_claims"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .filter(F.col("n_claims") >= 2)
        .select(
            "o_custkey",
            "order_day",
            F.col("o_totalprice").alias("amount"),
            "n_claims",
            "first_key",
            "last_key",
        )
    )


@register(
    "lineitem_ship_latency_by_nation",
    oracle="""
SELECT n_name,
       count(*) AS n,
       floor(CAST(sum(d) AS DOUBLE) / count(*) * 1000000 + 0.5)
         / 1000000 AS avg_days,
       CAST(quantile_cont(d, 0.5) AS DOUBLE) AS p50_days,
       CAST(quantile_cont(d, 0.9) AS DOUBLE) AS p90_days
FROM (
  SELECT n_name,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS d
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
)
GROUP BY n_name
""",
)
def lineitem_ship_latency_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency profile per supplier nation: count, mean,
    and p50/p90 of the day delta between order placement and line
    shipment — the fulfilment-SLA view. The only big-big shuffle is
    lineitem ⋈ orders on orderkey; supplier and nation broadcast. The
    mean is spelled as an explicit exact-integer sum / count double
    division (identical operation order in both engines) and day deltas
    are integers, so quantile interpolation lands on exact binary
    midpoints."""
    t = Tables(spark, sf_dir)
    d = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    joined = (
        t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(
            broadcast_if_small(t.supplier, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", d.alias("d"))
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        _pround(
            F.sum("d").cast("double") / F.count(F.lit(1))
        ).alias("avg_days"),
        F.expr(
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY d)"
        ).alias("p50_days"),
        F.expr(
            "percentile_cont(0.9) WITHIN GROUP (ORDER BY d)"
        ).alias("p90_days"),
    )


@register(
    "fn_string_format",
    oracle="""
SELECT p_partkey,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       rpad(p_brand, 12, '.') AS brand_padded,
       translate(p_name, 'aeiou', 'AEIOU') AS name_devoweled,
       repeat(substring(p_name, 1, 2), 3) AS name_stutter,
       reverse(p_name) AS name_reversed,
       printf('%s-%05d', p_brand, p_size) AS brand_size_code,
       concat_ws('|', p_brand, p_type, CAST(p_size AS VARCHAR)) AS packed
FROM part
""",
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting/padding family (§2.H completion): lpad/rpad,
    translate, repeat, reverse, printf-style format_string, and
    concat_ws — the fixed-width-key and display-formatting toolbox.
    Spark format_string and DuckDB printf share C printf semantics
    (verified for %s / %0Nd). Pure per-row expressions: zero shuffles,
    whole-stage codegen end to end."""
    p = Tables(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias(
            "key_padded"
        ),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_devoweled"),
        F.repeat(F.substring("p_name", 1, 2), 3).alias("name_stutter"),
        F.reverse("p_name").alias("name_reversed"),
        F.format_string("%s-%05d", "p_brand", "p_size").alias(
            "brand_size_code"
        ),
        F.concat_ws(
            "|", "p_brand", "p_type", F.col("p_size").cast("string")
        ).alias("packed"),
    )


@register(
    "events_ab_proportion_ztest",
    oracle="""
WITH users AS (
  SELECT user_id,
         CASE WHEN CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS grp,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > 13 THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
cells AS (
  SELECT CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN grp = 'A' THEN conv ELSE 0 END) AS BIGINT)
           AS conv_a,
         CAST(sum(CASE WHEN grp = 'B' THEN conv ELSE 0 END) AS BIGINT)
           AS conv_b
  FROM users
)
SELECT n_a, n_b, conv_a, conv_b,
       floor(CAST(conv_a AS DOUBLE) / n_a * 1000000 + 0.5) / 1000000
         AS rate_a,
       floor(CAST(conv_b AS DOUBLE) / n_b * 1000000 + 0.5) / 1000000
         AS rate_b,
       floor((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / nullif(sqrt(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)
                    * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 0)
             * 1000000 + 0.5) / 1000000 AS z_score
FROM cells
""",
)
def events_ab_proportion_ztest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-proportion z-test for a deterministic A/B split: users are
    hash-assigned (first md5 nibble parity — the portable-hash idiom, so
    assignment is reproducible and balanced) and the pooled-variance z
    statistic compares the two conversion rates — the experimentation
    primitive of a product analytics engine. The conversion predicate is
    the pluggable part; in this corpus EVERY user purchases at least
    once (150/150 at sf0.01 — "any purchase" degenerates to pooled
    p = 1 and a 0/0 z), so the demo predicate is "more than 13
    purchases", which splits the population. Per-user reduce, then four
    conditional sums to ONE row; the z formula is written with identical
    operation order in both engines (pure IEEE mul/div/sqrt are
    correctly rounded, hence bit-identical), nullif-guarded against a
    degenerate pooled rate, and portable-6dp-rounded."""
    e = Tables(spark, sf_dir).events
    grp = F.when(
        F.expr(
            "conv(substring(md5(cast(user_id as string)), 1, 1), 16, 10)"
        ).cast("bigint")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    users = e.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            > 13,
            1,
        )
        .otherwise(0)
        .alias("conv")
    ).select(grp.alias("grp"), "conv")
    cells = users.agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("grp") == "A", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("grp") == "B", F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ra - rb) / F.nullif(
        F.sqrt(pp * (1 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))),
        F.lit(0.0),
    )
    return cells.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        _pround(ra).alias("rate_a"),
        _pround(rb).alias("rate_b"),
        _pround(z).alias("z_score"),
    )
