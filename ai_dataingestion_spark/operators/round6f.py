"""Round-5 thirty-second wave (SURVEY.md §2.Q, continued): week-over-
week change contributions, the nation trade-flow matrix, NULL
ordering semantics, and the contiguous-prefix resume watermark.

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
    "events_wow_change_contributions",
    oracle="""
WITH cells AS (
  SELECT date_trunc('week', ts) AS m, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT m, event_type, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY m) AS prev_n
  FROM cells
),
deltas AS (
  SELECT m, event_type, n, n - prev_n AS delta
  FROM lagged WHERE prev_n IS NOT NULL
)
SELECT m, event_type,
       CAST(n AS BIGINT) AS n,
       CAST(delta AS BIGINT) AS delta,
       CAST(sum(delta) OVER (PARTITION BY m) AS BIGINT) AS total_delta,
       CASE WHEN sum(delta) OVER (PARTITION BY m) <> 0 THEN
         floor(CAST(delta AS DOUBLE)
               / CAST(sum(delta) OVER (PARTITION BY m) AS DOUBLE)
               * 1000000 + 0.5) / 1000000
       END AS contribution_share
FROM deltas
""",
)
def events_wow_change_contributions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Week-over-week change decomposition (the waterfall chart's
    data — the events corpus spans ONE month, so weeks are the
    non-degenerate period): per (week, type), the volume delta vs the
    prior week and its share of the week's TOTAL change — the "which segment moved
    the number" attribution every growth review starts with, exact
    because Δtotal ≡ ΣΔtype. Integer deltas; the only division is the
    guarded share. Windows over the weeks×types aggregate."""
    e = Tables(spark, sf_dir).events
    cells = e.groupBy(
        F.date_trunc("week", "ts").alias("m"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w_lag = Window.partitionBy("event_type").orderBy("m")
    deltas = (
        cells.withColumn("prev_n", F.lag("n").over(w_lag))
        .filter(F.col("prev_n").isNotNull())
        .withColumn("delta", F.col("n") - F.col("prev_n"))
    )
    w_m = Window.partitionBy("m")
    total = F.sum("delta").over(w_m)
    return deltas.select(
        "m",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("delta").cast("bigint").alias("delta"),
        total.cast("bigint").alias("total_delta"),
        F.when(
            total != 0,
            _pround(F.col("delta").cast("double") / total.cast("double")),
        ).alias("contribution_share"),
    )


@register(
    "trade_flow_nation_matrix",
    oracle="""
SELECT sn.n_name AS supplier_nation, cn.n_name AS customer_nation,
       count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(19, 2))), 2)
            AS DOUBLE) AS flow_value
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY sn.n_name, cn.n_name
""",
)
def trade_flow_nation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full supplier-nation × customer-nation trade-flow matrix —
    the generalization of TPC-H Q7's two-nation volume query to all
    n² flows at once, feeding gravity models and trade-balance
    reports. One big-big join (lineitem ⋈ orders on orderkey); every
    dimension — supplier, customer, and BOTH nation roles (aliased
    separately, the self-joined-dimension pattern) — broadcasts.
    Output bounded by nations² at any volume; DECIMAL flow sums."""
    t = Tables(spark, sf_dir)
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supplier_nation")
    )
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("customer_nation")
    )
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            broadcast_if_small(
                t.supplier.select("s_suppkey", "s_nationkey"), sf_dir, "supplier"
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            broadcast_if_small(
                t.customer.select("c_custkey", "c_nationkey"), sf_dir, "customer"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy("supplier_nation", "customer_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(19,2)")), 2
            )
            .cast("double")
            .alias("flow_value"),
        )
    )


@register(
    "sort_null_ordering",
    oracle="""
WITH injected AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
),
nf AS (
  SELECT c_custkey FROM injected
  ORDER BY bal ASC NULLS FIRST, c_custkey LIMIT 5
),
nl AS (
  SELECT c_custkey FROM injected
  ORDER BY bal ASC NULLS LAST, c_custkey LIMIT 5
)
SELECT 'nulls_first' AS ordering,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
       (SELECT CAST(sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM injected) AS n_nulls_total
FROM nf
UNION ALL
SELECT 'nulls_last', CAST(count(*) AS BIGINT), CAST(sum(c_custkey) AS BIGINT),
       (SELECT CAST(sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM injected)
FROM nl
""",
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL ordering semantics pinned (§2.F completion): the top-5 rows
    under explicit NULLS FIRST vs NULLS LAST over a null-injected sort
    key — the checksum differs exactly because nulls flood the head of
    one ordering and not the other. The DEFAULTS disagree across
    engines (Spark ascending sorts NULLS FIRST, DuckDB NULLS LAST), so
    portable sorts must always spell the null position explicitly —
    this operator is the executable reminder. Key tiebreak makes both
    cuts deterministic."""
    c = Tables(spark, sf_dir).customer
    injected = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 13 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    n_nulls = injected.agg(
        F.sum(F.when(F.col("bal").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nulls_total")
    )

    def top5(df: DataFrame, first: bool, label: str) -> DataFrame:
        key = (
            F.col("bal").asc_nulls_first()
            if first
            else F.col("bal").asc_nulls_last()
        )
        sel = df.orderBy(key, F.col("c_custkey").asc()).limit(5)
        return sel.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("c_custkey").cast("bigint").alias("key_sum"),
        ).select(F.lit(label).alias("ordering"), "n_rows", "key_sum")

    return (
        top5(injected, True, "nulls_first")
        .unionByName(top5(injected, False, "nulls_last"))
        .crossJoin(F.broadcast(n_nulls))
    )


@register(
    "pipeline_resume_watermark",
    oracle="""
WITH applied AS (
  -- batch ledger with an injected failure: every batch id whose
  -- residue is 3 mod 7 never landed
  SELECT DISTINCT o_orderkey % 500 AS batch_id FROM orders
  WHERE (o_orderkey % 500) % 7 <> 3
),
bounds AS (
  SELECT max(batch_id) AS max_applied, count(*) AS n_applied FROM applied
),
first_gap AS (
  SELECT min(batch_id + 1) AS gap_start
  FROM applied a
  WHERE NOT EXISTS (SELECT 1 FROM applied b WHERE b.batch_id = a.batch_id + 1)
)
SELECT n_applied,
       CAST(max_applied AS BIGINT) AS max_applied,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM applied WHERE batch_id = 0)
                 THEN coalesce((SELECT gap_start - 1 FROM first_gap),
                               max_applied)
                 ELSE -1 END AS BIGINT) AS resume_watermark,
       CAST(max_applied - CASE WHEN EXISTS
              (SELECT 1 FROM applied WHERE batch_id = 0)
              THEN coalesce((SELECT gap_start - 1 FROM first_gap),
                            max_applied)
              ELSE -1 END AS BIGINT) AS batches_beyond_watermark
FROM bounds
""",
)
def pipeline_resume_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-prefix resume watermark: from a batch ledger with
    gaps (injected: every id ≡ 3 mod 7 failed to land), compute the
    HIGH watermark — the largest n such that batches 0..n ALL applied —
    which is where a safe reprocessing resumes; max_applied alone
    over-promises because completed batches beyond the first gap still
    need their predecessors replayed (the Kafka/offset-commit
    distinction between max seen and max contiguous). First gap found
    via the successor anti-join over the DISTINCT batch relation —
    bounded by batch count, no ordered window at all."""
    o = Tables(spark, sf_dir).orders
    applied = (
        o.select((F.col("o_orderkey") % 500).alias("batch_id"))
        .filter((F.col("batch_id") % 7) != 3)
        .distinct()
        .cache()  # feeds bounds, successor anti-join, and the zero probe
    )
    succ = applied.select((F.col("batch_id") + 1).alias("batch_id"))
    first_gap = (
        applied.select((F.col("batch_id") + 1).alias("cand"))
        .join(
            applied.select(F.col("batch_id").alias("cand")),
            "cand",
            "left_anti",
        )
        .agg(F.min("cand").alias("gap_start"))
    )
    bounds = applied.agg(
        F.max("batch_id").alias("max_applied"),
        F.count(F.lit(1)).alias("n_applied"),
    )
    has_zero = applied.filter(F.col("batch_id") == 0).agg(
        F.count(F.lit(1)).alias("z")
    )
    j = (
        bounds.crossJoin(F.broadcast(first_gap))
        .crossJoin(F.broadcast(has_zero))
    )
    watermark = F.when(
        F.col("z") > 0,
        F.coalesce(F.col("gap_start") - 1, F.col("max_applied")),
    ).otherwise(F.lit(-1))
    return j.select(
        "n_applied",
        F.col("max_applied").cast("bigint").alias("max_applied"),
        watermark.cast("bigint").alias("resume_watermark"),
        (F.col("max_applied") - watermark)
        .cast("bigint")
        .alias("batches_beyond_watermark"),
    )
