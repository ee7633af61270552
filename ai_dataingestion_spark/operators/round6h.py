"""Round-5 thirty-fourth wave (SURVEY.md §2.Q, continued): sweep-line
open-order backlog, weighted PageRank over the nation trade graph,
categorical mix-shift drift, and contingency-cell residuals.

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
    "orders_open_backlog_sweepline",
    oracle="""
WITH comp AS (
  SELECT l_orderkey AS ok, date_trunc('month', max(l_shipdate)) AS done_m
  FROM lineitem GROUP BY l_orderkey
),
od AS (
  SELECT date_trunc('month', o_orderdate) AS start_m, done_m,
         CAST(o_totalprice AS DECIMAL(20,2)) AS v
  FROM orders JOIN comp ON o_orderkey = ok
),
deltas AS (
  SELECT start_m AS m, 1 AS d, v FROM od
  UNION ALL
  SELECT done_m AS m, -1 AS d, -v AS v FROM od
),
agg AS (SELECT m, sum(d) AS dn, sum(v) AS dv FROM deltas GROUP BY m)
SELECT CAST(m AS TIMESTAMP) AS month,
       CAST(sum(dn) OVER w AS BIGINT) AS open_orders,
       CAST(round(sum(dv) OVER w, 2) AS DOUBLE) AS open_value
FROM agg
WINDOW w AS (ORDER BY m ROWS UNBOUNDED PRECEDING)
""",
)
def orders_open_backlog_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-month open-order backlog (count + value) via the
    SWEEP-LINE trick: each order emits a +1 delta in its order month
    and a -1 delta in its completion month (last shipment), and the
    running sum over the months-sized delta relation IS the backlog.
    The naive form — join every order against every month it spans —
    is an interval×calendar blow-up that grows with span length; the
    sweep-line shuffles exactly 2 rows per order regardless of how
    long orders stay open, then runs both cumulative windows over the
    ~80-row month relation. Backlog value accumulates in DECIMAL so
    the +v/-v pairs cancel exactly."""
    t = Tables(spark, sf_dir)
    comp = t.lineitem.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.date_trunc("month", F.max("l_shipdate")).alias("done_m")
    )
    price = F.col("o_totalprice").cast("decimal(20,2)")
    od = t.orders.join(comp, F.col("o_orderkey") == F.col("ok")).select(
        F.date_trunc("month", "o_orderdate").alias("start_m"),
        "done_m",
        price.alias("v"),
    )
    deltas = od.select(
        F.col("start_m").alias("m"), F.lit(1).alias("d"), F.col("v")
    ).unionAll(
        od.select(
            F.col("done_m").alias("m"),
            F.lit(-1).alias("d"),
            (-F.col("v")).alias("v"),
        )
    )
    agg = deltas.groupBy("m").agg(
        F.sum("d").alias("dn"), F.sum("v").alias("dv")
    )
    w = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return agg.select(
        F.col("m").cast("timestamp_ntz").alias("month"),
        F.sum("dn").over(w).cast("bigint").alias("open_orders"),
        F.round(F.sum("dv").over(w), 2).cast("double").alias("open_value"),
    )


_PR_DAMP = 0.85
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Chained-CTE DuckDB PageRank: r_{k+1} = (1-d)/N + d·Σ_in p·r_k,
    unrolled for the fixed iteration count."""
    head = """
WITH edges AS (
  SELECT s_nationkey AS src, c_nationkey AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
norm AS (
  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM edges
),
nodes AS (
  SELECT DISTINCT src AS nk FROM edges
  UNION
  SELECT DISTINCT dst FROM edges
),
nn AS (SELECT nk, CAST(count(*) OVER () AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT nk, 1.0 / n AS r, n FROM nn)"""
    steps = []
    for k in range(1, _PR_ITERS + 1):
        steps.append(
            f""",
r{k} AS (
  SELECT nn.nk, {1 - _PR_DAMP} / nn.n
           + {_PR_DAMP} * coalesce(sum(norm.p * prev.r), 0) AS r, nn.n
  FROM nn
  LEFT JOIN norm ON norm.dst = nn.nk
  LEFT JOIN r{k - 1} prev ON prev.nk = norm.src
  GROUP BY nn.nk, nn.n
)"""
        )
    tail = f"""
SELECT n_name AS nation,
       floor(r{_PR_ITERS}.r * 1000000 + 0.5) / 1000000 AS pagerank
FROM r{_PR_ITERS} JOIN nation ON n_nationkey = nk
"""
    return head + "".join(steps) + tail


@register("graph_pagerank_trade", oracle=_pagerank_oracle())
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 fixed iterations) over the
    supplier-nation → customer-nation trade graph: which nations sit at
    the center of the trade network, counting indirect inflows — the
    iterative-centrality family (vs trade_flow_nation_matrix's raw
    matrix). The scale shape: the expensive part — aggregating ~10⁹
    lineitems down to the ≤ nations² edge list — happens ONCE, before
    any iteration; each iteration is then a join over the tiny
    normalized edge relation, so iteration cost is independent of
    corpus size (the same aggregate-then-iterate shape as
    dedup_cluster_components and embed_kmeans_iterations). Rank mass
    from nations with no out-edges is dropped identically on both
    sides (simplified PageRank); 6-dp portable rounding caps the
    ≤ nations-term float-sum divergence."""
    t = Tables(spark, sf_dir)
    edges = (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
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
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    # Edge list is ≤ nations² rows from here on: cache-free reuse is fine,
    # every downstream relation is dimension-sized.
    norm = edges.select(
        "src",
        "dst",
        (F.col("w") / F.sum("w").over(Window.partitionBy("src"))).alias("p"),
    )
    nodes = (
        edges.select(F.col("src").alias("nk"))
        .union(edges.select(F.col("dst").alias("nk")))
        .distinct()
    )
    nn = nodes.select(
        "nk",
        F.count(F.lit(1)).over(Window.partitionBy()).cast("double").alias("n"),
    )
    ranks = nn.select("nk", (F.lit(1.0) / F.col("n")).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            norm.join(
                ranks.select(F.col("nk").alias("src_nk"), "r"),
                F.col("src") == F.col("src_nk"),
            )
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("r")).alias("cin"))
        )
        ranks = nn.join(
            contrib, nn["nk"] == contrib["dst"], "left"
        ).select(
            "nk",
            (
                F.lit(1 - _PR_DAMP) / F.col("n")
                + F.lit(_PR_DAMP) * F.coalesce(F.col("cin"), F.lit(0.0))
            ).alias("r"),
        )
    return ranks.join(
        F.broadcast(t.nation),
        F.col("nk") == F.col("n_nationkey"),
    ).select(
        F.col("n_name").alias("nation"), _pround(F.col("r")).alias("pagerank")
    )


@register(
    "orders_priority_mix_shift",
    oracle="""
WITH cnt AS (
  SELECT date_trunc('month', o_orderdate) AS m, o_orderpriority AS p,
         count(*) AS c
  FROM orders GROUP BY 1, 2
),
grid AS (
  SELECT months.m, prios.p, coalesce(cnt.c, 0) AS c
  FROM (SELECT DISTINCT m FROM cnt) months
  CROSS JOIN (SELECT DISTINCT p FROM cnt) prios
  LEFT JOIN cnt ON cnt.m = months.m AND cnt.p = prios.p
),
sh AS (
  SELECT m, p,
         CAST(c AS DOUBLE)
           / CAST(sum(c) OVER (PARTITION BY m) AS DOUBLE) AS s
  FROM grid
),
d AS (
  SELECT m, p, s - lag(s) OVER (PARTITION BY p ORDER BY m) AS ds FROM sh
)
SELECT CAST(m AS TIMESTAMP) AS month,
       round(0.5 * sum(abs(ds)), 6) AS tvd,
       round(max(abs(ds)), 6) AS max_abs_shift,
       CAST(sum(CASE WHEN ds > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up
FROM d WHERE ds IS NOT NULL
GROUP BY m
""",
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month categorical drift of the order-priority MIX:
    total-variation distance 0.5·Σ|Δshare| between consecutive months,
    the max single-priority shift, and how many priorities moved up —
    the categorical sibling of quality_psi_drift's numeric PSI. Shares
    must be compared on a DENSE month×priority grid (a priority absent
    one month is a 0-share cell, not a missing row), built as
    months × priorities (both aggregate-sized) left-joined with counts;
    lag/TVD windows then run over the grid, never the raw orders.
    Shares stay unrounded doubles through the diff (c/total division is
    IEEE-exact on both engines); only the final statistics round."""
    t = Tables(spark, sf_dir)
    cnt = t.orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.col("o_orderpriority").alias("p"),
    ).agg(F.count(F.lit(1)).alias("c"))
    months = cnt.select("m").distinct()
    prios = cnt.select("p").distinct()
    grid = (
        months.crossJoin(F.broadcast(prios))
        .join(cnt, ["m", "p"], "left")
        .select("m", "p", F.coalesce("c", F.lit(0)).alias("c"))
    )
    sh = grid.select(
        "m",
        "p",
        (
            F.col("c").cast("double")
            / F.sum("c").over(Window.partitionBy("m")).cast("double")
        ).alias("s"),
    )
    d = sh.select(
        "m",
        "p",
        (
            F.col("s")
            - F.lag("s").over(Window.partitionBy("p").orderBy("m"))
        ).alias("ds"),
    ).where(F.col("ds").isNotNull())
    return d.groupBy(F.col("m").cast("timestamp_ntz").alias("month")).agg(
        F.round(0.5 * F.sum(F.abs("ds")), 6).alias("tvd"),
        F.round(F.max(F.abs("ds")), 6).alias("max_abs_shift"),
        F.sum(F.when(F.col("ds") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
    )


@register(
    "quality_contingency_residuals",
    oracle="""
WITH obs AS (
  SELECT o_orderstatus AS st, o_orderpriority AS pr,
         CAST(count(*) AS DOUBLE) AS o
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT st, pr, o,
         sum(o) OVER (PARTITION BY st) AS rt,
         sum(o) OVER (PARTITION BY pr) AS ct,
         sum(o) OVER () AS n
  FROM obs
)
SELECT st AS orderstatus, pr AS orderpriority,
       CAST(o AS BIGINT) AS observed,
       round(rt * ct / n, 6) AS expected,
       round((o - rt * ct / n) / sqrt(rt * ct / n), 6) AS std_residual
FROM m
""",
)
def quality_contingency_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell standardized Pearson residuals (O−E)/√E of the
    status × priority contingency table — the drill-down companion to
    agg_chi_square_independence's single statistic: WHICH cells are
    over/under-represented, not just whether independence fails.
    |residual| > 2 flags a cell. All margins are window sums over the
    statuses×priorities-sized aggregate (counts are integers, so the
    double margin sums are exact in any order); cells with zero
    observed count are omitted identically on both sides."""
    t = Tables(spark, sf_dir)
    obs = t.orders.groupBy(
        F.col("o_orderstatus").alias("st"),
        F.col("o_orderpriority").alias("pr"),
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    m = obs.select(
        "st",
        "pr",
        "o",
        F.sum("o").over(Window.partitionBy("st")).alias("rt"),
        F.sum("o").over(Window.partitionBy("pr")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("rt") * F.col("ct") / F.col("n")
    return m.select(
        F.col("st").alias("orderstatus"),
        F.col("pr").alias("orderpriority"),
        F.col("o").cast("bigint").alias("observed"),
        F.round(e, 6).alias("expected"),
        F.round((F.col("o") - e) / F.sqrt(e), 6).alias("std_residual"),
    )
