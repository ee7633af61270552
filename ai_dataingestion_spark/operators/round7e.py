"""Round-6 fifty-seventh wave (SURVEY.md §2.R): decision-science and
data-contract operators — Beta-Binomial Bayesian A/B posteriors,
Jaccard link prediction on the co-purchase graph, and a one-pass
declarative expectation suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables, register_views

_BAYES_SQL = """
WITH arms AS (
  SELECT user_id % 2 AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id),
post AS (
  SELECT arm, count(*) AS n, sum(conv) AS conv,
         (1.0 + sum(conv)) / (2.0 + count(*)) AS pmean,
         ((1.0 + sum(conv)) * (1.0 + count(*) - sum(conv)))
           / ((2.0 + count(*)) * (2.0 + count(*)) * (3.0 + count(*)))
           AS pvar
  FROM arms GROUP BY arm),
pair AS (
  SELECT a.pmean AS ma, a.pvar AS va, b.pmean AS mb, b.pvar AS vb,
         a.n AS n_a, a.conv AS c_a, b.n AS n_b, b.conv AS c_b
  FROM post a, post b WHERE a.arm = 0 AND b.arm = 1)
SELECT n_a, CAST(c_a AS BIGINT) AS conv_a, n_b, CAST(c_b AS BIGINT) AS conv_b,
       CAST(round(ma, 6) AS DOUBLE) AS post_mean_a,
       CAST(round(mb, 6) AS DOUBLE) AS post_mean_b,
       CAST(round(1.0 / (1.0 + exp(-1.702 *
            round((mb - ma) / sqrt(va + vb), 6))), 4) AS DOUBLE)
         AS prob_b_beats_a
FROM pair
"""


@register("events_bayesian_ab_posterior", oracle=_BAYES_SQL)
def events_bayesian_ab_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B conversion analysis with Beta(1,1)-Binomial
    posteriors: per-arm (user_id parity) purchase conversion yields
    posterior means/variances in closed form, and P(B beats A) via the
    moment-matched normal approximation with the logistic sigmoid proxy
    for Phi (|Phi(z) - sigma(1.702 z)| < 0.0095 uniformly — Bowling 2009,
    "A logistic approximation to the cumulative normal distribution";
    chosen because neither engine ships erf, and the proxy is identical
    portable arithmetic on both). This is the decision-facing complement
    to the frequentist battery (events_ab_proportion_ztest, CUPED, SRM):
    a probability statement, not a p-value. One user-grain shuffle + a
    2-row reduce; the z input is rounded to 6 dp before the sigmoid so
    both engines saturate identically. Both engines run the identical
    statement."""
    register_views(spark, sf_dir)
    return spark.sql(_BAYES_SQL)


_LINKPRED_SQL = """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM basket a JOIN basket b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey),
und AS (SELECT pa AS p, pb AS q FROM edges UNION ALL SELECT pb, pa FROM edges),
deg AS (SELECT p, count(*) AS d FROM und GROUP BY p),
cand AS (
  SELECT u1.p AS a, u2.q AS b, count(*) AS common
  FROM und u1 JOIN und u2 ON u1.q = u2.p
  WHERE u1.p < u2.q
  GROUP BY u1.p, u2.q),
noedge AS (
  SELECT c.a, c.b, c.common FROM cand c
  LEFT JOIN edges e ON e.pa = c.a AND e.pb = c.b
  WHERE e.pa IS NULL),
scored AS (
  SELECT n.a, n.b, n.common,
         CAST(round(n.common * 1.0 / (da.d + db.d - n.common), 6) AS DOUBLE)
           AS jaccard
  FROM noedge n JOIN deg da ON da.p = n.a JOIN deg db ON db.p = n.b)
SELECT a, b, CAST(common AS BIGINT) AS common, jaccard
FROM scored ORDER BY jaccard DESC, a, b LIMIT 15
"""


@register("graph_link_prediction_jaccard", oracle=_LINKPRED_SQL)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph (Liben-Nowell & Kleinberg
    2003 neighborhood methods): candidate pairs are exactly the 2-hop
    walks (one self-join of the undirected edge list on the shared
    middle node — never all-pairs), scored by neighborhood Jaccard
    |N(a) int N(b)| / |N(a) un N(b)| with the union expanded as
    deg(a)+deg(b)-common so no neighbor-set materialization is needed,
    existing edges anti-joined out, top-15 with full tie-breaks. This is
    the "customers who bought X also bought Y" recommender primitive;
    candidate fan-out is bounded by sum(deg^2) — the hub-skew profile
    graph_degree_distribution measures is the capacity check for this
    very join. Both engines run the identical statement."""
    register_views(spark, sf_dir)
    return spark.sql(_LINKPRED_SQL)


@register(
    "quality_expectation_suite",
    oracle="""
WITH m AS (
  SELECT count(*) AS n_rows,
         count(DISTINCT o_orderkey) AS n_keys,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_null_cust,
         sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END)
           AS n_bad_status,
         sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS n_bad_price,
         CAST(CAST(max(o_orderdate) AS DATE) <= DATE '2026-01-01' AS INTEGER)
           AS fresh_ok
  FROM orders)
SELECT 'row_count_positive' AS expectation,
       CAST(n_rows AS VARCHAR) AS observed, n_rows > 0 AS passed FROM m
UNION ALL
SELECT 'pk_unique', CAST(n_rows - n_keys AS VARCHAR), n_rows = n_keys FROM m
UNION ALL
SELECT 'custkey_not_null', CAST(n_null_cust AS VARCHAR), n_null_cust = 0
FROM m
UNION ALL
SELECT 'status_in_domain', CAST(n_bad_status AS VARCHAR), n_bad_status = 0
FROM m
UNION ALL
SELECT 'price_positive', CAST(n_bad_price AS VARCHAR), n_bad_price = 0 FROM m
UNION ALL
SELECT 'orderdate_not_future', CAST(fresh_ok AS VARCHAR), fresh_ok = 1 FROM m
""",
)
def quality_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A declarative data-contract suite (the Great-Expectations shape)
    evaluated in ONE scan: six expectations — row count, PK uniqueness,
    null rate, value domain, range rule, freshness bound — computed as a
    single multi-aggregate pass over orders, then unpivoted to one
    (expectation, observed, passed) row each. The complement to
    quality_constraints (which emits per-violation ROWS for quarantine):
    this is the green/red contract REPORT a pipeline gate reads, costing
    one partial-aggregable pass regardless of how many expectations are
    declared. Oracle: the same metrics CTE in DuckDB."""
    t = Tables(spark, sf_dir)
    m = t.orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "n_null_cust"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("n_bad_status"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_bad_price"
        ),
        (F.max(F.col("o_orderdate").cast("date")) <= F.lit("2026-01-01").cast("date"))
        .cast("int")
        .alias("fresh_ok"),
    )
    return m.selectExpr(
        "stack(6, "
        "'row_count_positive', CAST(n_rows AS STRING), n_rows > 0, "
        "'pk_unique', CAST(n_rows - n_keys AS STRING), n_rows = n_keys, "
        "'custkey_not_null', CAST(n_null_cust AS STRING), n_null_cust = 0, "
        "'status_in_domain', CAST(n_bad_status AS STRING), n_bad_status = 0, "
        "'price_positive', CAST(n_bad_price AS STRING), n_bad_price = 0, "
        "'orderdate_not_future', CAST(fresh_ok AS STRING), fresh_ok = 1) "
        "AS (expectation, observed, passed)"
    )
