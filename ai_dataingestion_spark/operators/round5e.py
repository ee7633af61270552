"""Round-5 fifth wave (SURVEY.md §2.Q, continued): TPC-H Q20 — which
completes all 22 TPC-H query shapes, adapted to this corpus — a
catalog-level table-profiling operator, event-type active-day Jaccard
similarity, and the PCA flagship: dominant principal component of the
embedding corpus via a partial-Gram Arrow kernel + five unrolled power
iterations on the 64×64 covariance.

Deferred to the r6 driver window like round5b/c/d (catalog
._DEFER_TO_NEXT_ROUND); locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables


@register(
    "tpch_q20_excess_share_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%bolt%'
  GROUP BY l_partkey, l_suppkey
),
shared AS (
  SELECT l_partkey, l_suppkey, supp_qty,
         sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
  FROM shipped
),
dominant AS (
  SELECT DISTINCT l_suppkey FROM shared
  WHERE supp_qty >= 0.15 * part_qty
)
SELECT s_name, n_name AS nation
FROM dominant
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
""",
)
def tpch_q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (suppliers with excess stock), adapted: no partsupp
    availability exists, so 'excess' becomes an OUTSIZED SHARE — suppliers who shipped >= 15%
    of some bolt-part's total volume (~1.5x the fair share under this
    corpus's ~10 suppliers/part; 0.5 yields zero rows at every SF on the
    uniform synthetic volumes, making the check vacuous). The
    reference's nested IN-subquery chain (part slice → per-(part,supp)
    quantity → availability threshold → supplier filter) keeps its exact
    shape: one (part, supp) aggregation, a per-part window total
    replacing the correlated sum subquery, a distinct semi-reduction,
    and broadcast supplier/nation name resolution. This closes the set:
    all 22 TPC-H query shapes now have an adapted, oracle-verified
    implementation (q1≈agg_groupby's plan family; q2-q22 explicit)."""
    t = Tables(spark, sf_dir)
    shipped = (
        t.lineitem.join(
            F.broadcast(
                t.part.filter(F.col("p_name").like("%bolt%")).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    shared = shipped.withColumn(
        "part_qty", F.sum("supp_qty").over(Window.partitionBy("l_partkey"))
    )
    dominant = (
        shared.filter(F.col("supp_qty") >= 0.15 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(
            broadcast_if_small(
                t.supplier.select("s_suppkey", "s_name", "s_nationkey"),
                sf_dir,
                "supplier",
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t.nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", F.col("n_name").alias("nation"))
    )


@register(
    "catalog_table_stats",
    oracle="""
SELECT 'customer' AS table_name, count(*) AS n_rows,
       count(DISTINCT c_custkey) AS n_distinct_keys FROM customer
UNION ALL
SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
UNION ALL
SELECT 'lineitem', count(*),
       count(DISTINCT l_orderkey * 8 + l_linenumber) FROM lineitem
UNION ALL
SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
UNION ALL
SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier
UNION ALL
SELECT 'events', count(*), count(DISTINCT event_id) FROM events
UNION ALL
SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents
UNION ALL
SELECT 'embeddings', count(*), count(DISTINCT vec_id) FROM embeddings
""",
)
def catalog_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-level profiling: row count + primary-key distinct count
    for every non-dim table — the table of numbers an ingest pipeline
    publishes after each load (key uniqueness == rows ⇔ no duplicate
    ingestion). Eight independent single-table aggregates unioned; each
    is one partial-aggregable pass, so the whole profile costs one scan
    per table and ships eight rows."""
    t = Tables(spark, sf_dir)
    li_key = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    parts = [
        ("customer", t.customer, F.col("c_custkey")),
        ("orders", t.orders, F.col("o_orderkey")),
        ("lineitem", t.lineitem, li_key),
        ("part", t.part, F.col("p_partkey")),
        ("supplier", t.supplier, F.col("s_suppkey")),
        ("events", t.events, F.col("event_id")),
        ("documents", t.documents, F.col("doc_id")),
        ("embeddings", t.embeddings, F.col("vec_id")),
    ]
    out = None
    for name, df, key in parts:
        stats = df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(key).alias("n_distinct_keys"),
        ).select("table_name", "n_rows", "n_distinct_keys")
        out = stats if out is None else out.unionByName(stats)
    return out


@register(
    "events_type_day_jaccard",
    oracle="""
WITH td AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events
),
sizes AS (SELECT event_type, count(*) AS n_days FROM td GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_both
  FROM td a JOIN td b ON a.day = b.day AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT type_a, type_b, n_both,
       round(CAST(n_both AS DOUBLE)
             / (sa.n_days + sb.n_days - n_both), 6) AS jaccard
FROM inter
JOIN sizes sa ON type_a = sa.event_type
JOIN sizes sb ON type_b = sb.event_type
""",
)
def events_type_day_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-day Jaccard similarity between event types — the set-
    similarity twin of events_type_cooccurrence, measuring whether two
    event types live on the same calendar (deploy markers vs errors,
    campaigns vs purchases). Distinct-reduce FIRST: the join operates on
    the (type, day) relation, ≤ |types|·|days| rows at any event volume,
    and the type-marginal sizes broadcast onto the pairs."""
    t = Tables(spark, sf_dir)
    td = t.events.select(
        "event_type", F.col("ts").cast("date").alias("day")
    ).distinct()
    sizes = td.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    a = td.alias("a")
    b = td.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("ta"), F.col("n_days").alias("na"))
    sb = sizes.select(F.col("event_type").alias("tb"), F.col("n_days").alias("nb"))
    return (
        inter.join(F.broadcast(sa), F.col("type_a") == F.col("ta"))
        .join(F.broadcast(sb), F.col("type_b") == F.col("tb"))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


_GRAM_SCHEMA = "i int, j int, s double"


def _partial_gram_kernel(it):
    """Per-Arrow-batch partial sufficient statistics for PCA: the upper
    triangle of Σ x·xᵀ as (i, j, s) rows, per-dimension sums as
    (i, -1, Σx_i), and the row count as (-1, -1, n). Each vector crosses
    into Python exactly once and each batch ships ≤ 64·65/2 + 65 rows
    regardless of batch size — the partial-aggregable Gram shape that
    tree-reduces on a cluster."""
    import numpy as np
    import pandas as pd

    for pdf in it:
        if len(pdf) == 0:
            continue
        X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        d = X.shape[1]
        G = X.T @ X
        iu, ju = np.triu_indices(d)
        sums = X.sum(axis=0)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(d), [-1]]).astype("int32"),
                "j": np.concatenate([ju, np.full(d, -1), [-1]]).astype("int32"),
                "s": np.concatenate([G[iu, ju], sums, [float(len(pdf))]]),
            }
        )


@register(
    "embed_pca_top_component",
    oracle="""
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
mu AS (SELECT i, avg(x) AS m FROM ex GROUP BY i),
cov AS (
  SELECT a.i AS i, b.i AS j,
         avg(a.x * b.x) - ma.m * mb.m AS c
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id
  JOIN mu ma ON a.i = ma.i
  JOIN mu mb ON b.i = mb.i
  GROUP BY a.i, b.i, ma.m, mb.m
),
v0 AS (SELECT i, 0.125 AS v FROM mu),
w1 AS (SELECT c.i, sum(c.c * v0.v) AS w FROM cov c JOIN v0 ON c.j = v0.i GROUP BY c.i),
v1 AS (SELECT i, w / sqrt(sum(w * w) OVER ()) AS v FROM w1),
w2 AS (SELECT c.i, sum(c.c * v1.v) AS w FROM cov c JOIN v1 ON c.j = v1.i GROUP BY c.i),
v2 AS (SELECT i, w / sqrt(sum(w * w) OVER ()) AS v FROM w2),
w3 AS (SELECT c.i, sum(c.c * v2.v) AS w FROM cov c JOIN v2 ON c.j = v2.i GROUP BY c.i),
v3 AS (SELECT i, w / sqrt(sum(w * w) OVER ()) AS v FROM w3),
w4 AS (SELECT c.i, sum(c.c * v3.v) AS w FROM cov c JOIN v3 ON c.j = v3.i GROUP BY c.i),
v4 AS (SELECT i, w / sqrt(sum(w * w) OVER ()) AS v FROM w4),
w5 AS (SELECT c.i, sum(c.c * v4.v) AS w FROM cov c JOIN v4 ON c.j = v4.i GROUP BY c.i)
SELECT i AS dim,
       round(w / sqrt(sum(w * w) OVER ()), 6) AS loading,
       round(sqrt(sum(w * w) OVER ()), 6) AS eigenvalue
FROM w5
""",
)
def embed_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding corpus: covariance
    via sufficient statistics, then five unrolled power iterations from
    the uniform start vector (1/8 per dim, ‖v₀‖=1 for d=64).

    Scale shape: the ONLY pass over the corpus is an Arrow mapInPandas
    kernel emitting per-batch partial Gram statistics (≤ 2145 rows per
    batch, independent of batch size) that a single groupBy(i, j)
    tree-reduces — never the 4096·n explode-self-join the SQL oracle
    spells (that is the semantic spec, quadratic in d·n and fine at
    oracle scale only). The reduced statistics are d²-bounded (2,145
    doubles regardless of corpus size — the same bounded-collect class
    as sim_ann_ivf's 16 centroids), so the 64×64 eigen-iteration runs
    driver-side in numpy: a first cut that expressed the five
    iterations as chained DataFrame joins paid ~50 tiny-stage
    schedulings (28 s at sf0.01 vs 1.5 s this way) to move 4-KB
    relations around. Power iteration from a positive start converges
    to the dominant eigenvector with deterministic sign; 6-dp rounding
    absorbs the engines' summation-order noise."""
    import numpy as np

    t = Tables(spark, sf_dir)
    partial = t.embeddings.select("embedding").mapInPandas(
        _partial_gram_kernel, schema=_GRAM_SCHEMA
    )
    stats = partial.groupBy("i", "j").agg(F.sum("s").alias("s"))
    rows = stats.collect()  # d*(d+1)/2 + d + 1 rows — dimension-bounded
    schema = "dim int, loading double, eigenvalue double"
    if not rows:  # empty corpus: no statistics, no component
        return spark.createDataFrame([], schema)
    d = max(r["i"] for r in rows) + 1
    S = np.zeros((d, d))
    sums = np.zeros(d)
    n = 0.0
    for r in rows:
        if r["i"] == -1:
            n = r["s"]
        elif r["j"] == -1:
            sums[r["i"]] = r["s"]
        else:
            S[r["i"], r["j"]] = r["s"]
            S[r["j"], r["i"]] = r["s"]
    mu = sums / n
    cov = S / n - np.outer(mu, mu)
    v = np.full(d, 0.125)
    for _ in range(5):
        w = cov @ v
        norm = float(np.sqrt((w * w).sum()))
        v = w / norm
    out = [(int(i), float(v[i]), float(norm)) for i in range(d)]
    # round via F.round (HALF_UP, the DuckDB round semantics) — Python's
    # built-in round is banker's and could diverge on exact .5e-6 ties
    return spark.createDataFrame(out, schema).select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
    )


@register(
    "agg_hll_sketch_merge",
    oracle=None,  # output carries the HLL estimate, which no portable SQL
    # reproduces bit-for-bit; semantics pinned by
    # tests/test_edges.py::test_hll_merge_matches_whole_corpus_sketch
    # (merge-consistency) and the <2% relative-error bound asserted there.
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — THE distributed cardinality
    pattern at 100 TB: build one Apache DataSketches HLL per day
    (hll_sketch_agg), union the constant-size sketches (hll_union_agg),
    estimate once. No re-scan of history when a new day lands: union its
    sketch in. Output: per-corpus estimated vs exact distinct users and
    the relative error (exact derivable at test scale only — at target
    scale the exact pass is precisely what this operator exists to
    avoid). Rows-only by design (the estimate has no portable SQL twin);
    a unit test pins merge-consistency (daily-union ≡ whole-corpus
    sketch) and the error bound."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("estimated_users")
    )
    exact = t.events.agg(F.count_distinct("user_id").alias("exact_users"))
    return (
        merged.crossJoin(F.broadcast(exact))
        .select(
            "estimated_users",
            "exact_users",
            F.round(
                F.abs(F.col("estimated_users") - F.col("exact_users"))
                / F.col("exact_users"),
                6,
            ).alias("rel_err"),
        )
    )
