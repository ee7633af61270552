"""Round-5 thirty-eighth wave (SURVEY.md §2.Q, continued): embedding
prefix-energy (Matryoshka truncation) analysis, Wilson proportion CIs,
and a three-strategy join-equivalence proof.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables

_PREFIX_KS = (8, 16, 32, 64)


def _prefix_oracle() -> str:
    per = ",\n".join(
        f"         sum(CASE WHEN i <= {k} THEN CAST(x AS DOUBLE) * x END)"
        f" AS e{k}"
        for k in _PREFIX_KS
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT {k} AS k, round(avg(e{k} / e64), 6) AS mean_energy,"
        f" round(min(e{k} / e64), 6) AS min_energy,"
        f" round(max(e{k} / e64), 6) AS max_energy FROM per"
        for k in _PREFIX_KS
    )
    return f"""
WITH ex AS (
  SELECT vec_id, unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
per AS (
  SELECT vec_id,
{per}
  FROM ex GROUP BY vec_id
)
{rows}
"""


@register("embed_prefix_energy_fraction", oracle=_prefix_oracle())
def embed_prefix_energy_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka-style prefix-energy curve: what fraction of each
    embedding's L2 energy lives in its first k dimensions
    (k ∈ 8/16/32/64) — the measurement behind truncating stored vectors
    to a prefix (Kusupati 2022): if mean energy at k=16 is already
    ~0.95 the index can ship quarter-width vectors. One posexplode +
    one vec_id-partitioned aggregate computing all four conditional
    energy sums in a single pass (no per-k re-scan), then a 4-row
    rollup; ratios are per-vector so corpus-level float accumulation
    never mixes vectors."""
    e = Tables(spark, sf_dir).embeddings
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.col("x").cast("double").alias("x"),
    )
    aggs = [
        F.sum(
            F.when(F.col("i") <= k, F.col("x") * F.col("x"))
        ).alias(f"e{k}")
        for k in _PREFIX_KS
    ]
    per = ex.groupBy("vec_id").agg(*aggs)
    # stack() unpivots the four ratios from ONE pass over `per` — a
    # union of four selects would re-run the explode+aggregate per k
    # (measured: 4 Generate nodes in the physical plan).
    stack_args = ", ".join(f"{k}, e{k} / e64" for k in _PREFIX_KS)
    stacked = per.select(
        F.expr(f"stack({len(_PREFIX_KS)}, {stack_args}) AS (k, f)")
    )
    return stacked.groupBy("k").agg(
        F.round(F.avg("f"), 6).alias("mean_energy"),
        F.round(F.min("f"), 6).alias("min_energy"),
        F.round(F.max("f"), 6).alias("max_energy"),
    )


_Z95 = "1.959963984540054"


@register(
    "lineitem_wilson_ci_return_rate",
    oracle=f"""
WITH cnt AS (
  SELECT n_name,
         count(*) AS n,
         count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS r
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY n_name
),
wil AS (
  SELECT n_name, n, r,
         CAST(r AS DOUBLE) / n AS p,
         {_Z95} AS z
  FROM cnt
)
SELECT n_name AS nation,
       CAST(n AS BIGINT) AS n_lines,
       CAST(r AS BIGINT) AS n_returned,
       round(p, 6) AS rate,
       round((p + z*z/(2*n) - z * sqrt(p*(1-p)/n + z*z/(4.0*n*n)))
             / (1 + z*z/n), 6) AS wilson_lo,
       round((p + z*z/(2*n) + z * sqrt(p*(1-p)/n + z*z/(4.0*n*n)))
             / (1 + z*z/n), 6) AS wilson_hi
FROM wil
""",
)
def lineitem_wilson_ci_return_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """95% Wilson score interval for the return rate per supplier
    nation — the proportion CI that stays inside [0,1] and behaves at
    small n where the normal ('Wald') interval collapses; the
    closed-form sibling of agg_bootstrap_mean_ci. Every input to the
    formula is an exact integer count (one broadcast-dim join + one
    nations-sized groupBy), so both engines evaluate the identical
    float expression — no accumulation-order exposure anywhere."""
    t = Tables(spark, sf_dir)
    cnt = (
        t.lineitem.join(
            broadcast_if_small(
                t.supplier.select("s_suppkey", "s_nationkey"), sf_dir, "supplier"
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r"),
        )
    )
    z = F.lit(float(_Z95))
    n = F.col("n").cast("double")
    p = F.col("r").cast("double") / n
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    center = p + z * z / (2 * n)
    denom = 1 + z * z / n
    return cnt.select(
        F.col("n_name").alias("nation"),
        F.col("n").cast("bigint").alias("n_lines"),
        F.col("r").cast("bigint").alias("n_returned"),
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


_JOIN_STRATEGIES = ("broadcast", "shuffle_hash", "merge")


def _strategy_oracle() -> str:
    one = """
SELECT '{s}' AS strategy,
       count(DISTINCT c_mktsegment) AS n_segments,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(19,2))), 2) AS DOUBLE)
         AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey"""
    return "\nUNION ALL\n".join(
        one.format(s=s) for s in _JOIN_STRATEGIES
    )


@register("join_strategy_equivalence", oracle=_strategy_oracle())
def join_strategy_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-strategy independence proof for the orders ⋈ customer
    revenue rollup: the SAME logical join executed three ways —
    broadcast-hash, shuffled-hash, and sort-merge (per-branch join
    hints, pinned in plan tests as three distinct physical operators) —
    must produce identical aggregates. This is the join sibling of
    topk_per_group_strategies / dedup_partition_invariance: the
    property that makes strategy a pure COST decision at 100 TB (AQE
    may flip a merge join to broadcast at runtime precisely because
    the result cannot change). DECIMAL revenue so the three sums are
    bit-identical, not merely close."""
    t = Tables(spark, sf_dir)
    parts = []
    for s in _JOIN_STRATEGIES:
        joined = t.orders.join(
            t.customer.hint(s), F.col("o_custkey") == F.col("c_custkey")
        )
        parts.append(
            joined.agg(
                F.countDistinct("c_mktsegment").alias("n_segments"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(19,2)")), 2
                )
                .cast("double")
                .alias("total_revenue"),
            ).select(
                F.lit(s).alias("strategy"), "n_segments", "total_revenue"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
