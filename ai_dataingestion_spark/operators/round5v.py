"""Round-5 twenty-second wave (SURVEY.md §2.Q, continued): ABC-XYZ
inventory classification, maximal-marginal-relevance diversified
selection, single-source supplier risk, and a partition-invariance
determinism proof.

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
    "lineitem_abc_xyz_matrix",
    oracle="""
WITH monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
         CAST(sum(CAST(l_quantity AS DECIMAL(10, 2))) AS DOUBLE) AS q
  FROM lineitem GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey,
         count(*) AS n_months,
         CAST(sum(CAST(q AS DECIMAL(19, 2))) AS DOUBLE) AS sq,
         CAST(sum(CAST(q AS DECIMAL(19, 2)) * CAST(q AS DECIMAL(19, 2)))
              AS DOUBLE) AS sq2,
         CAST(sum(CAST(q AS DECIMAL(19, 2))) AS DECIMAL(19, 2)) AS total_q
  FROM monthly GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, n_months, sq, sq2, total_q,
         sum(total_q) OVER (ORDER BY total_q DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
         sum(total_q) OVER () AS tot
  FROM per_part
),
classed AS (
  SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
              WHEN cum * 20 <= tot * 19 THEN 'B'
              ELSE 'C' END AS abc,
         CASE WHEN n_months < 2 THEN 'Z'
              WHEN sqrt((sq2 - sq * sq / n_months) / (n_months - 1))
                   / (sq / n_months) < 0.25 THEN 'X'
              WHEN sqrt((sq2 - sq * sq / n_months) / (n_months - 1))
                   / (sq / n_months) < 0.5 THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM ranked
)
SELECT abc, xyz, count(*) AS n_parts
FROM classed GROUP BY abc, xyz
""",
)
def lineitem_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory classification — the planner's 3×3 matrix:
    ABC = cumulative-volume tiers (top 80% / next 15% / tail, cut by
    EXACT decimal comparisons cum·5 ≤ tot·4 — no division), XYZ =
    demand-variability tiers from the coefficient of variation of
    monthly quantities (CV < 0.25 steady, < 0.5 seasonal, else
    erratic; fewer than 2 observed months is Z by definition). CV is
    derived from exact DECIMAL power sums with identical IEEE
    operation order, and the classification thresholds are pure
    comparisons, so no rounding surface exists. Windows run over the
    parts-sized aggregate; output is ≤9 cells at any scale."""
    t = Tables(spark, sf_dir)
    monthly = (
        t.lineitem.groupBy(
            "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(10,2)"))
            .cast("double")
            .alias("q")
        )
    )
    qd = F.col("q").cast("decimal(19,2)")
    per_part = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum(qd).cast("double").alias("sq"),
        F.sum(qd * qd).cast("double").alias("sq2"),
        F.sum(qd).cast("decimal(19,2)").alias("total_q"),
    )
    w_cum = Window.orderBy(F.desc("total_q"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = per_part.select(
        "*",
        F.sum("total_q").over(w_cum).alias("cum"),
        F.sum("total_q").over(
            Window.partitionBy()
        ).alias("tot"),
    )
    cv = F.sqrt(
        (F.col("sq2") - F.col("sq") * F.col("sq") / F.col("n_months"))
        / (F.col("n_months") - 1)
    ) / (F.col("sq") / F.col("n_months"))
    abc = (
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
    )
    xyz = (
        F.when(F.col("n_months") < 2, "Z")
        .when(cv < 0.25, "X")
        .when(cv < 0.5, "Y")
        .otherwise("Z")
    )
    return (
        ranked.select(abc.alias("abc"), xyz.alias("xyz"))
        .groupBy("abc", "xyz")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


_MMR_LAMBDA = 0.7
_MMR_K = 4

_DUCK_COS = (
    "floor((list_sum(list_transform({a}, (x, i) -> CAST(x AS DOUBLE)"
    " * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)"
    " * CAST(x AS DOUBLE))))"
    " * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE)"
    " * CAST(x AS DOUBLE)))))) * 1000000000 + 0.5) / 1000000000"
)


def _mmr_oracle() -> str:
    """Unrolled k-step MMR selection as chained CTEs (the kmeans
    unrolled-oracle precedent)."""
    cos_qd = _DUCK_COS.format(a="q.embedding", b="e.embedding")
    parts = [
        f"""
qv AS (SELECT embedding FROM embeddings
       WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
scored AS (
  SELECT e.vec_id, {cos_qd} AS sim
  FROM embeddings e CROSS JOIN qv q
  WHERE e.vec_id <> (SELECT min(vec_id) FROM embeddings)
),
sel1 AS (SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 1)
"""
    ]
    prev_sel = "sel1"
    sel_union = "SELECT vec_id FROM sel1"
    for step in range(2, _MMR_K + 1):
        cos_ds = _DUCK_COS.format(a="d.embedding", b="s.embedding")
        parts.append(
            f"""
pen{step} AS (
  SELECT d.vec_id, max({cos_ds}) AS max_sel_sim
  FROM embeddings d
  JOIN embeddings s ON s.vec_id IN ({sel_union})
  WHERE d.vec_id NOT IN ({sel_union})
    AND d.vec_id <> (SELECT min(vec_id) FROM embeddings)
  GROUP BY d.vec_id
),
sel{step} AS (
  SELECT sc.vec_id, sc.sim
  FROM scored sc JOIN pen{step} p ON sc.vec_id = p.vec_id
  ORDER BY {_MMR_LAMBDA} * sc.sim - {1 - _MMR_LAMBDA} * p.max_sel_sim DESC,
           sc.vec_id
  LIMIT 1
)"""
        )
        sel_union += f" UNION ALL SELECT vec_id FROM sel{step}"
        prev_sel = f"sel{step}"
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS pick_order, vec_id, sim FROM sel{i + 1}"
        for i in range(_MMR_K)
    )
    return "WITH " + ",".join(parts) + "\n" + selects


@register("embed_mmr_select", oracle=_mmr_oracle())
def embed_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell-Goldstein 1998) diversified
    top-k: greedily pick the candidate maximizing
    λ·sim(query, d) − (1−λ)·max_sim(d, already-selected) — the
    diversification step RAG retrieval runs after ANN so the k passages
    aren't five copies of the same paragraph. λ=0.7, k=4, query = the
    lowest-id vector. The greedy loop is inherently sequential, so each
    of the k−1 penalty rounds is one distributed pass (map-side cosines
    vs the ≤k-row broadcast selected set, argmax with vec_id tiebreak);
    the driver collects ONE row per round — the bounded-collect budget
    the kmeans/centroid ops established. Cosines are left-to-right
    folds rounded to 9dp before every argmax; the oracle unrolls the
    identical greedy chain as CTEs."""
    e = Tables(spark, sf_dir).embeddings
    qrow = e.orderBy("vec_id").select("vec_id", "embedding").first()
    if qrow is None:  # empty corpus: no query vector, empty result
        return spark.createDataFrame(
            [], "pick_order int, vec_id bigint, sim double"
        )
    q_id, q_vec = qrow["vec_id"], qrow["embedding"]

    def cos(col_vec, lit_vec: list) -> F.Column:
        arr = F.array(*[F.lit(float(x)) for x in lit_vec])
        dot = F.aggregate(
            F.zip_with(
                col_vec, arr, lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        na = F.sqrt(
            F.aggregate(
                col_vec,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        nb = F.sqrt(
            F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        return _pround(dot / (na * nb), 9)

    cand = e.filter(F.col("vec_id") != q_id).select(
        "vec_id", "embedding", cos(F.col("embedding"), q_vec).alias("sim")
    ).cache()

    selected: list = []  # (vec_id, sim, embedding)
    for _ in range(_MMR_K):
        if not selected:
            pick = cand.orderBy(F.desc("sim"), F.asc("vec_id")).first()
        else:
            sel_ids = [s[0] for s in selected]
            pen = None
            for _sid, _ssim, svec in selected:
                p = cos(F.col("embedding"), svec)
                pen = p if pen is None else F.greatest(pen, p)
            pick = (
                cand.filter(~F.col("vec_id").isin(sel_ids))
                .withColumn(
                    "mmr",
                    _MMR_LAMBDA * F.col("sim") - (1 - _MMR_LAMBDA) * pen,
                )
                .orderBy(F.desc("mmr"), F.asc("vec_id"))
                .first()
            )
        if pick is None:  # fewer than k candidates exist: stop early
            break
        selected.append((pick["vec_id"], pick["sim"], pick["embedding"]))

    rows = [
        (i + 1, int(vid), float(sim))
        for i, (vid, sim, _vec) in enumerate(selected)
    ]
    return spark.createDataFrame(
        rows, "pick_order int, vec_id bigint, sim double"
    )


@register(
    "part_single_source_risk",
    oracle="""
WITH sourcing AS (
  SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
  FROM lineitem GROUP BY l_partkey
),
tagged AS (
  SELECT p.p_brand, s.n_suppliers
  FROM sourcing s JOIN part p ON s.l_partkey = p.p_partkey
)
SELECT p_brand,
       count(*) AS n_parts,
       CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS single_sourced,
       floor(CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
         AS single_source_share
FROM tagged GROUP BY p_brand
""",
)
def part_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply risk per brand: parts whose entire observed
    volume came from ONE supplier — the supply-chain fragility screen
    (one supplier outage stops the part). One distinct-count aggregate
    keyed on partkey, brand dimension broadcast, brands-sized output."""
    t = Tables(spark, sf_dir)
    sourcing = t.lineitem.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    tagged = sourcing.join(
        broadcast_if_small(t.part.select("p_partkey", "p_brand"), sf_dir, "part"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    single = F.sum(F.when(F.col("n_suppliers") == 1, 1).otherwise(0))
    return tagged.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        single.cast("bigint").alias("single_sourced"),
        _pround(single.cast("double") / F.count(F.lit(1))).alias(
            "single_source_share"
        ),
    )


@register(
    "dedup_partition_invariance",
    oracle="""
WITH hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
survivors AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
    FROM hashed)
  WHERE rn = 1
)
SELECT count(*) AS n_survivors,
       CAST(sum(doc_id) AS BIGINT) AS survivor_id_sum,
       0 AS layouts_disagree
FROM survivors
""",
)
def dedup_partition_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout invariance proof for dedup: the SAME keep-min
    exact dedup is executed under two adversarial physical layouts —
    repartition(7, by text) and repartition(13, by doc_id) — and the
    emitted layouts_disagree is the size of the symmetric difference
    between their survivor sets, pinned to 0 by the oracle. This is
    the determinism contract that makes dedup results reproducible
    across cluster sizes, AQE decisions, and re-runs — asserted as a
    hash-checked output every round (the topk_per_group_strategies
    proof pattern applied to data layout)."""
    d = Tables(spark, sf_dir).documents.select("doc_id", "text")

    def survivors(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id")
        )

    s1 = survivors(d.repartition(7, "text"))
    s2 = survivors(d.repartition(13, "doc_id"))
    diff = (
        s1.exceptAll(s2)
        .unionAll(s2.exceptAll(s1))
        .agg(F.count(F.lit(1)).alias("n_diff"))
    )
    return (
        s1.agg(
            F.count(F.lit(1)).alias("n_survivors"),
            F.sum("doc_id").cast("bigint").alias("survivor_id_sum"),
        )
        .crossJoin(F.broadcast(diff))
        .select(
            "n_survivors",
            "survivor_id_sum",
            F.col("n_diff").cast("int").alias("layouts_disagree"),
        )
    )
