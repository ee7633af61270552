"""Round-6 fifty-fourth wave (SURVEY.md §2.R): distributed training and
sync primitives — a relational logistic-regression gradient-descent step,
partition-grain content fingerprints, and hash-shard balance audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.ai.dedup import _duck_h, _spark_h
from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

_LOGREG_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings),
g1 AS (
  SELECT i AS dim, round(avg((0.5 - y) * x), 4) AS g
  FROM (SELECT y, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e) ex
  GROUP BY i),
w1 AS (SELECT list(round(-g, 4) ORDER BY dim) AS wv FROM g1),
z2 AS (
  SELECT e.vec_id, e.y, e.v,
         round(1.0 / (1.0 + exp(-round(list_sum(
           list_transform(e.v, (x, i) -> x * w1.wv[i])), 4))), 4) AS sig
  FROM e CROSS JOIN w1),
g2 AS (
  SELECT i AS dim, round(avg((sig - y) * x), 4) AS g
  FROM (SELECT sig, y, unnest(v) AS x, generate_subscripts(v, 1) AS i
        FROM z2) ex
  GROUP BY i),
w2 AS (
  SELECT g2.dim, round(-g1.g - g2.g, 4) AS w
  FROM g2 JOIN g1 USING (dim)),
w2l AS (SELECT list(w ORDER BY dim) AS wv FROM w2),
acc AS (
  SELECT 0 AS dim,
         round(avg(CASE WHEN (round(list_sum(
                 list_transform(e.v, (x, i) -> x * w2l.wv[i])), 4) >= 0)
                 = (e.y = 1.0)
               THEN 1.0 ELSE 0.0 END), 4) AS w
  FROM e CROSS JOIN w2l)
SELECT dim, w FROM w2 UNION ALL SELECT dim, w FROM acc
"""


@register("embed_logistic_regression_step", oracle=_LOGREG_ORACLE)
def embed_logistic_regression_step(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two unrolled iterations of full-batch logistic-regression gradient
    descent (binary task: label==0), expressed relationally — the
    distributed-training kernel as pure DataFrame ops, following
    embed_kmeans_iterations' determinism recipe. Per iteration: one
    map-side dot product per vector against the broadcast weight array
    (left-to-right zip_with fold), a sigmoid, and a partial-aggregable
    per-dimension gradient mean via posexplode — the exact shape of a
    parameter-server step where only d gradient scalars shuffle, never
    vectors. Cross-engine determinism: w0 = 0 makes sigma exactly 0.5 in
    step 1; thereafter dots, sigmoids, gradient means, and weights are
    each rounded to 4 dp BEFORE feeding the next stage, so both engines
    iterate from bit-equal state (the kmeans 4-dp flake-insurance
    analysis applies). Weight collection between iterations is 64
    bounded scalars (the documented bounded-collect exception, like the
    16 IVF centroids). Output: 64 (dim, weight) rows + a dim=0 row with
    the training-set sign-prediction accuracy at the final weights
    (0.604 at sf0.001 vs ~0.5 chance — the step demonstrably learns).
    Oracle: the same two iterations unrolled as DuckDB CTEs."""
    e = Tables(spark, sf_dir).embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        F.expr("CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END").alias("y"),
    )
    ex = e.select("y", F.posexplode("v").alias("j0", "x")).select(
        (F.col("j0") + 1).alias("dim"), "y", "x"
    )
    g1 = ex.groupBy("dim").agg(
        F.round(F.avg((F.lit(0.5) - F.col("y")) * F.col("x")), 4).alias("g")
    )
    w1 = [round(-r["g"], 4) for r in g1.orderBy("dim").collect()]  # 64 scalars
    if not w1:  # empty corpus: no dims, no weights — return empty frame
        return g1.select("dim", F.col("g").alias("w"))
    w1arr = F.array(*[F.lit(float(x)) for x in w1])

    def dot(varr):
        return F.round(
            F.aggregate(
                F.zip_with("v", varr, lambda x, w: x * w),
                F.lit(0.0),
                lambda a, b: a + b,
            ),
            4,
        )

    z2 = e.select(
        "y", "v", F.round(1.0 / (1.0 + F.exp(-dot(w1arr))), 4).alias("sig")
    )
    ex2 = z2.select("sig", "y", F.posexplode("v").alias("j0", "x")).select(
        (F.col("j0") + 1).alias("dim"), "sig", "y", "x"
    )
    g2 = ex2.groupBy("dim").agg(
        F.round(F.avg((F.col("sig") - F.col("y")) * F.col("x")), 4).alias("g2")
    )
    w2df = g2.join(g1, "dim").select(
        "dim", F.round(-F.col("g") - F.col("g2"), 4).alias("w")
    )
    w2 = [r["w"] for r in w2df.orderBy("dim").collect()]  # 64 scalars
    w2arr = F.array(*[F.lit(float(x)) for x in w2])
    acc = (
        e.select(
            (dot(w2arr) >= 0).alias("pred"), (F.col("y") == 1.0).alias("pos")
        )
        .agg(
            F.round(
                F.avg(F.when(F.col("pred") == F.col("pos"), 1.0).otherwise(0.0)),
                4,
            ).alias("w")
        )
        .select(F.lit(0).alias("dim"), "w")
    )
    return w2df.unionByName(acc)


_PF_CANON_SPARK = (
    "CAST(o_orderkey AS STRING) || '|' || CAST(o_custkey AS STRING)"
    " || '|' || o_orderstatus || '|' ||"
    " CAST(CAST(o_totalprice AS DECIMAL(19,2)) AS STRING)"
)
_PF_CANON_DUCK = (
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
    " || '|' || o_orderstatus || '|' ||"
    " CAST(CAST(o_totalprice AS DECIMAL(19,2)) AS VARCHAR)"
)


@register(
    "quality_partition_fingerprint_diff",
    oracle=f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_rows,
       CAST(sum(CAST({_duck_h(f"({_PF_CANON_DUCK})")} AS DECIMAL(38,0)))
            AS VARCHAR) AS fingerprint
FROM orders GROUP BY 1
""",
)
def quality_partition_fingerprint_diff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-grain content fingerprints: the per-month extension of
    quality_table_fingerprint (round6v) that turns "did the table
    change?" into "WHICH partitions diverged?" — the work-list an
    incremental re-sync job feeds from, re-copying only fingerprint-
    mismatched months instead of 100 TB. Same portable construction:
    md5-derived 60-bit row hashes over an engine-identical canonical
    rendering, summed per month in DECIMAL(38,0) (order-independent,
    duplicate-sensitive, partial-aggregable — the shuffle carries one
    decimal per (partition, month) pair). One scan, months-sized
    output."""
    t = Tables(spark, sf_dir)
    h = F.expr(_spark_h(f"({_PF_CANON_SPARK})")).cast("decimal(38,0)")
    return t.orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).cast("string").alias("fingerprint"),
    )


_N_SHARDS = 64


@register(
    "pipeline_shard_skew_audit",
    oracle=f"""
WITH sharded AS (
  SELECT {_duck_h("CAST(doc_id AS VARCHAR)")} % {_N_SHARDS} AS shard
  FROM documents),
sizes AS (SELECT shard, count(*) AS n FROM sharded GROUP BY 1)
SELECT count(*) AS n_shards, CAST(min(n) AS BIGINT) AS min_docs,
       CAST(max(n) AS BIGINT) AS max_docs,
       CAST(round(max(n) * 1.0 / avg(n), 4) AS DOUBLE) AS peak_to_mean
FROM sizes
""",
)
def pipeline_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-shard balance audit: documents assigned to 64 output shards
    by a portable md5-derived hash of the doc key (the same family the
    dedup/split operators use — stable under repartition and across
    engines, unlike xxhash64 which DuckDB lacks), then the size spread
    and peak-to-mean ratio that decide whether a training-data export
    needs a different shard key or count. A peak-to-mean near 1.0 means
    no straggler shard; the audit is one partial-aggregable groupBy over
    8-byte hashes plus a 64-row reduce, so it costs one scan at any
    corpus size. Oracle: DuckDB computes the identical assignment."""
    t = Tables(spark, sf_dir)
    sharded = t.documents.select(
        (F.expr(_spark_h("CAST(doc_id AS STRING)")) % _N_SHARDS).alias("shard")
    )
    sizes = sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.min("n").alias("min_docs"),
        F.max("n").alias("max_docs"),
        F.round(F.max("n") / F.avg("n"), 4).cast("double").alias(
            "peak_to_mean"
        ),
    )
