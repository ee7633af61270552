"""Round-5 forty-second wave (SURVEY.md §2.Q, continued): Markov
entropy rate of the event stream, product-quantization reconstruction
error, and compressed-CSV round-trip interop.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir


@register(
    "events_markov_entropy_rate",
    oracle="""
WITH seq AS (
  SELECT event_type AS nxt,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prv
  FROM events
),
cells AS (
  SELECT prv, nxt, count(*) AS c FROM seq WHERE prv IS NOT NULL
  GROUP BY prv, nxt
),
probs AS (
  SELECT prv, c,
         CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY prv) AS pij,
         CAST(sum(c) OVER (PARTITION BY prv) AS DOUBLE)
           / sum(c) OVER () AS pi
  FROM cells
)
SELECT round(-sum(pi * pij * ln(pij)), 6) AS entropy_rate_nats,
       round(-sum(pi * pij * ln(pij)) / ln(5.0), 6)
         AS normalized_entropy_rate,
       CAST(sum(c) AS BIGINT) AS n_transitions
FROM probs
""",
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain:
    H = −Σ_i π_i Σ_j P_ij ln P_ij with the stationary weight π taken
    empirically from transition counts — ONE number for 'how
    predictable is the next event given the current one' (0 =
    deterministic flows, ln(5) = uniform chaos), normalized by ln(k).
    This is the summary scalar over the same relation
    events_transition_matrix reports cell-by-cell and the conditional
    sibling of corpus_source_entropy. One corpus shuffle for the
    per-user lag; everything after runs on the ≤ types² cell
    aggregate, probabilities as exact integer-count ratios."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("nxt"),
        F.lag("event_type").over(w).alias("prv"),
    ).where(F.col("prv").isNotNull())
    cells = seq.groupBy("prv", "nxt").agg(F.count(F.lit(1)).alias("c"))
    w_prv = Window.partitionBy("prv")
    w_all = Window.partitionBy()
    probs = cells.select(
        "c",
        (F.col("c").cast("double") / F.sum("c").over(w_prv)).alias("pij"),
        (
            F.sum("c").over(w_prv).cast("double") / F.sum("c").over(w_all)
        ).alias("pi"),
    )
    h = -F.sum(F.col("pi") * F.col("pij") * F.log(F.col("pij")))
    return probs.agg(
        F.round(h, 6).alias("entropy_rate_nats"),
        F.round(h / F.log(F.lit(5.0)), 6).alias(
            "normalized_entropy_rate"
        ),
        F.sum("c").cast("bigint").alias("n_transitions"),
    )


_PQ_BLOCKS = 4
_PQ_SUBDIM = 16
_PQ_K = 4  # codebook entries per block: sub-vectors of vec_ids 0..3


@register(
    "embed_pq_reconstruction_error",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
sub AS (
  SELECT vec_id, CAST(floor(i / {_PQ_SUBDIM}) AS INTEGER) AS blk,
         i % {_PQ_SUBDIM} AS j, x
  FROM ex
),
cb AS (
  SELECT blk, j, vec_id AS cid, x AS cx FROM sub WHERE vec_id < {_PQ_K}
),
dist AS (
  SELECT s.vec_id, s.blk, c.cid,
         floor(sum((s.x - c.cx) * (s.x - c.cx)) * 1e9 + 0.5) / 1e9 AS d
  FROM sub s JOIN cb c ON s.blk = c.blk AND s.j = c.j
  GROUP BY s.vec_id, s.blk, c.cid
),
assign AS (
  SELECT vec_id, blk, min(d) AS best_d
  FROM (SELECT vec_id, blk, cid, d,
               row_number() OVER (PARTITION BY vec_id, blk
                                  ORDER BY d, cid) AS rn
        FROM dist)
  WHERE rn = 1 GROUP BY vec_id, blk
),
norms AS (
  SELECT vec_id, sum(x * x) AS e FROM sub GROUP BY vec_id
),
per_vec AS (
  SELECT a.vec_id, sum(a.best_d) AS sq_err, max(n.e) AS e
  FROM assign a JOIN norms n ON a.vec_id = n.vec_id
  GROUP BY a.vec_id
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       round(avg(sq_err / e), 6) AS mean_err_ratio,
       round(max(sq_err / e), 6) AS max_err_ratio,
       round(avg(sq_err), 6) AS mean_sq_err
FROM per_vec
""",
)
def embed_pq_reconstruction_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Product-quantization (Jégou 2011) reconstruction error: split
    each 64-dim vector into 4 sub-vectors of 16, snap each to its
    nearest entry in a 4-entry per-block codebook (deterministically
    the sub-vectors of vec_ids 0-3 — a fixed 'trained' codebook both
    engines share), and report how much energy the 2-bit-per-block
    code loses. PQ is the memory side of ANN serving (sim_ann_ivf
    prunes candidates; PQ shrinks residents 128×). The plan: one
    explode to (vec, block, j) cells, the tiny codebook joins
    BROADCAST, per-(vec, block, centroid) distances aggregate in one
    pass, argmin by (9-dp-rounded distance, cid) — the
    tpch_q2_min_cost_supplier round-before-rank rule — then a
    corpus-sized ratio rollup."""
    e = Tables(spark, sf_dir).embeddings
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select(
        "vec_id",
        (F.col("i") / _PQ_SUBDIM).cast("int").alias("blk"),
        (F.col("i") % _PQ_SUBDIM).alias("j"),
        F.col("xf").cast("double").alias("x"),
    )
    cb = ex.where(F.col("vec_id") < _PQ_K).select(
        F.col("blk").alias("c_blk"),
        F.col("j").alias("c_j"),
        F.col("vec_id").alias("cid"),
        F.col("x").alias("cx"),
    )
    dist = (
        ex.join(
            F.broadcast(cb),
            (F.col("blk") == F.col("c_blk")) & (F.col("j") == F.col("c_j")),
        )
        .groupBy("vec_id", "blk", "cid")
        .agg(
            (
                F.floor(
                    F.sum(
                        (F.col("x") - F.col("cx"))
                        * (F.col("x") - F.col("cx"))
                    )
                    * 1e9
                    + 0.5
                )
                / 1e9
            ).alias("d")
        )
    )
    w = Window.partitionBy("vec_id", "blk").orderBy("d", "cid")
    assign = (
        dist.select("vec_id", "blk", "d", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .groupBy("vec_id", "blk")
        .agg(F.min("d").alias("best_d"))
    )
    norms = ex.groupBy("vec_id").agg(
        F.sum(F.col("x") * F.col("x")).alias("e")
    )
    per_vec = (
        assign.groupBy("vec_id")
        .agg(F.sum("best_d").alias("sq_err"))
        .join(norms, "vec_id")
    )
    return per_vec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.avg(F.col("sq_err") / F.col("e")), 6).alias(
            "mean_err_ratio"
        ),
        F.round(F.max(F.col("sq_err") / F.col("e")), 6).alias(
            "max_err_ratio"
        ),
        F.round(F.avg("sq_err"), 6).alias("mean_sq_err"),
    )


@register(
    "sink_csv_gzip_roundtrip",
    oracle="""
SELECT 'gzip' AS codec, count(*) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum FROM orders
UNION ALL
SELECT 'bzip2', count(*), CAST(sum(o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'uncompressed', count(*), CAST(sum(o_orderkey) AS BIGINT)
FROM orders
""",
)
def sink_csv_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-TEXT sink interop (the CSV sibling of
    sink_parquet_codecs): the same relation written as gzip'd,
    bzip2'd, and plain CSV, each re-read with an explicit schema and
    checksummed. The operational point at scale: gzip CSV files are
    NOT splittable — one file is one task on read, so landing
    compressed text must control file count at write time (bzip2 IS
    block-splittable, the reason it survives in ingest paths despite
    its CPU cost). Exchange-format round-trips stay part of the sink
    contract because upstream producers ship compressed text, not
    parquet."""
    o = Tables(spark, sf_dir).orders.select("o_orderkey", "o_orderstatus")
    out = None
    for codec in ["gzip", "bzip2", "uncompressed"]:
        path = op_tmpdir(f"sink_csv_{codec}_")
        (
            o.write.mode("overwrite")
            .option("compression", codec)
            .option("header", "true")
            .csv(path)
        )
        back = (
            spark.read.schema("o_orderkey bigint, o_orderstatus string")
            .option("header", "true")
            .csv(path)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            )
            .select(F.lit(codec).alias("codec"), "n", "key_sum")
        )
        out = back if out is None else out.unionByName(back)
    return out
