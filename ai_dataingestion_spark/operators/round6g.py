"""Round-5 thirty-third wave (SURVEY.md §2.Q, continued): dedup
detector evaluation against injected ground truth, weighted medians,
and the top-k vocabulary coverage curve.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.ai.dedup import (
    _CW_A,
    _CW_B,
    _DUP_OFFSET,
    _MERSENNE_P,
    _MINHASH_ORACLE,
    _SHINGLES_EXPR,
    _corpus_with_near_dups,
    _minhash_band_bucket,
    _spark_h,
    N_BANDS,
    N_HASHES,
)


def _pround(col, dp: int = 6):
    """Portable IEEE rounding floor(x*10^dp + 0.5)/10^dp (see
    tpch_q2_min_cost_supplier)."""
    scale = 10**dp
    return F.floor(col * scale + 0.5) / scale


_EVAL_ORACLE = (
    "WITH detected AS (" + _MINHASH_ORACLE + "),\n"
    + f"""
truth AS (
  SELECT doc_id AS id1, doc_id + {_DUP_OFFSET} AS id2
  FROM documents WHERE doc_id % 5 = 0
),
tp AS (
  SELECT count(*) AS n FROM detected d
  WHERE EXISTS (SELECT 1 FROM truth t
                WHERE t.id1 = d.id1 AND t.id2 = d.id2)
),
counts AS (
  SELECT (SELECT count(*) FROM detected) AS n_detected,
         (SELECT count(*) FROM truth) AS n_truth,
         (SELECT n FROM tp) AS n_tp
)
SELECT n_detected, n_truth, n_tp,
       floor(CAST(n_tp AS DOUBLE) / n_detected * 1000000 + 0.5) / 1000000
         AS precision_vs_truth,
       floor(CAST(n_tp AS DOUBLE) / n_truth * 1000000 + 0.5) / 1000000
         AS recall,
       floor(2.0 * (CAST(n_tp AS DOUBLE) / n_detected)
             * (CAST(n_tp AS DOUBLE) / n_truth)
             / (CAST(n_tp AS DOUBLE) / n_detected
                + CAST(n_tp AS DOUBLE) / n_truth) * 1000000 + 0.5) / 1000000
         AS f1
FROM counts
"""
)


@register("dedup_eval_precision_recall", oracle=_EVAL_ORACLE)
def dedup_eval_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector EVALUATION against injected ground truth: the full
    MinHash-LSH near-dup pipeline runs (the dedup_near_minhash plan,
    verbatim), and its detected pairs are scored against the known
    injection set (every 5th doc's last-token-dropped copy) —
    precision-vs-truth, recall, F1. Recall < 1 means signatures or
    banding regressed; precision-vs-truth < 1 means the detector ALSO
    finds organic near-dups (legitimate — which is why the metric is
    named against-truth, not absolute). This is the measurement layer
    a dedup pipeline ships with: the same operator, re-pointed at a
    labeled corpus, becomes its regression gate."""
    corpus = _corpus_with_near_dups(spark, sf_dir).withColumn(
        "toks", F.split("text", " ")
    )
    docs = corpus.select(
        "doc_id", F.expr(_SHINGLES_EXPR).alias("shingles")
    ).cache()
    pairs = docs.select(
        "doc_id", F.explode("shingles").alias("shingle")
    ).select(
        "doc_id", F.expr(f"{_spark_h('shingle')} % {_MERSENNE_P}").alias("hm")
    )
    sig = pairs.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(_CW_A[i]) * F.col("hm") + F.lit(_CW_B[i]))
                % _MERSENNE_P
            ).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(_minhash_band_bucket("h", b)).alias("bucket"),
        )
        for b in range(N_BANDS)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select(
        "doc_id",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    sh1 = docs.select(F.col("doc_id").alias("id1"), F.col("shingles").alias("sh1"))
    sh2 = docs.select(F.col("doc_id").alias("id2"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("double")
    union = F.size(F.array_union("sh1", "sh2")).cast("double")
    detected = (
        cand.join(sh1, "id1")
        .join(sh2, "id2")
        .filter(inter / union >= 0.6)
        .select("id1", "id2")
    )
    truth = (
        Tables(spark, sf_dir)
        .documents.filter(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("id1"),
            (F.col("doc_id") + _DUP_OFFSET).alias("id2"),
        )
    )
    tp = detected.join(truth, ["id1", "id2"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_tp")
    )
    nd = detected.agg(F.count(F.lit(1)).alias("n_detected"))
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    j = nd.crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(tp))
    prec = F.col("n_tp").cast("double") / F.col("n_detected")
    rec = F.col("n_tp").cast("double") / F.col("n_truth")
    return j.select(
        "n_detected",
        "n_truth",
        "n_tp",
        _pround(prec).alias("precision_vs_truth"),
        _pround(rec).alias("recall"),
        _pround(2.0 * prec * rec / (prec + rec)).alias("f1"),
    )


@register(
    "agg_weighted_median",
    oracle="""
WITH grouped AS (
  SELECT l_returnflag, l_extendedprice AS v,
         sum(CAST(l_quantity AS DECIMAL(19, 2))) AS w
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
),
cum AS (
  SELECT l_returnflag, v, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM grouped
)
SELECT l_returnflag,
       CAST(round(min(CASE WHEN cw * 2 >= tw THEN v END), 2) AS DOUBLE)
         AS weighted_median_price,
       CAST(round(max(tw), 2) AS DOUBLE) AS total_weight
FROM cum GROUP BY l_returnflag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median price per return flag: the smallest
    price whose cumulative quantity weight reaches half the total —
    "the price at which half the UNITS trade", which the unweighted
    median (half the LINES) misrepresents whenever order sizes vary.
    Weights accumulate in DECIMAL and the half-total test is the exact
    comparison cw·2 ≥ tw (the brand_pareto_coverage no-division rule);
    the cumulative window runs over the (flag, distinct-price)
    aggregate, not raw lines."""
    li = Tables(spark, sf_dir).lineitem
    grouped = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("v")).agg(
        F.sum(F.col("l_quantity").cast("decimal(19,2)")).alias("w")
    )
    w_cum = Window.partitionBy("l_returnflag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grouped.select(
        "l_returnflag",
        "v",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.round(
            F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("v"))), 2
        )
        .cast("double")
        .alias("weighted_median_price"),
        F.round(F.max("tw"), 2).cast("double").alias("total_weight"),
    )


_COVERAGE_KS = [1, 2, 4, 8, 16, 32]


@register(
    "text_topk_coverage_curve",
    oracle=f"""
WITH vocab AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),
ranked AS (
  SELECT c,
         row_number() OVER (ORDER BY c DESC, w) AS r,
         sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER () AS tot
  FROM vocab
)
SELECT k,
       floor(CAST(cum_k AS DOUBLE) / tot_k * 1000000 + 0.5) / 1000000
         AS coverage
FROM (
  SELECT g.k,
         max(CASE WHEN r <= g.k THEN cum END) AS cum_k,
         max(tot) AS tot_k
  FROM (SELECT unnest([{", ".join(str(k) for k in _COVERAGE_KS)}]) AS k) g
  CROSS JOIN ranked
  GROUP BY g.k
)
""",
)
def text_topk_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k vocabulary coverage curve: the share of ALL corpus tokens
    covered by the k most frequent types, k ∈ {{1,2,4,8,16,32}} — the
    Zipf-coverage view that sizes stopword lists and vocabulary
    truncations (where the curve flattens is where extra vocab stops
    paying). Rank/cumulative windows run over the vocab-sized
    aggregate with deterministic count-then-word ordering; the k spine
    reads the max cumulative at each cut. Exact integer token counts,
    one rounded division per k."""
    d = Tables(spark, sf_dir).documents
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_rank = Window.orderBy(F.desc("c"), F.asc("w"))
    ranked = vocab.select(
        "c",
        F.row_number().over(w_rank).alias("r"),
        F.sum("c")
        .over(
            w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("tot"),
    )
    spine = spark.createDataFrame(
        [(k,) for k in _COVERAGE_KS], "k int"
    )
    per_k = (
        F.broadcast(spine)
        .crossJoin(ranked)
        .groupBy("k")
        .agg(
            F.max(
                F.when(F.col("r") <= F.col("k"), F.col("cum"))
            ).alias("cum_k"),
            F.max("tot").alias("tot_k"),
        )
    )
    return per_k.select(
        "k",
        _pround(F.col("cum_k").cast("double") / F.col("tot_k")).alias(
            "coverage"
        ),
    )
