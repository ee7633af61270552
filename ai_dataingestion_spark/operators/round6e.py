"""Round-5 thirty-first wave (SURVEY.md §2.Q, continued): Spearman
vocabulary rank stability, longest same-type runs (RLE), embedding
dimension correlation pairs, and header-driven CSV column
reconciliation.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir


def _pround(col, dp: int = 6):
    """Portable IEEE rounding floor(x*10^dp + 0.5)/10^dp (see
    tpch_q2_min_cost_supplier)."""
    scale = 10**dp
    return F.floor(col * scale + 0.5) / scale


@register(
    "text_rank_stability_spearman",
    oracle="""
WITH h1 AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS w
    FROM documents WHERE doc_id % 2 = 0) GROUP BY w
),
h2 AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS w
    FROM documents WHERE doc_id % 2 = 1) GROUP BY w
),
r1 AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS r FROM h1),
r2 AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS r FROM h2),
paired AS (
  SELECT r1.r AS ra, r2.r AS rb
  FROM r1 JOIN r2 ON r1.w = r2.w
)
SELECT count(*) AS n_shared_tokens,
       floor((1 - 6.0 * sum(CAST((ra - rb) * (ra - rb) AS DOUBLE))
                  / (count(*) * (CAST(count(*) AS DOUBLE) * count(*) - 1)))
             * 1000000 + 0.5) / 1000000 AS spearman_rho,
       CAST(max(abs(ra - rb)) AS BIGINT) AS max_rank_shift
FROM paired
""",
)
def text_rank_stability_spearman(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vocabulary rank stability between corpus halves: Spearman's ρ
    over token frequency RANKS (1 − 6Σd²/(n(n²−1))) plus the largest
    single rank shift — the rank-based drift lens that ignores scale
    and sees only reordering, complementing the mass-based KL/JS
    divergences (a vocabulary can keep its distribution's shape while
    its head reorders — only ranks notice). Ranks break frequency
    ties lexicographically (deterministic cross-engine); d² sums are
    exact integers; one final rounded expression."""
    d = Tables(spark, sf_dir).documents

    def ranks(df: DataFrame, alias: str) -> DataFrame:
        counts = (
            df.select(F.explode(F.split("text", " ")).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.orderBy(F.desc("c"), F.asc("w"))
        return counts.select(
            "w", F.row_number().over(w).alias(alias)
        )

    r1 = ranks(d.filter(F.col("doc_id") % 2 == 0), "ra")
    r2 = ranks(d.filter(F.col("doc_id") % 2 == 1), "rb")
    paired = r1.join(r2, "w")
    n = F.count(F.lit(1))
    d2 = F.sum(
        ((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))).cast(
            "double"
        )
    )
    rho = 1 - 6.0 * d2 / (n * (n.cast("double") * n - 1))
    return paired.agg(
        n.alias("n_shared_tokens"),
        _pround(rho).alias("spearman_rho"),
        F.max(F.abs(F.col("ra") - F.col("rb")))
        .cast("bigint")
        .alias("max_rank_shift"),
    )


@register(
    "events_longest_same_type_run",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN event_type = lag(event_type)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
              THEN 0 ELSE 1 END AS brk
  FROM events
),
runs AS (
  SELECT user_id, event_type,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
  FROM seq
),
run_lengths AS (
  SELECT user_id, event_type, run_id, count(*) AS run_len
  FROM runs GROUP BY user_id, event_type, run_id
)
SELECT event_type,
       CAST(max(run_len) AS BIGINT) AS longest_run,
       CAST(count(*) AS BIGINT) AS n_runs,
       floor(CAST(sum(run_len) AS DOUBLE) / count(*) * 1000000 + 0.5)
         / 1000000 AS mean_run_len
FROM run_lengths GROUP BY event_type
""",
)
def events_longest_same_type_run(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run-length encoding of user timelines: consecutive same-type
    event runs (break-flag + running sum — the gaps-and-islands kernel
    keyed on VALUE CHANGE instead of time gap), rolled up to longest /
    count / mean run per type. Long error runs mean retry storms; long
    click runs mean scripted traffic — RLE is the compression-and-
    anomaly primitive over ordered categorical streams. One user
    partitioning serves both windows."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.col("event_type") == F.lag("event_type").over(w), 0
    ).otherwise(1)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = e.select(
        "user_id",
        "event_type",
        F.sum(brk).over(cum).alias("run_id"),
    )
    run_lengths = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    n = F.count(F.lit(1))
    return run_lengths.groupBy("event_type").agg(
        F.max("run_len").cast("bigint").alias("longest_run"),
        n.cast("bigint").alias("n_runs"),
        _pround(F.sum("run_len").cast("double") / n).alias("mean_run_len"),
    )


@register(
    "embed_dim_corr_pairs",
    oracle="""
WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id % 4 = 0
),
pairs AS (
  SELECT a.dim AS d1, b.dim AS d2,
         count(*) AS n,
         sum(a.x) AS sx, sum(b.x) AS sy,
         sum(a.x * b.x) AS sxy,
         sum(a.x * a.x) AS sxx, sum(b.x * b.x) AS syy
  FROM comp a JOIN comp b
    ON a.vec_id = b.vec_id AND a.dim < b.dim AND b.dim <= a.dim + 8
  GROUP BY a.dim, b.dim
),
scored AS (
  SELECT d1, d2,
         floor((sxy - sx * sy / n)
               / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
               * 1000000 + 0.5) / 1000000 AS r
  FROM pairs
)
SELECT d1, d2, r FROM (
  SELECT d1, d2, r,
         row_number() OVER (ORDER BY abs(r) DESC, d1, d2) AS rn
  FROM scored)
WHERE rn <= 15
""",
)
def embed_dim_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dimension redundancy screen: Pearson correlation for
    every dimension pair within a lag-8 band (d·8 pairs, not d²/2 —
    the banded screen used before paying for full PCA), top-15 by
    |r| — highly correlated dimensions mean the encoder wastes width
    and downstream quantization can fold them. Sampled corpus slice
    (every 4th vector), exploded once; the pair join is keyed on
    vec_id with the band predicate bounding fan-out at 8 per
    component row. Moment sums feed one rounded correlation per pair
    (float sums stabilized by the 6dp round — the §5.4 rule);
    rank cut is deterministic."""
    e = Tables(spark, sf_dir).embeddings.filter(F.col("vec_id") % 4 == 0)
    comp = e.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    a = comp.select("vec_id", F.col("dim").alias("d1"), F.col("x").alias("xa"))
    b = comp.select("vec_id", F.col("dim").alias("d2"), F.col("x").alias("xb"))
    pairs = (
        a.join(b, "vec_id")
        .filter(
            (F.col("d1") < F.col("d2")) & (F.col("d2") <= F.col("d1") + 8)
        )
        .groupBy("d1", "d2")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xa").alias("sx"),
            F.sum("xb").alias("sy"),
            F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
            F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
            F.sum(F.col("xb") * F.col("xb")).alias("syy"),
        )
    )
    r = _pround(
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
        / F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
        )
    )
    scored = pairs.select("d1", "d2", r.alias("r"))
    w = Window.orderBy(F.desc(F.abs(F.col("r"))), F.asc("d1"), F.asc("d2"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select("d1", "d2", "r")
    )


@register(
    "scan_csv_column_reorder",
    oracle="""
SELECT count(*) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(19, 2))), 2) AS DOUBLE)
         AS price_sum
FROM orders
""",
)
def scan_csv_column_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-driven CSV reconciliation: the same relation exported by
    two producers with DIFFERENT column orders (key-first vs
    price-first — the reality of multi-team CSV feeds), read back
    per-directory with header-based name mapping and unioned BY NAME —
    a positional read would silently transpose keys into prices; the
    checksums prove the name-mapped path didn't. unionByName is the
    reconciliation contract; the oracle recomputes from the source
    relation, so any transposition breaks the hash."""
    o = Tables(spark, sf_dir).orders.select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    half1 = o.filter(F.col("o_orderkey") % 2 == 0)
    half2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_totalprice", "o_orderstatus", "o_orderkey"  # reordered producer
    )
    d1, d2 = op_tmpdir("csv_reorder_a_"), op_tmpdir("csv_reorder_b_")
    half1.write.mode("overwrite").option("header", True).csv(d1)
    half2.write.mode("overwrite").option("header", True).csv(d2)
    r1 = (
        spark.read.option("header", True)
        .schema("o_orderkey bigint, o_totalprice double, o_orderstatus string")
        .csv(d1)
    )
    r2 = (
        spark.read.option("header", True)
        .schema(
            "o_totalprice double, o_orderstatus string, o_orderkey bigint"
        )
        .csv(d2)
    )
    merged = r1.unionByName(r2)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(19,2)")), 2
        )
        .cast("double")
        .alias("price_sum"),
    )
