"""Round-5 forty-third wave (SURVEY.md §2.Q, continued): a trained
Naive-Bayes source classifier evaluated on a held-out split, classical
additive seasonal decomposition, and nested-JSON round-trip parity.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

# Train/test assignment: first md5 hex nibble of the salted doc id
# (split_train_eval's content-free rule) — nibbles 0..b train (75%),
# c..f test (25%). Identical hex on both engines.
_SPLIT = "substring(md5(concat('nb', CAST(doc_id AS {s}))), 1, 1)"


@register(
    "text_naive_bayes_source_classifier",
    oracle=f"""
WITH split AS (
  SELECT doc_id, source, text,
         CASE WHEN {_SPLIT.format(s="VARCHAR")} <= 'b'
              THEN 'train' ELSE 'test' END AS split
  FROM documents
),
train_tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w
  FROM split WHERE split = 'train'
),
counts AS (
  SELECT source, w, count(*) AS c FROM train_tok GROUP BY source, w
),
vocab AS (SELECT DISTINCT w FROM train_tok),
totals AS (
  SELECT source, sum(c) AS t FROM counts GROUP BY source
),
vsize AS (SELECT count(*) AS v FROM vocab),
grid AS (
  SELECT t.source, vb.w,
         ln((coalesce(c.c, 0) + 1.0)
            / (t.t + (SELECT v FROM vsize))) AS ll
  FROM totals t
  CROSS JOIN vocab vb
  LEFT JOIN counts c ON c.source = t.source AND c.w = vb.w
),
priors AS (
  SELECT source, ln(CAST(count(*) AS DOUBLE)
                    / (SELECT count(*) FROM split WHERE split = 'train'))
           AS lp
  FROM split WHERE split = 'train' GROUP BY source
),
test_tok AS (
  SELECT doc_id, source AS true_source,
         unnest(string_split(text, ' ')) AS w
  FROM split WHERE split = 'test'
),
scores AS (
  SELECT tt.doc_id, tt.true_source, g.source AS cand,
         max(p.lp) + sum(g.ll) AS score
  FROM test_tok tt
  JOIN grid g ON g.w = tt.w
  JOIN priors p ON p.source = g.source
  GROUP BY tt.doc_id, tt.true_source, g.source
),
pred AS (
  SELECT doc_id, true_source, cand AS predicted_source,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY floor(score * 1e9 + 0.5) DESC, cand) AS rn
  FROM scores
)
SELECT true_source, predicted_source, count(*) AS n_docs
FROM pred WHERE rn = 1
GROUP BY true_source, predicted_source
""",
)
def text_naive_bayes_source_classifier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A TRAINED model inside the engine: multinomial Naive Bayes with
    add-one smoothing learns P(token|source) on the md5-split 75%
    train fold and classifies the held-out 25% by argmax of
    prior + Σ log-likelihood; output is the test confusion matrix.
    Every probability is a ratio of exact integer counts, so both
    engines build identical log-likelihood tables; per-doc score sums
    are rounded to 9 dp BEFORE the argmax with a source-name tie-break
    (the round-before-rank rule) so accumulation order can never flip
    a prediction. The scale shape: training is one (source, token)
    aggregate; the dense vocab×sources likelihood grid is
    vocabulary-bounded; scoring is one equality join on token — no
    per-class scan, no Python. Tokens unseen in training drop out of
    scoring identically on both sides (inner join to the vocab grid)."""
    d = Tables(spark, sf_dir).documents
    nib = F.substring(
        F.md5(F.concat(F.lit("nb"), F.col("doc_id").cast("string"))), 1, 1
    )
    split = d.select(
        "doc_id",
        "source",
        "text",
        F.when(nib <= "b", "train").otherwise("test").alias("split"),
    )
    train = split.where(F.col("split") == "train")
    train_tok = train.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    counts = train_tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    vocab = train_tok.select("w").distinct()
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    grid = (
        F.broadcast(totals)
        .crossJoin(vocab)
        .join(counts, ["source", "w"], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "source",
            "w",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("t") + F.col("v"))
            ).alias("ll"),
        )
    )
    priors = (
        train.groupBy("source")
        .agg(F.count(F.lit(1)).alias("nc"))
        .select(
            "source",
            F.log(
                F.col("nc").cast("double")
                / F.sum("nc").over(Window.partitionBy())
            ).alias("lp"),
        )
    )
    test_tok = split.where(F.col("split") == "test").select(
        "doc_id",
        F.col("source").alias("true_source"),
        F.explode(F.split("text", " ")).alias("w"),
    )
    scores = (
        test_tok.join(
            grid.select(F.col("source").alias("cand"), "w", "ll"), "w"
        )
        .join(
            F.broadcast(priors.select(F.col("source").alias("cand"), "lp")),
            "cand",
        )
        .groupBy("doc_id", "true_source", "cand")
        .agg((F.max("lp") + F.sum("ll")).alias("score"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.desc(F.floor(F.col("score") * 1e9 + 0.5)), F.asc("cand")
    )
    pred = scores.select(
        "true_source",
        F.col("cand").alias("predicted_source"),
        F.row_number().over(w_doc).alias("rn"),
    ).where(F.col("rn") == 1)
    return pred.groupBy("true_source", "predicted_source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "orders_seasonal_decomposition_additive",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(sum(CAST(o_totalprice AS DECIMAL(19,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
),
tr AS (
  SELECT m, rev,
         sum(rev) OVER w / 12 AS trend,
         count(*) OVER w AS wn
  FROM monthly
  WINDOW w AS (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
),
det AS (
  SELECT CAST(month(m) AS INTEGER) AS month_num, rev - trend AS d
  FROM tr WHERE wn = 12
),
seas AS (
  SELECT month_num, count(*) AS n_obs, avg(d) AS s
  FROM det GROUP BY month_num
)
SELECT month_num,
       CAST(n_obs AS BIGINT) AS n_obs,
       round(s, 6) AS seasonal_index,
       round((SELECT avg(abs(det.d - seas.s)) FROM det
              WHERE det.month_num = seas.month_num), 6)
         AS mean_abs_remainder
FROM seas
""",
)
def orders_seasonal_decomposition_additive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical additive seasonal decomposition of monthly revenue:
    trend = 12-month moving average (full windows only), seasonal
    index = mean detrended value per calendar month, remainder = what
    neither explains — the decomposition behind 'is December really
    bigger or is it just trend'. orders_seasonal_index ratios against
    the global mean; this one removes a MOVING trend first, so a
    growing business doesn't masquerade as seasonality. Monthly sums
    in DECIMAL → identical doubles; trend divides a window sum by the
    exact count; all windows run over the ~80-row months relation."""
    o = Tables(spark, sf_dir).orders
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(19,2)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.orderBy("m").rowsBetween(-5, 6)
    tr = monthly.select(
        "m",
        "rev",
        (F.sum("rev").over(w) / 12).alias("trend"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )
    det = tr.where(F.col("wn") == 12).select(
        F.month("m").cast("int").alias("month_num"),
        (F.col("rev") - F.col("trend")).alias("d"),
    )
    seas = det.groupBy("month_num").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.avg("d").alias("s"),
    )
    rem = (
        det.join(seas.select("month_num", "s"), "month_num")
        .groupBy("month_num")
        .agg(
            F.avg(F.abs(F.col("d") - F.col("s"))).alias("mar")
        )
    )
    return seas.join(rem, "month_num").select(
        "month_num",
        "n_obs",
        F.round("s", 6).alias("seasonal_index"),
        F.round("mar", 6).alias("mean_abs_remainder"),
    )


@register(
    "fn_json_nested_roundtrip",
    oracle="""
WITH built AS (
  SELECT o_orderkey AS k,
         to_json(struct_pack(
           id := o_orderkey,
           meta := struct_pack(st := o_orderstatus, pr := o_orderpriority),
           arr := [o_custkey, o_orderkey % 100]
         )) AS j,
         o_orderstatus, o_custkey
  FROM orders
),
parsed AS (
  SELECT k, o_orderstatus, o_custkey,
         CAST(json_extract(j, '$.id') AS BIGINT) AS rid,
         json_extract_string(j, '$.meta.st') AS rst,
         CAST(json_extract(j, '$.arr[0]') AS BIGINT) AS rarr0
  FROM built
)
SELECT count(*) AS n_total,
       count(CASE WHEN rid = k AND rst = o_orderstatus
                   AND rarr0 = o_custkey THEN 1 END) AS n_roundtrip_ok,
       CAST(sum(rarr0) AS BIGINT) AS custkey_checksum
FROM parsed
""",
)
def fn_json_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON construct → serialize → re-parse round-trip: each
    order becomes a document with a nested struct and an array field,
    then every value is extracted back by path and compared to its
    origin — the schema-on-write/schema-on-read contract fn_json's
    flat props extraction doesn't cover (nested paths `$.meta.st`,
    array indexing `$.arr[0]`). Each engine round-trips its OWN
    serialization, so the parity check is on the recovered VALUES —
    all n rows must survive intact on both sides. Pure JVM-side
    expressions (to_json/from_json), zero Python, one scan."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    o = Tables(spark, sf_dir).orders
    built = o.select(
        F.col("o_orderkey").alias("k"),
        "o_orderstatus",
        "o_custkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("id"),
                F.struct(
                    F.col("o_orderstatus").alias("st"),
                    F.col("o_orderpriority").alias("pr"),
                ).alias("meta"),
                F.array(
                    F.col("o_custkey"), F.col("o_orderkey") % 100
                ).alias("arr"),
            )
        ).alias("j"),
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("st", StringType()),
                        StructField("pr", StringType()),
                    ]
                ),
            ),
            StructField("arr", ArrayType(LongType())),
        ]
    )
    parsed = built.select(
        "k",
        "o_orderstatus",
        "o_custkey",
        F.from_json("j", schema).alias("p"),
    ).select(
        "k",
        "o_orderstatus",
        "o_custkey",
        F.col("p.id").alias("rid"),
        F.col("p.meta.st").alias("rst"),
        F.col("p.arr").getItem(0).alias("rarr0"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(
            F.when(
                (F.col("rid") == F.col("k"))
                & (F.col("rst") == F.col("o_orderstatus"))
                & (F.col("rarr0") == F.col("o_custkey")),
                1,
            )
        ).alias("n_roundtrip_ok"),
        F.sum("rarr0").cast("bigint").alias("custkey_checksum"),
    )
