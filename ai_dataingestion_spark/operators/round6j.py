"""Round-5 thirty-sixth wave (SURVEY.md §2.Q, continued):
content-defined chunking dedup, categorical-column entropy profiling,
and inter-arrival burstiness from exact integer moment sums.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.ai.dedup import _duck_h, _spark_h

# Expected chunk length = modulus tokens; 8 keeps chunks long enough to
# carry content but short enough that shared passages align (CDC's whole
# point: an insertion resynchronizes at the next content boundary, which
# fixed-width chunking never does).
_CDC_MOD = 8


@register(
    "dedup_cdc_chunking",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
marked AS (
  SELECT doc_id, source, w, pos,
         CASE WHEN lag(w) OVER dw IS NOT NULL
               AND {_duck_h("lag(w) OVER dw || ' ' || w")} % {_CDC_MOD} = 0
              THEN 1 ELSE 0 END AS b
  FROM toks
  WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)
),
chunked AS (
  SELECT doc_id, source, w, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS cid
  FROM marked
),
chunks AS (
  SELECT doc_id, source, cid,
         md5(string_agg(w, ' ' ORDER BY pos)) AS ch,
         count(*) AS n_toks
  FROM chunked GROUP BY 1, 2, 3
)
SELECT source,
       count(*) AS n_chunks,
       count(DISTINCT ch) AS n_distinct_chunks,
       round(1.0 - CAST(count(DISTINCT ch) AS DOUBLE) / count(*), 6)
         AS dup_chunk_ratio,
       round(CAST(sum(n_toks) AS DOUBLE) / count(*), 6)
         AS avg_chunk_tokens
FROM chunks GROUP BY source
""",
)
def dedup_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (CDC) dedup profile per source: chunk
    boundaries fall where the rolling 2-token hash ≡ 0 (mod 8), so an
    insertion or deletion re-synchronizes at the next content boundary
    and shared passages still hash to identical chunks — the property
    fixed-width chunking lacks and the reason CDC underlies
    storage-level dedup (LBFS, Muthitacharoen 2001). Pipeline: one
    posexplode, boundary lag + chunk-id cumsum + the (doc, chunk)
    re-assembly all partitioned by doc_id (one corpus shuffle, the
    exchange reused across both windows and the groupBy), then a
    sources-sized distinct-count rollup. Chunk identity is md5 of the
    order-reassembled text; the boundary hash is the repo's portable
    md5-prefix bigint so both engines cut identically."""
    d = Tables(spark, sf_dir).documents
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "w"),
    )
    dw = Window.partitionBy("doc_id").orderBy("pos")
    prev = toks.select(
        "doc_id", "source", "w", "pos", F.lag("w").over(dw).alias("pw")
    )
    marked = prev.select(
        "doc_id",
        "source",
        "w",
        "pos",
        F.when(
            F.col("pw").isNotNull()
            & (
                F.expr(_spark_h("concat(pw, ' ', w)")) % _CDC_MOD == 0
            ),
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    chunked = marked.select(
        "doc_id",
        "source",
        "w",
        "pos",
        F.sum("b")
        .over(dw.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cid"),
    )
    chunks = chunked.groupBy("doc_id", "source", "cid").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            )
        ).alias("ch"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    return chunks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("ch").alias("n_distinct_chunks"),
        F.round(
            1.0 - F.countDistinct("ch").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("dup_chunk_ratio"),
        F.round(
            F.sum("n_toks").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_chunk_tokens"),
    )


@register(
    "quality_column_entropy_profile",
    oracle="""
WITH vals AS (
  SELECT 'o_orderstatus' AS column_name, o_orderstatus AS v FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders
  UNION ALL
  SELECT 'order_month', CAST(date_trunc('month', o_orderdate) AS VARCHAR)
  FROM orders
),
cnt AS (
  SELECT column_name, v, count(*) AS c FROM vals GROUP BY 1, 2
),
prob AS (
  SELECT column_name, c,
         CAST(c AS DOUBLE)
           / CAST(sum(c) OVER (PARTITION BY column_name) AS DOUBLE) AS p
  FROM cnt
)
SELECT column_name,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(-sum(p * ln(p)), 6) AS entropy,
       CASE WHEN count(*) = 1 THEN NULL
            ELSE round(-sum(p * ln(p)) / ln(count(*)), 6)
       END AS norm_entropy
FROM prob GROUP BY column_name
""",
)
def quality_column_entropy_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Categorical-column entropy profile of orders: Shannon entropy
    and its ln(k)-normalized form for status, priority, and order
    month — the 'how identifier-like vs how constant is this column'
    signal that quality_profile's null/distinct counts miss (norm ≈ 1:
    uniform/high-cardinality; ≈ 0: near-constant). One stacked pass
    (three unpivoted value relations union'd before a single groupBy),
    probabilities as exact integer-count ratios over the
    values-per-column-sized aggregate, entropy summed over ≤ k terms."""
    o = Tables(spark, sf_dir).orders
    vals = (
        o.select(
            F.lit("o_orderstatus").alias("column_name"),
            F.col("o_orderstatus").alias("v"),
        )
        .unionAll(
            o.select(
                F.lit("o_orderpriority").alias("column_name"),
                F.col("o_orderpriority").alias("v"),
            )
        )
        .unionAll(
            o.select(
                F.lit("order_month").alias("column_name"),
                F.date_trunc("month", "o_orderdate")
                .cast("string")
                .alias("v"),
            )
        )
    )
    cnt = vals.groupBy("column_name", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    prob = cnt.select(
        "column_name",
        (
            F.col("c").cast("double")
            / F.sum("c")
            .over(Window.partitionBy("column_name"))
            .cast("double")
        ).alias("p"),
    )
    ent = -F.sum(F.col("p") * F.log(F.col("p")))
    return prob.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round(ent, 6).alias("entropy"),
        F.when(F.count(F.lit(1)) == 1, F.lit(None).cast("double"))
        .otherwise(F.round(ent / F.log(F.count(F.lit(1)).cast("double")), 6))
        .alias("norm_entropy"),
    )


@register(
    "events_interarrival_burstiness",
    oracle="""
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS d
  FROM events
),
mom AS (
  SELECT event_type,
         count(*) AS n,
         sum(d) AS s1,
         sum(CAST(d AS HUGEINT) * d) AS s2
  FROM gaps WHERE d IS NOT NULL
  GROUP BY event_type
),
stats AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n / 1000000.0 AS mu,
         sqrt(CAST(CAST(n AS HUGEINT) * s2
                   - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
              / (CAST(n AS DOUBLE) * (n - 1))) / 1000000.0 AS sd
  FROM mom
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       round(mu, 6) AS mean_gap_s,
       round(sd, 6) AS sd_gap_s,
       round(sd / mu, 6) AS cv,
       round((sd - mu) / (sd + mu), 6) AS burstiness
FROM stats
""",
)
def events_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-arrival burstiness per event type: the Goh–Barabási index
    B = (σ−μ)/(σ+μ) of the gap distribution (−1 = metronome, 0 =
    Poisson, →1 = heavy-tailed bursts) plus the coefficient of
    variation. The portability trap: stddev_samp on ~10⁹-magnitude
    microsecond gaps diverges across engines' accumulation algorithms
    beyond 6-dp rounding, so the variance is assembled from EXACT
    integer moment sums instead — Σd in BIGINT, Σd² in DECIMAL(38,0)
    (HUGEINT on the oracle side) — and floats appear only in the final
    n·Σd²−(Σd)² → double conversion, identical on both engines. Gaps
    order by (ts, event_id) so timestamp ties break deterministically;
    one corpus shuffle on event_type for the lag, then a 5-row rollup."""
    e = Tables(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("d")
    ).where(F.col("d").isNotNull())
    mom = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias("s2"),
    )
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    )
    mu = F.col("s1").cast("double") / F.col("n") / 1e6
    sd = (
        F.sqrt(
            num.cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        )
        / 1e6
    )
    stats = mom.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_gaps"),
        mu.alias("mu"),
        sd.alias("sd"),
    )
    return stats.select(
        "event_type",
        "n_gaps",
        F.round("mu", 6).alias("mean_gap_s"),
        F.round("sd", 6).alias("sd_gap_s"),
        F.round(F.col("sd") / F.col("mu"), 6).alias("cv"),
        F.round(
            (F.col("sd") - F.col("mu")) / (F.col("sd") + F.col("mu")), 6
        ).alias("burstiness"),
    )
