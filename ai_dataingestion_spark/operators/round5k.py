"""Round-5 eleventh wave (SURVEY.md §2.Q, continued): a watermark-
tuning late-arrival audit over injected event-time disorder, the
end-to-end dedup REMOVAL PLAN composing exact / near / chunk dedup with
priority semantics, JSONL schema inference, and numeric RANGE window
frames.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir
from ai_dataingestion_spark.ai.dedup import (
    _CW_A,
    _CW_B,
    _MERSENNE_P,
    _SHINGLES_EXPR,
    _duck_h,
    _minhash_band_bucket,
    _spark_h,
    N_BANDS,
    N_HASHES,
    SHINGLE_K,
)


_ARRIVAL_BUCKET = 1000  # events per arrival bucket (event_id DIV 1000)


@register(
    "events_late_arrival_audit",
    oracle=f"""
WITH feed AS (
  -- injected disorder: every 37th event's event-time shifts back by
  -- 1..7 minutes while its ARRIVAL position (event_id) stays put
  SELECT event_id, event_type,
         CASE WHEN event_id % 37 = 0
              THEN ts - to_minutes(CAST(event_id % 7 + 1 AS BIGINT))
              ELSE ts END AS ts,
         event_id // {_ARRIVAL_BUCKET} AS bkt
  FROM events
),
bucket_max AS (
  SELECT event_type, bkt, max(ts) AS bmax
  FROM feed GROUP BY event_type, bkt
),
wm AS (
  SELECT event_type, bkt,
         max(bmax) OVER (PARTITION BY event_type ORDER BY bkt
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS watermark
  FROM bucket_max
),
scored AS (
  SELECT f.event_type,
         CASE
           WHEN w.watermark IS NULL OR f.ts >= w.watermark THEN 'on_time'
           WHEN epoch_us(w.watermark) - epoch_us(f.ts) <= 60000000
             THEN 'late_1m'
           WHEN epoch_us(w.watermark) - epoch_us(f.ts) <= 300000000
             THEN 'late_5m'
           ELSE 'late_over_5m'
         END AS lateness_band
  FROM feed f JOIN wm w
    ON f.event_type = w.event_type AND f.bkt = w.bkt
)
SELECT event_type, lateness_band, count(*) AS n
FROM scored GROUP BY event_type, lateness_band
""",
)
def events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-tuning audit: how late do events actually arrive? Event
    time is compared against the per-type watermark carried into each
    ARRIVAL bucket (1000-event ingestion batches by event_id — arrival
    order), and lateness is banded on_time / ≤1 min / ≤5 min / >5 min —
    exactly the histogram that justifies a `withWatermark` delay choice
    for stream_watermark_late. The corpus arrives perfectly ordered
    (measured: zero late events), so disorder is deterministically
    injected: every 37th event's event-time shifts back 1-7 minutes
    while its arrival position stays put. Scale shape: the watermark is
    a running max over the BUCKETS-sized aggregate (never an
    events-sized ordered window), joined back by (type, bucket)."""
    e = Tables(spark, sf_dir).events
    shifted = F.when(
        F.col("event_id") % 37 == 0,
        F.col("ts")
        - F.make_interval(mins=(F.col("event_id") % 7 + 1).cast("int")),
    ).otherwise(F.col("ts"))
    feed = e.select(
        "event_id",
        "event_type",
        shifted.alias("ts"),
        (F.col("event_id") / _ARRIVAL_BUCKET).cast("bigint").alias("bkt"),
    )
    bucket_max = feed.groupBy("event_type", "bkt").agg(
        F.max("ts").alias("bmax")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wm = bucket_max.select(
        "event_type", "bkt", F.max("bmax").over(w).alias("watermark")
    )
    joined = feed.join(F.broadcast(wm), ["event_type", "bkt"])
    late_us = F.unix_micros(F.col("watermark").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    band = (
        F.when(
            F.col("watermark").isNull() | (F.col("ts") >= F.col("watermark")),
            "on_time",
        )
        .when(late_us <= 60_000_000, "late_1m")
        .when(late_us <= 300_000_000, "late_5m")
        .otherwise("late_over_5m")
    )
    return joined.groupBy(
        "event_type", band.alias("lateness_band")
    ).agg(F.count(F.lit(1)).alias("n"))


_EXACT_OFFSET = 1_000_000
_NEAR_OFFSET = 2_000_000


_REMOVAL_CORPUS_SQL = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_EXACT_OFFSET}, text FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id + {_NEAR_OFFSET},
         array_to_string(list_slice(string_split(text, ' '), 1,
           len(string_split(text, ' ')) - 1), ' ')
  FROM documents WHERE doc_id % 5 = 0
)
"""


@register(
    "dedup_removal_plan",
    oracle="WITH "
    + _REMOVAL_CORPUS_SQL
    + f""",
exact_removed AS (
  SELECT doc_id, 'exact' AS reason FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM corpus)
  WHERE rn > 1
),
toksed AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - {SHINGLE_K - 2}, 2)),
           i -> array_to_string(list_slice(toks, i, i + {SHINGLE_K - 1}), ' ')
         )) AS shingles
  FROM toksed
),
sp AS (SELECT doc_id, {_duck_h("shingle")} % {_MERSENNE_P} AS hm
       FROM (SELECT doc_id, unnest(shingles) AS shingle FROM shingled)),
sig AS (
  SELECT doc_id,
         {", ".join("min((%d * hm + %d) %% %d) AS h%d" % (_CW_A[i], _CW_B[i], _MERSENNE_P, i) for i in range(N_HASHES))}
  FROM sp GROUP BY doc_id
),
banded AS (
  {" UNION ALL ".join("SELECT doc_id, %d AS band, %s AS bucket FROM sig" % (b, _minhash_band_bucket("h", b)) for b in range(N_BANDS))}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
near_pairs AS (
  SELECT id1, id2 FROM cand
  JOIN shingled s1 ON s1.doc_id = id1
  JOIN shingled s2 ON s2.doc_id = id2
  WHERE CAST(len(list_filter(s1.shingles, s -> list_contains(s2.shingles, s)))
             AS DOUBLE) /
        (len(s1.shingles) + len(s2.shingles)
         - len(list_filter(s1.shingles, s -> list_contains(s2.shingles, s))))
          >= 0.6
),
near_removed AS (
  SELECT DISTINCT id2 AS doc_id, 'near' AS reason FROM near_pairs
),
decisions AS (
  SELECT doc_id, reason, 1 AS prio FROM exact_removed
  UNION ALL
  SELECT doc_id, reason, 2 FROM near_removed
)
SELECT doc_id, reason FROM (
  SELECT doc_id, reason,
         row_number() OVER (PARTITION BY doc_id ORDER BY prio) AS rn
  FROM decisions)
WHERE rn = 1
""",
)
def dedup_removal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup REMOVAL PLAN — the artifact a training-data
    pipeline actually ships: one (doc_id, reason) work-list composing
    byte-exact dedup (md5 groups, keep the smallest id) and MinHash
    near-dup dedup (LSH candidates → Jaccard ≥ 0.6 verify → remove the
    larger id of each pair), with priority semantics: a doc caught by
    both is attributed to the CHEAPER stage that would have removed it
    first (exact > near), mirroring how staged dedup short-circuits at
    scale. The corpus carries BOTH injection idioms (exact copies of
    even ids at +1e6, last-token-dropped near copies of %5 ids at +2e6)
    so each stage's recall is independently verifiable. Every stage is
    the proven scale shape: hash groupBy for exact, banded signature
    equality join for near — text never shuffles past the shingle
    explode."""
    d = Tables(spark, sf_dir).documents.select("doc_id", "text")
    toks = F.split("text", " ")
    corpus = (
        d.unionByName(
            d.filter(F.col("doc_id") % 2 == 0).select(
                (F.col("doc_id") + _EXACT_OFFSET).alias("doc_id"), "text"
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + _NEAR_OFFSET).alias("doc_id"),
                F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ").alias(
                    "text"
                ),
            )
        )
    )
    # stage 1: byte-exact — hash groupBy, keep min id per group
    w_exact = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact_removed = (
        corpus.withColumn("rn", F.row_number().over(w_exact))
        .filter(F.col("rn") > 1)
        .select("doc_id", F.lit("exact").alias("reason"), F.lit(1).alias("prio"))
    )
    # stage 2: MinHash LSH near-dup — remove the larger id of each pair
    # the shingle relation feeds the signature build AND both verify
    # sides of the candidate join: cache it (MEMORY_AND_DISK — spills,
    # never OOMs) so the explode+dedup of shingles runs once, not 3x
    docs = corpus.withColumn("toks", F.split("text", " ")).select(
        "doc_id", F.expr(_SHINGLES_EXPR).alias("shingles")
    ).cache()
    sig = (
        docs.select("doc_id", F.explode("shingles").alias("shingle"))
        .select(
            "doc_id",
            F.expr(f"{_spark_h('shingle')} % {_MERSENNE_P}").alias("hm"),
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    (F.lit(_CW_A[i]) * F.col("hm") + F.lit(_CW_B[i]))
                    % _MERSENNE_P
                ).alias(f"h{i}")
                for i in range(N_HASHES)
            ]
        )
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
    near_removed = (
        cand.join(sh1, "id1")
        .join(sh2, "id2")
        .filter(inter / union >= 0.6)
        .select(F.col("id2").alias("doc_id"))
        .distinct()
        .select("doc_id", F.lit("near").alias("reason"), F.lit(2).alias("prio"))
    )
    decisions = exact_removed.unionByName(near_removed)
    w_prio = Window.partitionBy("doc_id").orderBy("prio")
    return (
        decisions.withColumn("rn", F.row_number().over(w_prio))
        .filter(F.col("rn") == 1)
        .select("doc_id", "reason")
    )


@register(
    "scan_json_schema_infer",
    oracle="""
SELECT 'o_orderdate' AS col_name, 'timestamp' AS inferred_type
UNION ALL SELECT 'o_orderkey', 'bigint'
UNION ALL SELECT 'o_orderpriority', 'string'
UNION ALL SELECT 'o_totalprice', 'double'
""",
)
def scan_json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read inference for JSONL: a typed slice of orders is
    exported to JSON lines and re-read WITHOUT a declared schema — the
    reader must sample the files and infer (bigint, double, string,
    timestamp). The emitted relation is the inferred schema itself, so
    the oracle pins exactly what inference must produce; a regression
    to string-everything (the classic inference failure) or a type
    widening change breaks the hash. Inference is a sampling scan —
    the one scan an ingestion engine pays once per discovery, never per
    query."""
    o = Tables(spark, sf_dir).orders.select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate"
    )
    out = op_tmpdir("scan_json_infer_")
    o.write.mode("overwrite").json(out)
    inferred = spark.read.option(
        "inferTimestamp", "true"
    ).json(out)
    rows = sorted(
        (f.name, f.dataType.simpleString()) for f in inferred.schema.fields
    )
    return spark.createDataFrame(
        rows, "col_name string, inferred_type string"
    )


@register(
    "win_range_numeric_frame",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       CAST(count(*) OVER (
         PARTITION BY c_mktsegment ORDER BY c_acctbal
         RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_within_500_below,
       CAST(count(*) OVER (
         PARTITION BY c_mktsegment ORDER BY c_acctbal
         RANGE BETWEEN 250 PRECEDING AND 250 FOLLOWING) AS BIGINT)
         AS n_within_250_band
FROM customer
""",
)
def win_range_numeric_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE window frames (§2.E completion): peer-density
    queries — for each customer, how many same-segment customers sit
    within a VALUE band of their balance (not a row count, not a time
    interval) — the frame type behind local-density scoring and
    percentile-free outlier screens. RANGE frames are tie-deterministic
    (peer rows share a frame), so no unique tie-break column is needed
    for cross-engine parity, unlike every ROWS frame in §2.E."""
    c = Tables(spark, sf_dir).customer
    w1 = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rangeBetween(-500, Window.currentRow)
    )
    w2 = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rangeBetween(-250, 250)
    )
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.count(F.lit(1)).over(w1).cast("bigint").alias("n_within_500_below"),
        F.count(F.lit(1)).over(w2).cast("bigint").alias("n_within_250_band"),
    )
