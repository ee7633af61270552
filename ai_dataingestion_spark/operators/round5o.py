"""Round-5 fifteenth wave (SURVEY.md §2.Q, continued): CSV quoting
round-trip with embedded delimiters/newlines, pre/post Welch t-test,
running-distinct-count windows, and incremental batch dedup against an
existing lake.

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
    "sink_csv_quoted_roundtrip",
    oracle="""
WITH src AS (
  SELECT o_orderkey,
         o_orderstatus || ',"x' || chr(10) || o_orderpriority AS tricky
  FROM orders
)
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN contains(tricky, ',') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_comma,
       CAST(sum(CASE WHEN contains(tricky, chr(10)) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_with_newline,
       count(DISTINCT tricky) AS n_distinct_tricky,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM src
""",
)
def sink_csv_quoted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV quoting torture round-trip: a field carrying an embedded
    delimiter, a double-quote, AND a newline is written to CSV with
    standard RFC-4180 quote doubling (escape='\"') and re-read with
    multiLine=true — the three classic CSV-corruption vectors in one
    value. The checksummed aggregate comes from the RE-READ relation,
    so any quoting/escaping asymmetry between writer and reader breaks
    row count, distinct count, or the key checksum against the oracle's
    file-free recomputation. multiLine honesty note: quoted-newline CSV
    is NOT splittable — at 100 TB this path is for moderate-size
    interchange files; columnar formats carry the bulk (scan/sink
    parquet ops)."""
    o = Tables(spark, sf_dir).orders
    tricky = F.concat(
        F.col("o_orderstatus"),
        F.lit(',"x\n'),
        F.col("o_orderpriority"),
    )
    src = o.select("o_orderkey", tricky.alias("tricky"))
    out = op_tmpdir("sink_csv_quoted_")
    (
        src.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(out)
    )
    back = (
        spark.read.schema("o_orderkey bigint, tricky string")
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(out)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("tricky").contains(","), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_comma"),
        F.sum(F.when(F.col("tricky").contains("\n"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_newline"),
        F.countDistinct("tricky").alias("n_distinct_tricky"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
    )


_CUTOVER = "2024-01-15"


@register(
    "events_pre_post_welch_t",
    oracle=f"""
WITH sides AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_CUTOVER}' THEN 'pre' ELSE 'post' END
           AS side,
         CAST(value AS DECIMAL(10, 2)) AS v
  FROM events
),
mo AS (
  SELECT event_type, side, count(*) AS n,
         CAST(sum(v) AS DOUBLE) AS sx,
         CAST(sum(v * v) AS DOUBLE) AS sx2
  FROM sides GROUP BY event_type, side
),
wide AS (
  SELECT event_type,
         max(CASE WHEN side = 'pre' THEN n END) AS n1,
         max(CASE WHEN side = 'pre' THEN sx END) AS sx1,
         max(CASE WHEN side = 'pre' THEN sx2 END) AS sxx1,
         max(CASE WHEN side = 'post' THEN n END) AS n2,
         max(CASE WHEN side = 'post' THEN sx END) AS sx2_,
         max(CASE WHEN side = 'post' THEN sx2 END) AS sxx2
  FROM mo GROUP BY event_type
)
SELECT event_type, n1, n2,
       floor(sx1 / n1 * 1000000 + 0.5) / 1000000 AS mean_pre,
       floor(sx2_ / n2 * 1000000 + 0.5) / 1000000 AS mean_post,
       floor((sx1 / n1 - sx2_ / n2)
             / sqrt((sxx1 - sx1 * sx1 / n1) / (n1 - 1) / n1
                    + (sxx2 - sx2_ * sx2_ / n2) / (n2 - 1) / n2)
             * 1000000 + 0.5) / 1000000 AS welch_t
FROM wide
""",
)
def events_pre_post_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre/post intervention comparison: Welch's unequal-variance t
    statistic on the value column around a cutover date, per event
    type — the release-impact / experiment-readout primitive for
    continuous metrics (the proportions twin is
    events_ab_proportion_ztest). Raw power sums (n, Σx, Σx²)
    accumulate in DECIMAL — exact and order-independent (values carry
    2 decimals) — then means, variances, and t are derived with
    IDENTICAL IEEE operation order in both engines and portable-
    rounded. One partial-aggregable pass; output is types-sized."""
    e = Tables(spark, sf_dir).events
    v = F.col("value").cast("decimal(10,2)")
    sides = e.select(
        "event_type",
        F.when(
            F.col("ts") < F.lit(_CUTOVER).cast("timestamp"), "pre"
        ).otherwise("post").alias("side"),
        v.alias("v"),
    )
    mo = sides.groupBy("event_type", "side").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("sx"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("sx2"),
    )
    wide = mo.groupBy("event_type").agg(
        F.max(F.when(F.col("side") == "pre", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("side") == "pre", F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("side") == "pre", F.col("sx2"))).alias("sxx1"),
        F.max(F.when(F.col("side") == "post", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("side") == "post", F.col("sx"))).alias("sx2_"),
        F.max(F.when(F.col("side") == "post", F.col("sx2"))).alias("sxx2"),
    )
    m1 = F.col("sx1") / F.col("n1")
    m2 = F.col("sx2_") / F.col("n2")
    se2 = (
        (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1"))
        / (F.col("n1") - 1)
        / F.col("n1")
        + (F.col("sxx2") - F.col("sx2_") * F.col("sx2_") / F.col("n2"))
        / (F.col("n2") - 1)
        / F.col("n2")
    )
    return wide.select(
        "event_type",
        "n1",
        "n2",
        _pround(m1).alias("mean_pre"),
        _pround(m2).alias("mean_post"),
        _pround((m1 - m2) / F.sqrt(se2)).alias("welch_t"),
    )


@register(
    "win_running_distinct",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT user_id, event_id,
       CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_distinct_types_so_far
FROM flagged
""",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over an ordered window — a frame Spark
    (and ANSI SQL) cannot express directly — via the first-occurrence
    decomposition: flag each (user, type)'s first event with a
    row_number, then running-sum the flags along the user's timeline.
    Feature-adoption breadth over time, in two windows whose second
    reuses the first's user_id hash partitioning (one extra sort, no
    extra shuffle). The pattern generalizes to any running-distinct
    metric at any scale; collect_set-based spellings ship growing
    arrays through the window and do not."""
    e = Tables(spark, sf_dir).events
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("bigint").alias(
            "n_distinct_types_so_far"
        ),
    )


_RESUBMIT_OFFSET = 7_000_000


@register(
    "dedup_incremental_batch",
    oracle=f"""
WITH lake AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 <> 0
),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + {_RESUBMIT_OFFSET}, text
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 4 = 0
),
hashed AS (SELECT doc_id, md5(text) AS h FROM batch),
batch_deduped AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h,
           row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
    FROM hashed)
  WHERE rn = 1
)
SELECT b.doc_id, b.h AS content_md5
FROM batch_deduped b
WHERE NOT EXISTS (SELECT 1 FROM lake l WHERE l.h = b.h)
""",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup — the production shape where a new ingest batch
    is deduplicated against the already-accepted lake without
    re-deduplicating the lake itself: (1) dedup within the batch (keep
    the smallest id per digest), (2) anti-join the survivors against
    the lake's digest index. Resubmissions of lake content are injected
    (every 4th lake doc re-enters under a shifted id) and must all be
    rejected by stage 2. At 100 TB the lake side is exactly the digest
    column — 16 bytes/doc, the index a lakehouse keeps materialized —
    and both stages shuffle digests only; full text never moves."""
    d = Tables(spark, sf_dir).documents.select("doc_id", "text")
    lake = d.filter(F.col("doc_id") % 3 != 0).select(
        F.md5("text").alias("h")
    )
    batch = d.filter(F.col("doc_id") % 3 == 0).unionByName(
        d.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 4 == 0))
        .select((F.col("doc_id") + _RESUBMIT_OFFSET).alias("doc_id"), "text")
    )
    hashed = batch.select("doc_id", F.md5("text").alias("h"))
    w = Window.partitionBy("h").orderBy("doc_id")
    batch_deduped = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "h")
    )
    return batch_deduped.join(lake, "h", "left_anti").select(
        "doc_id", F.col("h").alias("content_md5")
    )
