"""Round-5 twenty-seventh wave (SURVEY.md §2.Q, continued):
difference-in-differences estimation, a Laspeyres price index,
sink file-layout auditing, and incremental batch novelty.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir


def _pround(col, dp: int = 6):
    """Portable IEEE rounding floor(x*10^dp + 0.5)/10^dp (see
    tpch_q2_min_cost_supplier)."""
    scale = 10**dp
    return F.floor(col * scale + 0.5) / scale


_DID_CUT = "2024-01-15"


@register(
    "events_diff_in_differences",
    oracle=f"""
WITH tagged AS (
  SELECT CASE WHEN CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                        AS BIGINT) % 2 = 0
              THEN 'treated' ELSE 'control' END AS grp,
         CASE WHEN ts < TIMESTAMP '{_DID_CUT}' THEN 'pre' ELSE 'post' END
           AS period,
         CAST(value AS DECIMAL(10, 2)) AS v
  FROM events
),
cells AS (
  SELECT grp, period, count(*) AS n,
         CAST(sum(v) AS DOUBLE) AS s
  FROM tagged GROUP BY grp, period
),
wide AS (
  SELECT
    max(CASE WHEN grp = 'treated' AND period = 'pre'  THEN s / n END) AS t0,
    max(CASE WHEN grp = 'treated' AND period = 'post' THEN s / n END) AS t1,
    max(CASE WHEN grp = 'control' AND period = 'pre'  THEN s / n END) AS c0,
    max(CASE WHEN grp = 'control' AND period = 'post' THEN s / n END) AS c1,
    CAST(sum(n) AS BIGINT) AS n_events
  FROM cells
)
SELECT n_events,
       floor(t0 * 1000000 + 0.5) / 1000000 AS treated_pre,
       floor(t1 * 1000000 + 0.5) / 1000000 AS treated_post,
       floor(c0 * 1000000 + 0.5) / 1000000 AS control_pre,
       floor(c1 * 1000000 + 0.5) / 1000000 AS control_post,
       floor(((t1 - t0) - (c1 - c0)) * 1000000 + 0.5) / 1000000
         AS did_estimate
FROM wide
""",
)
def events_diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: (post − pre) for the treated group
    minus (post − pre) for control — the workhorse causal estimator
    when randomization is only at the group level, composed from the
    repo's two established idioms (md5-nibble deterministic group
    assignment, cutover-date period split). Four cell means from
    exact DECIMAL sums, the DiD contrast derived with identical IEEE
    order in both engines. One partial-aggregable pass to a 4-cell
    relation."""
    e = Tables(spark, sf_dir).events
    grp = F.when(
        F.expr(
            "conv(substring(md5(cast(user_id as string)), 1, 1), 16, 10)"
        ).cast("bigint")
        % 2
        == 0,
        "treated",
    ).otherwise("control")
    period = F.when(
        F.col("ts") < F.lit(_DID_CUT).cast("timestamp"), "pre"
    ).otherwise("post")
    cells = e.select(
        grp.alias("grp"),
        period.alias("period"),
        F.col("value").cast("decimal(10,2)").alias("v"),
    ).groupBy("grp", "period").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").cast("double").alias("s")
    )

    def cell(g: str, p: str):
        return F.max(
            F.when(
                (F.col("grp") == g) & (F.col("period") == p),
                F.col("s") / F.col("n"),
            )
        )

    wide = cells.agg(
        cell("treated", "pre").alias("t0"),
        cell("treated", "post").alias("t1"),
        cell("control", "pre").alias("c0"),
        cell("control", "post").alias("c1"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    return wide.select(
        "n_events",
        _pround(F.col("t0")).alias("treated_pre"),
        _pround(F.col("t1")).alias("treated_post"),
        _pround(F.col("c0")).alias("control_pre"),
        _pround(F.col("c1")).alias("control_post"),
        _pround(
            (F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0"))
        ).alias("did_estimate"),
    )


@register(
    "lineitem_price_index",
    oracle="""
WITH yearly AS (
  SELECT l_partkey, year(l_shipdate) AS y,
         sum(CAST(l_quantity AS DECIMAL(19, 2))) AS q,
         sum(CAST(l_extendedprice AS DECIMAL(19, 2))) AS spend
  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2
),
paired AS (
  SELECT b.l_partkey,
         CAST(b.spend AS DOUBLE) / CAST(b.q AS DOUBLE) AS p0,
         CAST(c.spend AS DOUBLE) / CAST(c.q AS DOUBLE) AS p1,
         CAST(b.q AS DOUBLE) AS q0
  FROM yearly b JOIN yearly c
    ON b.l_partkey = c.l_partkey AND b.y = 1995 AND c.y = 1996
)
SELECT count(*) AS n_parts_priced,
       floor(CAST(sum(CAST(floor(p1 * q0 * 1000000 + 0.5) / 1000000
                           AS DECIMAL(28, 6))) AS DOUBLE)
             / CAST(sum(CAST(floor(p0 * q0 * 1000000 + 0.5) / 1000000
                             AS DECIMAL(28, 6))) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS laspeyres_index
FROM paired
""",
)
def lineitem_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index 1995→1996: Σp₁q₀ / Σp₀q₀ over parts traded
    in BOTH years, with base-year quantities as the fixed basket — the
    inflation-style unit-price drift measure a procurement or pricing
    team tracks. Unit prices are spend/quantity from exact DECIMAL
    sums; each p·q₀ term is portable-rounded to 6dp and accumulated in
    DECIMAL (the order-independent-sum idiom), leaving ONE final
    division. The year self-join is parts-keyed."""
    li = Tables(spark, sf_dir).lineitem
    yearly = (
        li.filter(F.year("l_shipdate").isin(1995, 1996))
        .groupBy("l_partkey", F.year("l_shipdate").alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(19,2)")).alias("q"),
            F.sum(F.col("l_extendedprice").cast("decimal(19,2)")).alias(
                "spend"
            ),
        )
    )
    base = yearly.filter(F.col("y") == 1995).select(
        "l_partkey",
        (F.col("spend").cast("double") / F.col("q").cast("double")).alias(
            "p0"
        ),
        F.col("q").cast("double").alias("q0"),
    )
    cur = yearly.filter(F.col("y") == 1996).select(
        "l_partkey",
        (F.col("spend").cast("double") / F.col("q").cast("double")).alias(
            "p1"
        ),
    )
    paired = base.join(cur, "l_partkey")
    num = F.sum(
        _pround(F.col("p1") * F.col("q0")).cast("decimal(28,6)")
    ).cast("double")
    den = F.sum(
        _pround(F.col("p0") * F.col("q0")).cast("decimal(28,6)")
    ).cast("double")
    return paired.agg(
        F.count(F.lit(1)).alias("n_parts_priced"),
        _pround(num / den).alias("laspeyres_index"),
    )


@register(
    "sink_file_layout_audit",
    oracle="""
SELECT l_returnflag, 1 AS n_files, count(*) AS n_rows,
       CAST(sum(l_orderkey) AS BIGINT) AS key_sum
FROM lineitem GROUP BY l_returnflag
""",
)
def sink_file_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-layout audit for a partitioned sink: lineitem is written
    partitionBy(returnflag) with one task per flag (the
    repartition-by-partition-column compaction rule), then the audit
    re-reads and counts DISTINCT physical files per partition via
    input_file_name() — pinning n_files = 1 per flag, the layout the
    compaction planner promises (pipeline_compaction_planner plans it;
    this verifies it happened). A layout regression (skew split,
    missing repartition → 32 small files per flag) breaks the hash,
    not just a log line."""
    li = Tables(spark, sf_dir).lineitem.select("l_orderkey", "l_returnflag")
    out = op_tmpdir("sink_layout_")
    (
        li.repartition("l_returnflag")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(out)
    )
    back = spark.read.schema("l_orderkey bigint, l_returnflag string").parquet(
        out
    )
    # input_file_name() is non-deterministic to the analyzer: project it
    # into a column first, THEN aggregate over the materialized value
    tagged = back.withColumn("fname", F.input_file_name())
    return tagged.groupBy("l_returnflag").agg(
        F.countDistinct("fname").cast("int").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").cast("bigint").alias("key_sum"),
    )


@register(
    "text_batch_novelty_rate",
    oracle="""
WITH lake_grams AS (
  SELECT DISTINCT md5(array_to_string(
           list_slice(string_split(text, ' '), i, i + 2), ' ')) AS g
  FROM documents,
       unnest(generate_series(1, greatest(
         len(string_split(text, ' ')) - 2, 1))) s(i)
  WHERE doc_id % 3 <> 0
),
batch_grams AS (
  SELECT DISTINCT md5(array_to_string(
           list_slice(string_split(text, ' '), i, i + 2), ' ')) AS g
  FROM documents,
       unnest(generate_series(1, greatest(
         len(string_split(text, ' ')) - 2, 1))) s(i)
  WHERE doc_id % 3 = 0
)
SELECT (SELECT count(*) FROM batch_grams) AS batch_distinct_grams,
       (SELECT count(*) FROM batch_grams b
        WHERE NOT EXISTS (SELECT 1 FROM lake_grams l WHERE l.g = b.g))
         AS novel_grams,
       floor((SELECT CAST(count(*) AS DOUBLE) FROM batch_grams b
              WHERE NOT EXISTS (SELECT 1 FROM lake_grams l WHERE l.g = b.g))
             / (SELECT count(*) FROM batch_grams) * 1000000 + 0.5)
         / 1000000 AS novelty_rate
""",
)
def text_batch_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental information gain of an ingest batch: the share of
    the batch's distinct 3-gram shingles NEVER seen in the lake — near
    0 means the batch is re-hashed content not worth paying training
    compute for, complementing dedup_incremental_batch (which asks
    about whole documents; this measures partial novelty). Both sides
    reduce to DISTINCT md5 shingle digests before the anti-join, so
    text never shuffles and the join keys are 16 bytes — the lake-side
    relation is the same digest index the incremental dedup keeps."""
    d = Tables(spark, sf_dir).documents
    toks = F.split("text", " ")
    grams = F.expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)),"
        " i -> md5(concat_ws(' ', slice(toks, i, 3))))"
    )

    def gram_set(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("toks", toks)
            .select(F.explode(grams).alias("g"))
            .distinct()
        )

    lake = gram_set(d.filter(F.col("doc_id") % 3 != 0))
    batch = gram_set(d.filter(F.col("doc_id") % 3 == 0))
    novel = batch.join(lake, "g", "left_anti")
    n_batch = batch.agg(
        F.count(F.lit(1)).alias("batch_distinct_grams")
    )
    n_novel = novel.agg(F.count(F.lit(1)).alias("novel_grams"))
    return (
        n_batch.crossJoin(F.broadcast(n_novel))
        .select(
            "batch_distinct_grams",
            "novel_grams",
            _pround(
                F.col("novel_grams").cast("double")
                / F.col("batch_distinct_grams")
            ).alias("novelty_rate"),
        )
    )
