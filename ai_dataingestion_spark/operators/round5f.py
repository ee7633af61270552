"""Round-5 sixth wave (SURVEY.md §2.Q, continued): ANSI error-safe
arithmetic (try_*), permissive malformed-CSV ingestion with corrupt-
record capture, CUSUM changepoint detection on the daily shipment
series, and fine-grained error-burst detection over 5-minute buckets.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir


@register(
    "fn_try_safe_arith",
    oracle="""
SELECT doc_id,
       round(CAST(n_chars AS DOUBLE) / nullif(doc_id % 7, 0), 6)
         AS safe_div,
       TRY_CAST(lang AS INTEGER) AS lang_as_int,
       TRY_CAST(substring(text, 1, 3) AS INTEGER) AS prefix_as_int,
       CAST(n_chars AS DOUBLE) / nullif(doc_id % 7, 0) IS NULL
         AS div_was_unsafe
FROM documents
""",
)
def fn_try_safe_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe function family (§2.H completion): try_divide
    nulls out division-by-zero instead of raising under ANSI mode, and
    try_cast nulls unparseable strings — the semantics an ingest
    pipeline needs so one bad row degrades to NULL instead of failing a
    100 TB job. DuckDB twins: a/nullif(b,0) and TRY_CAST. Pure
    expression plan, no shuffle."""
    t = Tables(spark, sf_dir)
    div = F.try_divide(
        F.col("n_chars").cast("double"), (F.col("doc_id") % 7).cast("double")
    )
    return t.documents.select(
        "doc_id",
        F.round(div, 6).alias("safe_div"),
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.substring("text", 1, 3).try_cast("int").alias("prefix_as_int"),
        div.isNull().alias("div_was_unsafe"),
    )


@register(
    "scan_csv_malformed_permissive",
    oracle="""
SELECT count(*) AS n_rows,
       count(CASE WHEN doc_id % 17 = 0 THEN 1 END) AS n_corrupt,
       count(CASE WHEN doc_id % 17 <> 0 THEN 1 END) AS n_good,
       CAST(sum(CASE WHEN doc_id % 17 <> 0 THEN n_chars END) AS BIGINT)
         AS good_chars
FROM documents
""",
)
def scan_csv_malformed_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permissive CSV ingestion with corrupt-record capture: a CSV lake
    is written with every 17th row type-corrupted (its numeric column
    replaced by a word), then re-read under PERMISSIVE mode with an
    explicit schema + columnNameOfCorruptRecord — bad rows surface as
    NULL fields with the raw line preserved in the corrupt column
    instead of failing the scan. The dead-letter counts reconcile
    exactly with the corruption rule, which is what the oracle states.
    The r5 ingest-robustness check next to pipeline_dead_letter (which
    validates semantic rules; this one validates PARSE failures)."""
    out = op_tmpdir("csv_malformed_")
    d = Tables(spark, sf_dir).documents
    line = F.when(
        F.col("doc_id") % 17 == 0,
        F.concat_ws(",", F.col("doc_id"), F.lit("notanumber")),
    ).otherwise(F.concat_ws(",", F.col("doc_id"), F.col("n_chars")))
    d.select(line.alias("value")).write.mode("overwrite").text(out)
    back = (
        spark.read.schema("doc_id long, n_chars long, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    corrupt = F.col("_corrupt_record").isNotNull()
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(corrupt, 1)).alias("n_corrupt"),
        F.count(F.when(~corrupt, 1)).alias("n_good"),
        F.sum(F.when(~corrupt, F.col("n_chars"))).cast("bigint").alias(
            "good_chars"
        ),
    )


@register(
    "lineitem_quantity_cusum_shift",
    oracle="""
WITH daily AS (
  SELECT l_shipdate AS day, CAST(sum(l_quantity) AS DOUBLE) AS x
  FROM lineitem GROUP BY l_shipdate
),
stats AS (
  SELECT day, x, avg(x) OVER () AS mu, count(*) OVER () AS n_days
  FROM daily
),
cusum AS (
  SELECT day, n_days,
         sum(x - mu) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM stats
),
ranked AS (
  SELECT day AS shift_day, CAST(n_days AS BIGINT) AS n_days,
         round(c, 4) AS cusum_value,
         row_number() OVER (ORDER BY abs(c) DESC, day ASC) AS rn
  FROM cusum
)
SELECT shift_day, n_days, cusum_value FROM ranked WHERE rn = 1
""",
)
def lineitem_quantity_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily shipped-quantity series:
    the day where the cumulative deviation from the series mean peaks in
    magnitude — the classic level-shift locator of statistical process
    control. Aggregate-first: every window (mean, running sum, argmax
    rank) runs over the days-sized relation; output is exactly one row
    with a deterministic tie-break."""
    t = Tables(spark, sf_dir)
    daily = t.lineitem.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.sum("l_quantity").cast("double").alias("x")
    )
    w_all = Window.partitionBy()
    stats = daily.select(
        "day",
        "x",
        F.avg("x").over(w_all).alias("mu"),
        F.count(F.lit(1)).over(w_all).alias("n_days"),
    )
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = stats.select(
        "day",
        "n_days",
        F.sum(F.col("x") - F.col("mu")).over(w_run).alias("c"),
    )
    w_rank = Window.orderBy(F.abs(F.col("c")).desc(), F.asc("day"))
    return (
        cusum.select(
            F.col("day").alias("shift_day"),
            F.col("n_days").cast("bigint").alias("n_days"),
            F.round("c", 4).alias("cusum_value"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "events_error_burst_5min",
    oracle="""
WITH buckets AS (
  SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
         count(*) AS n_errors
  FROM events WHERE event_type = 'error'
  GROUP BY 1
),
stats AS (
  SELECT bucket, n_errors,
         avg(n_errors) OVER () AS mu,
         sqrt(avg(n_errors * n_errors) OVER ()
              - avg(n_errors) OVER () * avg(n_errors) OVER ()) AS sigma
  FROM buckets
)
SELECT bucket, n_errors,
       round((n_errors - mu) / sigma, 6) AS zscore
FROM stats
WHERE n_errors > mu + 3 * sigma
""",
)
def events_error_burst_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detection at 5-minute granularity: buckets whose
    error count exceeds mean + 3σ of the bucket distribution — the
    paging rule of an ingest monitor, and the fine-grained sibling of
    events_anomaly_zscore (daily). Buckets are integer epoch/300 keys
    (no timestamp-zone parity surface); σ is population form from raw
    power sums; all windows run over the buckets-sized relation."""
    t = Tables(spark, sf_dir)
    buckets = (
        t.events.filter(F.col("event_type") == "error")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 300).cast("bigint").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    w = Window.partitionBy()
    n = F.col("n_errors")
    stats = buckets.select(
        "bucket",
        "n_errors",
        F.avg(n).over(w).alias("mu"),
        F.sqrt(
            F.avg(n * n).over(w) - F.avg(n).over(w) * F.avg(n).over(w)
        ).alias("sigma"),
    )
    return stats.filter(
        n > F.col("mu") + 3 * F.col("sigma")
    ).select(
        "bucket",
        "n_errors",
        F.round((n - F.col("mu")) / F.col("sigma"), 6).alias("zscore"),
    )
