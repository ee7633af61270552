"""Round-5 nineteenth wave (SURVEY.md §2.Q, continued): array set
operations, binaryFile ingestion, ISO week/year calendar parity, and
an equi-depth (quantile-binned) histogram.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir


@register(
    "fn_array_set_ops",
    oracle="""
WITH halves AS (
  SELECT doc_id,
         list_slice(string_split(text, ' '), 1,
                    len(string_split(text, ' ')) // 2) AS a,
         list_slice(string_split(text, ' '),
                    len(string_split(text, ' ')) // 2 + 1,
                    len(string_split(text, ' '))) AS b
  FROM documents
)
SELECT doc_id,
       len(list_distinct(list_concat(a, b)))                  AS n_union,
       len(list_distinct(list_filter(a,
             x -> list_contains(b, x))))                      AS n_intersect,
       len(list_distinct(list_filter(a,
             x -> NOT list_contains(b, x))))                  AS n_a_only,
       len(list_filter(a, x -> list_contains(b, x))) > 0      AS overlaps,
       CAST(coalesce(list_position(a, 'data'), 0) AS BIGINT)  AS pos_data
FROM halves
""",
)
def fn_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array SET operations (§2.H array-family completion): union /
    intersect / difference cardinalities, overlap test, and first-
    position lookup between the two token halves of each document —
    the building blocks under every shingle/containment operator,
    pinned here directly. Spark's dedicated builtins (array_union,
    array_intersect, array_except, arrays_overlap, array_position) ≡
    DuckDB's list_distinct/list_filter/list_contains spellings;
    outputs are scalar cardinalities, so no array ordering ever
    crosses the compare harness."""
    d = Tables(spark, sf_dir).documents.withColumn("toks", F.split("text", " "))
    half = (F.size("toks") / 2).cast("int")
    halved = d.select(
        "doc_id",
        F.slice("toks", 1, half).alias("a"),
        F.expr("slice(toks, int(size(toks) / 2) + 1, size(toks))").alias("b"),
    )
    return halved.select(
        "doc_id",
        F.size(F.array_union("a", "b")).cast("bigint").alias("n_union"),
        F.size(F.array_intersect("a", "b")).cast("bigint").alias("n_intersect"),
        F.size(F.array_except("a", "b")).cast("bigint").alias("n_a_only"),
        F.arrays_overlap("a", "b").alias("overlaps"),
        F.coalesce(F.array_position("a", "data"), F.lit(0))
        .cast("bigint")
        .alias("pos_data"),
    )


@register(
    "scan_binary_files",
    oracle="""
WITH payloads AS (
  SELECT r_name, 'ASSET:' || r_name || ':' || CAST(r_regionkey AS VARCHAR)
           AS body
  FROM region
)
SELECT count(*) AS n_files,
       CAST(sum(octet_length(encode(body))) AS BIGINT) AS total_bytes,
       md5(string_agg(md5(body), '|' ORDER BY md5(body))) AS digest_of_digests
FROM payloads
""",
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile ingestion — the REAL entry point for multimodal
    assets: each file lands as (path, modificationTime, length,
    content: binary) with no decoding. Five deterministic payload
    files are staged and read back through the binaryFile source; the
    comparison covers file count, total byte length, and an
    order-canonicalized digest-of-digests over the CONTENT bytes —
    path and mtime (host-dependent) are deliberately excluded from the
    compared schema. Pairs with multimodal_payload_dedup (dedup after
    this ingest) and the mapInPandas featurizers (decode after this
    ingest)."""
    r = Tables(spark, sf_dir).region.select("r_name", "r_regionkey").collect()
    out = op_tmpdir("scan_binary_")
    for row in r:  # 5 rows — bounded driver-side staging
        body = f"ASSET:{row['r_name']}:{row['r_regionkey']}".encode()
        with open(os.path.join(out, f"{row['r_name']}.bin"), "wb") as f:
            f.write(body)
    files = spark.read.format("binaryFile").load(out)
    return files.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.octet_length("content")).cast("bigint").alias("total_bytes"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list(F.md5("content"))), "|")
        ).alias("digest_of_digests"),
    )


@register(
    "fn_iso_week_parity",
    oracle="""
WITH tagged AS (
  SELECT year(CAST(o_orderdate AS DATE)
              + CAST(4 - isodow(o_orderdate) AS INT)) AS iso_year,
         weekofyear(o_orderdate) AS iso_week
  FROM orders
)
SELECT iso_year, iso_week, count(*) AS n
FROM tagged GROUP BY iso_year, iso_week
""",
)
def fn_iso_week_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 week/year calendar parity: orders counted per
    (iso_year, iso_week), where the ISO YEAR is derived explicitly as
    year(date + (4 − isodow) days) — the Thursday rule — because
    Jan 1/Dec 31 belong to the NEIGHBORING iso year whenever the week
    straddles the boundary (this corpus spans 1995-2001, so those edge
    weeks are exercised for real). Calling year() next to weekofyear()
    is the classic silently-wrong weekly rollup; this operator pins
    the correct derivation in both engines (Spark weekday()+1 ≡ DuckDB
    isodow)."""
    o = Tables(spark, sf_dir).orders
    d = F.to_date("o_orderdate")
    isodow = F.weekday(d) + 1
    iso_year = F.year(F.date_add(d, (F.lit(4) - isodow)))
    return (
        o.select(
            iso_year.alias("iso_year"),
            F.weekofyear(d).alias("iso_week"),
        )
        .groupBy("iso_year", "iso_week")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_equidepth_histogram",
    oracle="""
WITH cuts AS (
  SELECT CAST(quantile_cont(c_acctbal, 0.1) AS DOUBLE) AS q1,
         CAST(quantile_cont(c_acctbal, 0.2) AS DOUBLE) AS q2,
         CAST(quantile_cont(c_acctbal, 0.3) AS DOUBLE) AS q3,
         CAST(quantile_cont(c_acctbal, 0.4) AS DOUBLE) AS q4,
         CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE) AS q5,
         CAST(quantile_cont(c_acctbal, 0.6) AS DOUBLE) AS q6,
         CAST(quantile_cont(c_acctbal, 0.7) AS DOUBLE) AS q7,
         CAST(quantile_cont(c_acctbal, 0.8) AS DOUBLE) AS q8,
         CAST(quantile_cont(c_acctbal, 0.9) AS DOUBLE) AS q9
  FROM customer
)
SELECT bin, count(*) AS n FROM (
  SELECT CAST(
           (CASE WHEN c_acctbal > q1 THEN 1 ELSE 0 END) +
           (CASE WHEN c_acctbal > q2 THEN 1 ELSE 0 END) +
           (CASE WHEN c_acctbal > q3 THEN 1 ELSE 0 END) +
           (CASE WHEN c_acctbal > q4 THEN 1 ELSE 0 END) +
           (CASE WHEN c_acctbal > q5 THEN 1 ELSE 0 END) +
           (CASE WHEN c_acctbal > q6 THEN 1 ELSE 0 END) +
           (CASE WHEN c_acctbal > q7 THEN 1 ELSE 0 END) +
           (CASE WHEN c_acctbal > q8 THEN 1 ELSE 0 END) +
           (CASE WHEN c_acctbal > q9 THEN 1 ELSE 0 END) AS BIGINT) AS bin
  FROM customer CROSS JOIN cuts
) GROUP BY bin
""",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram: bin edges are the deciles of the data
    itself, so every bin holds ~10% of rows — the histogram query
    optimizers and drift monitors actually keep (equi-width bins, as
    in agg_histogram_bins, starve on skewed data; equi-depth adapts).
    The 9 decile cuts are one broadcast row; each value's bin is the
    count of cuts it exceeds — pure comparisons against bit-identical
    interpolated quantiles, no division, no rounding surface. Two
    passes: quantiles, then classify+count."""
    c = Tables(spark, sf_dir).customer
    cuts = c.agg(
        *[
            F.expr(
                f"percentile_cont({q / 10}) WITHIN GROUP (ORDER BY c_acctbal)"
            ).alias(f"q{q}")
            for q in range(1, 10)
        ]
    )
    bin_expr = sum(
        F.when(F.col("c_acctbal") > F.col(f"q{q}"), 1).otherwise(0)
        for q in range(1, 10)
    ).cast("bigint")
    return (
        c.crossJoin(F.broadcast(cuts))
        .select(bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
