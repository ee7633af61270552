# -*- coding: utf-8 -*-
"""Round-6 fifty-second wave (SURVEY.md §2.R): ingestion hardening —
web-crawl URL canonicalization, heterogeneous timestamp parsing, UTF-8
char-vs-byte semantics, GROUP BY ALL, and INTERVAL-literal window frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables, register_views

# Synthesized crawl URLs: deterministic host/page from doc_id plus the
# three classic canonicalization hazards — uppercase scheme/host, tracking
# query params (utm_*, ref=), and fragments.
_URL_SYN_SPARK = """
SELECT concat('HTTPS://Ex', CAST(doc_id % 50 AS STRING), '.ORG/Page/',
  CAST(doc_id % 200 AS STRING),
  CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&utm_campaign=y'
       WHEN doc_id % 3 = 1 THEN '?ref=abc' ELSE '' END,
  CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END) AS url FROM documents"""

_URL_CANON_TEMPLATE = """
SELECT count(*) AS n_urls, count(DISTINCT url) AS n_raw_distinct,
       count(DISTINCT canon) AS n_canon_distinct,
       CAST(round(1.0 - count(DISTINCT canon) * 1.0 / count(DISTINCT url), 4)
            AS DOUBLE) AS dup_rate
FROM (
  SELECT url,
    concat(lower(regexp_extract(url, '^[Hh][Tt][Tt][Pp][Ss]?://([^/]+)', 1)),
           regexp_extract(regexp_replace(url, '#.*$', ''),
                          '^[^:]+://[^/]+([^?#]*)', 1),
           CASE WHEN {STRIP} <> ''
                THEN concat('?', {STRIP})
                ELSE '' END) AS canon
  FROM ({SYN}) u) t"""

_STRIP_SPARK = (
    "regexp_replace(regexp_replace(regexp_extract(url, '\\\\?([^#]*)', 1), "
    "'(^|&)(utm_[^&]*|ref=[^&]*)', ''), '^&', '')"
)
# DuckDB regexp_replace replaces only the FIRST match without the 'g'
# flag (Spark replaces all) — the round-6 prototype caught 367 vs 200
# canonical URLs before the flag was added.
_STRIP_DUCK = (
    "regexp_replace(regexp_replace(regexp_extract(url, '\\?([^#]*)', 1), "
    "'(^|&)(utm_[^&]*|ref=[^&]*)', '', 'g'), '^&', '')"
)


@register(
    "text_url_canonicalize_dedup",
    oracle=_URL_CANON_TEMPLATE.replace("{STRIP}", _STRIP_DUCK).replace(
        "{SYN}", _URL_SYN_SPARK.replace("AS STRING", "AS VARCHAR")
    ),
)
def text_url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-crawl URL canonicalization — the first dedup stage of a crawl
    ingestion pipeline (CommonCrawl-style): lowercase the scheme+host,
    drop fragments, strip tracking params (utm_*, ref=) while preserving
    meaningful query strings, then report raw-vs-canonical distinct
    counts and the implied URL-level dup rate. All regexp expressions are
    JVM-side codegen; the aggregate is one pass. The synthesized URLs (no
    URL column in the corpus) embed the three classic hazards with known
    cardinality: 500 raw variants collapse to exactly 200 canonical
    (host x page residues). Dialect trap pinned by the oracle: DuckDB's
    regexp_replace needs the 'g' flag to match Spark's replace-all
    default — without it the canonical count read 367, not 200."""
    register_views(spark, sf_dir)
    return spark.sql(
        _URL_CANON_TEMPLATE.replace("{STRIP}", _STRIP_SPARK).replace(
            "{SYN}", _URL_SYN_SPARK
        )
    )


@register(
    "fn_multiformat_timestamp_parse",
    oracle="""
SELECT fmt_class, count(*) AS n,
       CAST(CAST(min(parsed) AS TIMESTAMP) AS VARCHAR) AS min_ts,
       CAST(CAST(max(parsed) AS TIMESTAMP) AS VARCHAR) AS max_ts FROM (
  SELECT CASE WHEN event_id % 3 = 0 THEN 'iso'
              WHEN event_id % 3 = 1 THEN 'us' ELSE 'epoch' END AS fmt_class,
         coalesce(try_strptime(raw, '%Y-%m-%dT%H:%M:%S'),
                  try_strptime(raw, '%m/%d/%Y %H:%M:%S'),
                  CASE WHEN regexp_matches(raw, '^[0-9]+$')
                       THEN CAST(to_timestamp(CAST(raw AS BIGINT)) AS TIMESTAMP)
                  END) AS parsed
  FROM (SELECT event_id,
      CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
           WHEN event_id % 3 = 1 THEN strftime(ts, '%m/%d/%Y %H:%M:%S')
           ELSE CAST(CAST(epoch(ts) AS BIGINT) AS VARCHAR) END AS raw
    FROM events) r) p
GROUP BY 1
""",
)
def fn_multiformat_timestamp_parse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Heterogeneous timestamp ingestion: raw strings arriving in three
    wire formats (ISO-8601, US slash-dates, unix epoch seconds) parsed by
    a try_to_timestamp coalesce cascade — each format attempt nulls out
    instead of failing the job (ANSI-safe), the epoch branch is guarded
    by a digits-only regex so it can't mis-eat date strings, and every
    row must land in exactly one branch. The raw strings are synthesized
    from events.ts at second precision so the round-trip is exact and the
    per-format min/max pin both the parse and the format-classifier. All
    JVM-side; 3-row output. Oracle: DuckDB's try_strptime cascade (its
    epoch parse returns TIMESTAMPTZ — cast back to naive, the second
    dialect trap this wave pins)."""
    t = Tables(spark, sf_dir)
    raw = F.when(
        F.col("event_id") % 3 == 0,
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
    ).when(
        F.col("event_id") % 3 == 1, F.date_format("ts", "MM/dd/yyyy HH:mm:ss")
    ).otherwise(F.unix_timestamp("ts").cast("bigint").cast("string"))
    fmt_class = (
        F.when(F.col("event_id") % 3 == 0, F.lit("iso"))
        .when(F.col("event_id") % 3 == 1, F.lit("us"))
        .otherwise(F.lit("epoch"))
    )
    parsed = F.coalesce(
        F.expr("try_to_timestamp(raw, \"yyyy-MM-dd'T'HH:mm:ss\")"),
        F.expr("try_to_timestamp(raw, 'MM/dd/yyyy HH:mm:ss')"),
        F.expr(
            "CASE WHEN raw rlike '^[0-9]+$' "
            "THEN timestamp_seconds(CAST(raw AS BIGINT)) END"
        ),
    )
    return (
        t.events.select(fmt_class.alias("fmt_class"), raw.alias("raw"))
        .select("fmt_class", parsed.alias("parsed"))
        .groupBy("fmt_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("parsed").cast("string").alias("min_ts"),
            F.max("parsed").cast("string").alias("max_ts"),
        )
    )


# 6 two-byte (Greek) + 6 three-byte (CJK) characters: byte lengths vary,
# char lengths don't — exactly the divergence the operator pins.
_MB = "αβγδεζ日本語中文字"


@register(
    "fn_utf8_multibyte_semantics",
    oracle=f"""
SELECT CAST(sum(length(s)) AS BIGINT) AS total_chars,
       CAST(sum(strlen(s)) AS BIGINT) AS total_bytes,
       count(DISTINCT substr(s, 2, 2)) AS distinct_mid
FROM (SELECT 'a' || substr('{_MB}', CAST(1 + c_custkey % 12 AS INTEGER), 1)
          || substr('{_MB}', CAST(1 + (c_custkey * 5) % 12 AS INTEGER), 1)
          || 'z' AS s FROM customer) t
""",
)
def fn_utf8_multibyte_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 char-vs-byte semantics pinned: strings mixing 1/2/3-byte
    characters (synthesized by CHARACTER-indexed substr picks from a
    mixed Greek/CJK alphabet — the corpus is pure ASCII) must report
    length() in characters, octet_length() in bytes, and substr() must
    slice characters, never split a multibyte sequence. This is the
    contract every downstream text operator (chunkers, token counters,
    fingerprints) silently relies on; an engine or storage layer that
    byte-slices would corrupt text and diverge here. Oracle: DuckDB
    (strlen = its byte length function). Measured: 600 chars / 1046
    bytes at sf0.001 — unequal by construction."""
    t = Tables(spark, sf_dir)
    s = F.concat(
        F.lit("a"),
        F.expr(f"substr('{_MB}', CAST(1 + c_custkey % 12 AS INT), 1)"),
        F.expr(f"substr('{_MB}', CAST(1 + (c_custkey * 5) % 12 AS INT), 1)"),
        F.lit("z"),
    )
    return t.customer.select(s.alias("s")).agg(
        F.sum(F.length("s")).cast("bigint").alias("total_chars"),
        F.sum(F.octet_length("s")).cast("bigint").alias("total_bytes"),
        F.count_distinct(F.expr("substr(s, 2, 2)")).alias("distinct_mid"),
    )


_GBA_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
         AS rev
FROM orders GROUP BY ALL
"""


@register("sql_group_by_all", oracle=_GBA_SQL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / DuckDB shared syntax): the analyst
    shorthand that infers grouping keys from the non-aggregate select
    items. Semantically identical to the explicit GROUP BY — Catalyst
    resolves it at analysis time, so the physical plan is the ordinary
    partial-aggregable hash aggregate. Both engines run the identical
    statement."""
    register_views(spark, sf_dir)
    return spark.sql(_GBA_SQL)


_IVFRAME_SQL = """
SELECT o_custkey, CAST(CAST(o_orderdate AS DATE) AS {STR}) AS od,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(20,6))) OVER (
         PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS TIMESTAMP)
         RANGE BETWEEN {IV} PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS spend_7d
FROM orders
"""


@register(
    "win_range_interval_frame",
    oracle=_IVFRAME_SQL.replace("{IV}", "INTERVAL 7 DAY").replace(
        "{STR}", "VARCHAR"
    ),
)
def win_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame with an INTERVAL literal: trailing
    7-day spend per customer, `RANGE BETWEEN INTERVAL '7' DAY PRECEDING
    AND CURRENT ROW` over the order timestamp. Unlike a ROWS frame this
    is value-based — gaps and same-day multiples are handled by the time
    axis, not row counts — and unlike the existing numeric rangeBetween
    operators (win_moving_range, round6m/o) it exercises the calendar
    INTERVAL boundary type end-to-end. Per-customer partitions keep the
    window parallel (no global sort); frame evaluation is the standard
    sliding-sum pass. Oracle: DuckDB runs the identical statement
    (INTERVAL 7 DAY spelling)."""
    register_views(spark, sf_dir)
    return spark.sql(
        _IVFRAME_SQL.replace("{IV}", "INTERVAL '7' DAY").replace(
            "{STR}", "STRING"
        )
    )
