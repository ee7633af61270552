"""§2.H completion (round 14): the regex POSITION family —
regexp_count / regexp_instr / regexp_substr (Spark 3.5+, SPARK-43886).

fn_regex covers match/extract/replace and the §2.K text ops lean on
regexp_extract_all; these three — how many matches, WHERE the first one
starts (1-based), and what it is — were the remaining uncovered regex
expressions. DuckDB has no regexp_instr, so the oracle derives the
position from first principles: the length of the prefix before the
first match (regexp_split_to_array's first element) plus one — which is
also a cross-engine pin that both regex engines (Java util.regex vs RE2)
agree on match BOUNDARIES for this pattern class, not just match counts.

Scale posture: JVM regex expressions in the scan's codegen stage; one
aggregate shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

_PAT = "[aeiou]{2,}"  # vowel runs: ASCII-only matches even on unicode text


@register(
    "fn_regexp_position_family",
    oracle=f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '{_PAT}'))) AS BIGINT)
         AS total_matches,
       CAST(sum(CASE WHEN text IS NULL THEN NULL
                     WHEN regexp_matches(text, '{_PAT}')
                     THEN length(regexp_split_to_array(text, '{_PAT}')[1]) + 1
                     ELSE 0 END) AS BIGINT) AS sum_first_pos,
       CAST(sum(CASE WHEN regexp_matches(text, '{_PAT}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_with_match,
       min(CASE WHEN regexp_matches(text, '{_PAT}')
                THEN regexp_extract(text, '{_PAT}') END) AS min_match
FROM documents
GROUP BY lang
""",
)
def fn_regexp_position_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count / regexp_instr / regexp_substr over the documents
    corpus on a vowel-run pattern, aggregated per lang. sum_first_pos is
    the load-bearing column: it equals the oracle's prefix-length
    derivation only if both regex engines place the FIRST match at the
    same offset in every document (positions, not just counts).
    regexp_substr's no-match NULL is quarantined identically on the
    oracle side (DuckDB regexp_extract returns '' there, guarded by the
    CASE); min_match is ASCII by pattern construction, so string ordering
    is collation-safe on the unicode tier."""
    t = Tables(spark, sf_dir)
    pat = F.lit(_PAT)
    d = t.documents.select(
        "lang",
        F.regexp_count("text", pat).alias("cnt"),
        F.regexp_instr("text", pat).alias("pos"),
        F.regexp_substr("text", pat).alias("sub"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("cnt").cast("bigint").alias("total_matches"),
        F.sum("pos").cast("bigint").alias("sum_first_pos"),
        F.sum(F.when(F.col("cnt") > 0, 1).otherwise(0)).cast("bigint")
        .alias("n_with_match"),
        F.min("sub").alias("min_match"),
    )
