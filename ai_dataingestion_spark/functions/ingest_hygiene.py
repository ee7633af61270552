"""§2.AJ round-14 block: ingest byte-hygiene — UTF-8 validation
(is_valid_utf8 / try_validate_utf8 / make_valid_utf8, Spark 4.0
SPARK-48162) and the digest family (md5 / sha2 / base64) proven
BIT-IDENTICAL across engines.

A 100 TB text ingest meets invalid bytes constantly (mojibake, truncated
multi-byte sequences, binary spills into text fields); the UTF-8 family is
the quarantine/repair surface, and content digests are how shards get
fingerprinted and deduped across systems — which only works if the digest
of the same text is the same BYTES everywhere. These ops pin both.

Oracle strategy for the validation ops: DuckDB cannot HOLD invalid UTF-8
(its VARCHAR validates on construction), so the corrupted rows exist only
on the Spark side — corruption follows a deterministic rule
(doc_id % 10 == 0 over non-null text) and the oracle computes the expected
outcomes ARITHMETICALLY from the same rule. For the digests the engines
compute the same functions on the same bytes and the hex/base64 STRINGS
are compared directly (Spark MIME-chunks long base64 with CRLF every 76
chars — stripped before comparison; DuckDB emits unchunked).

Scale posture: pure JVM expressions in the scan stage (encode/concat/
cast/validate/digest per row); zero shuffles beyond the final aggregate,
zero Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "fn_utf8_validation_family",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN doc_id % 10 = 0 AND text IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
       CAST(sum(CASE WHEN doc_id % 10 = 0 AND text IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_try_nulled,
       CAST(sum(CASE WHEN doc_id % 10 = 0 AND text IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired
FROM documents
GROUP BY lang
""",
)
def fn_utf8_validation_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic byte corruption (0xFF appended to every 10th doc's
    encoded text — an invalid UTF-8 byte in any position) pushed through
    the full validation family: is_valid_utf8 must flag EXACTLY the
    corrupted rows, try_validate_utf8 must null exactly them (the
    quarantine path), and make_valid_utf8 must CHANGE exactly them (the
    repair path substitutes U+FFFD; intact text must pass through
    untouched, pinned by comparing against the original). The oracle
    derives all three counts from the corruption rule itself — DuckDB
    never sees an invalid byte (its VARCHAR can't hold one), which is
    itself the portability lesson the op documents. NULL text corrupts to
    NULL (concat of NULL) and stays out of every count on both engines."""
    t = Tables(spark, sf_dir)
    corrupt = F.when(
        (F.col("doc_id") % 10 == 0),
        F.concat(F.encode("text", "utf-8"), F.lit(b"\xff")),
    ).otherwise(F.encode("text", "utf-8"))
    d = t.documents.withColumn("cs", corrupt.cast("string"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(~F.expr("is_valid_utf8(cs)"), 1).otherwise(0)
        ).cast("bigint").alias("n_invalid"),
        F.sum(
            F.when(
                F.expr("try_validate_utf8(cs)").isNull()
                & F.col("cs").isNotNull(),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_try_nulled"),
        # NULL text corrupts to NULL; make_valid_utf8(NULL) is NULL and
        # the null-safe comparison reads unchanged — no special-casing
        F.sum(
            F.when(
                ~F.expr("make_valid_utf8(cs)").eqNullSafe(F.col("text")), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_repaired"),
    )


@register(
    "fn_digest_family",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_md5,
       CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_sha,
       min(md5(text)) AS min_md5,
       max(sha256(text)) AS max_sha,
       count(*) AS n_b64_intact,
       min(to_base64(encode(text))) AS min_b64
FROM documents
WHERE text IS NOT NULL
GROUP BY lang
""",
)
def fn_digest_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine digest identity: md5 and sha2-256 hex strings computed
    on the SAME UTF-8 bytes must be byte-equal between Spark and DuckDB
    (min/max digests compare the actual hex, distinct counts pin
    injectivity on this corpus), and base64 must round-trip
    (unbase64 ∘ base64 == identity, counted per row) AND match DuckDB's
    encoding after stripping Spark's MIME CRLF chunking (inserted every
    76 chars on long payloads — the one wire difference, normalized here
    because it IS the documented portability trap). Digest equality is
    what makes shard fingerprints and dedup keys portable across the
    lake's engines."""
    t = Tables(spark, sf_dir)
    bin_text = F.encode("text", "utf-8")
    b64 = F.base64(bin_text)
    d = t.documents.filter(F.col("text").isNotNull()).select(
        "lang", "text",
        F.md5(bin_text).alias("m"),
        F.sha2(bin_text, 256).alias("h"),
        F.regexp_replace(b64, "[\\r\\n]", "").alias("b64_clean"),
        F.decode(F.unbase64(b64), "utf-8").alias("rt"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("m").alias("n_md5"),
        F.countDistinct("h").alias("n_sha"),
        F.min("m").alias("min_md5"),
        F.max("h").alias("max_sha"),
        F.sum(
            F.when(F.col("rt").eqNullSafe(F.col("text")), 1).otherwise(0)
        ).cast("bigint").alias("n_b64_intact"),
        F.min("b64_clean").alias("min_b64"),
    )
