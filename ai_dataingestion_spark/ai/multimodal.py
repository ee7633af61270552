"""Multimodal record operators (§2.K + BASELINE mandate): text ⋈ vector
joins, per-language centroids, and binary-payload plumbing for image/audio
columns.

The container has no image/audio codecs, so the decode step in the binary
featurizer is a clearly-marked deterministic stub — but the Spark-side
plumbing (binary column, typed metadata struct, Arrow-batched mapInPandas,
output schema) is real and tested, which is the part that matters for the
100 TB pipeline shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "multimodal_join",
    oracle="""
WITH joined AS (
  SELECT d.lang, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
exploded AS (
  SELECT lang,
         CAST(unnest(embedding) AS DOUBLE) AS val,
         generate_subscripts(embedding, 1) AS pos
  FROM joined
)
SELECT lang, CAST(pos AS BIGINT) AS pos,
       round(avg(val), 6) AS centroid_val,
       count(*) AS n_vecs
FROM exploded
GROUP BY lang, pos
""",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified multimodal record: documents ⋈ embeddings on doc_id = vec_id,
    then a per-language embedding centroid via posexplode + avg per
    dimension (1-based positions to mirror SQL subscripts)."""
    t = Tables(spark, sf_dir)
    joined = t.documents.join(
        t.embeddings, F.col("doc_id") == F.col("vec_id")
    ).select("lang", "embedding")
    exploded = joined.select(
        "lang", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "lang",
        (F.col("pos0") + 1).cast("bigint").alias("pos"),
        F.col("val").cast("double").alias("val"),
    )
    return exploded.groupBy("lang", "pos").agg(
        F.round(F.avg("val"), 6).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("head_hex", StringType()),
        StructField("payload_sha", StringType()),
    ]
)


def _decode_payload(payload: bytes) -> bytes:
    """STUB: real deployments decode image/audio bytes here (PIL/ffmpeg are
    not in this container). The deterministic fake returns the payload
    unchanged so downstream feature shapes are stable and testable."""
    return payload


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched featurizer: one pandas frame per partition batch —
    the mapInPandas shape used for real decode/resize/frame-sample work."""
    import hashlib

    for pdf in batches:
        decoded = pdf["payload"].map(_decode_payload)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["meta"].map(lambda m: m["mime"]),
                "n_bytes": decoded.map(len).astype("int64"),
                "head_hex": decoded.map(lambda b: b[:8].hex()),
                "payload_sha": decoded.map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
            }
        )


@register(
    "multimodal_binary_features",
    oracle="""
SELECT doc_id,
       'application/octet-stream'       AS mime,
       CAST(strlen(text) AS BIGINT)     AS n_bytes,
       hex(encode(text[1:8]))           AS head_hex_upper,
       sha256(text)                     AS payload_sha
FROM documents
""",
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-modality plumbing: synthesize an opaque binary payload column
    (UTF-8 text bytes stand in for image bytes) + typed metadata struct,
    then featurize through Arrow-batched mapInPandas. Decode is stubbed
    deterministically (docstring in _decode_payload), so the byte-level
    features are oracle-checkable against the text the payload came from."""
    d = Tables(spark, sf_dir).documents
    binary = d.select(
        "doc_id",
        F.encode("text", "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("text").cast("bigint").alias("declared_size"),
        ).alias("meta"),
    )
    feats = binary.mapInPandas(_featurize_batches, _FEATURE_SCHEMA)
    # hex() is uppercase in DuckDB, lowercase in Python — normalize here.
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        F.upper("head_hex").alias("head_hex_upper"),
        "payload_sha",
    )
