"""§2.J completion (round 13): mapInArrow — the Arrow-NATIVE batch
iterator API (SPARK-40896).

mapInPandas pays an Arrow→pandas→Arrow conversion on every batch;
mapInArrow hands the Python worker the raw ``pyarrow.RecordBatch`` stream
and takes RecordBatches back — zero pandas materialization, columnar
compute end-to-end. For a pure columnar kernel (here: codepoint-length via
``pyarrow.compute.utf8_length``) that removes the dominant per-batch cost
of the Python path, which is exactly the overhead profile a 100 TB text
pass cares about. The worker does NO row iteration: one vectorized
compute call per batch, per-partition parallelism unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import load_table


def _arrow_charlen(batches):
    """RecordBatch-in / RecordBatch-out: append a codepoint-length column
    computed with pyarrow.compute — no pandas anywhere."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("lang"),
                # utf8_length emits int32; the declared output schema says
                # int64 and the JVM ArrowColumnVector reads vectors by the
                # DECLARED type (no implicit widening across the boundary)
                pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            ],
            names=["lang", "n_chars_arrow"],
        )


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       CAST(coalesce(sum(length(text)), 0) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow columnar featurizer: the per-language character census
    computed by an Arrow-native worker (pyarrow.compute.utf8_length over
    the raw RecordBatch stream — no pandas conversion), then aggregated
    JVM-side. Oracle: the same census as plain SQL length()/sum —
    codepoint semantics agree across Spark length(), pyarrow utf8_length
    and DuckDB length() (the unicode tier's CJK/emoji/combining fragments
    exercise exactly that agreement). NULL text yields a NULL length that
    SUM skips on both engines. The Python stage is a streaming
    batch-to-batch map: constant memory per worker, no shuffle of its own;
    the groupBy shuffles only (lang, partial sums)."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    mapped = docs.mapInArrow(
        _arrow_charlen, "lang string, n_chars_arrow long"
    )
    return mapped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_chars_arrow"), F.lit(0))
        .cast("bigint")
        .alias("sum_chars"),
    )
