"""Round-6 fifty-sixth wave (SURVEY.md §2.R): Spark 4 extensibility and
streaming-drain surface — the Python Data Source API, the built-in XML
format round-trip, and Trigger.AvailableNow backlog drains.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir

_PYDS_N = 10_000
_PYDS_PARTS = 8


@register(
    "source_python_datasource",
    oracle=f"""
WITH g AS (SELECT unnest(generate_series(0, {_PYDS_N - 1})) AS k)
SELECT count(*) AS n, CAST(sum(k * k) AS BIGINT) AS sum_sq,
       count(DISTINCT k % {_PYDS_PARTS}) AS n_partitions_touched
FROM g
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A custom connector through Spark 4's Python Data Source API
    (SPARK-44076): a DataSource subclass registered by name, whose
    reader declares 8 InputPartitions and yields rows per partition —
    the extensibility path for ingesting from systems Spark has no
    built-in connector for, WITHOUT touching the JVM. Partition planning
    happens on the driver (the partitions() list); row generation runs
    in executor Python workers in parallel, one task per InputPartition,
    so a real connector shards its remote scan exactly like this. The
    deterministic synthetic payload (k, k²) strided across partitions
    lets the oracle recompute content arithmetically and the
    partition-residue count prove every shard contributed. Registration
    is idempotent per session (re-register overwrites)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class RangeSquares(DataSource):
        @classmethod
        def name(cls) -> str:
            return "range_squares"

        def schema(self) -> str:
            return "k bigint, sq bigint"

        def reader(self, schema):
            return _SquareReader(self.options)

    class _SquareReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 100))
            self.parts = int(options.get("parts", 4))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, part):
            for k in range(part.value, self.n, self.parts):
                yield (k, k * k)

    spark.dataSource.register(RangeSquares)
    df = (
        spark.read.format("range_squares")
        .option("n", str(_PYDS_N))
        .option("parts", str(_PYDS_PARTS))
        .load()
    )
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sq").cast("bigint").alias("sum_sq"),
        F.count_distinct(F.col("k") % _PYDS_PARTS).alias(
            "n_partitions_touched"
        ),
    )


@register(
    "scan_xml_roundtrip",
    oracle="""
SELECT o_orderstatus AS status, count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
         AS rev
FROM orders WHERE o_orderkey % 5 = 0 GROUP BY 1
""",
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in XML data source (Spark 4.0, SPARK-44265 — the
    spark-xml package folded into core): a deterministic orders slice is
    WRITTEN as XML with rowTag=order and read back with an explicit
    schema, then aggregated — the legacy B2B feed round-trip (XML is
    still the wire format of EDI/finance feeds a 100 TB ingestion layer
    must accept). The reader splits on row tags across files and infers
    nothing here (explicit schema), so the scan parallelizes like any
    text-backed source. Oracle: the same aggregate on the source
    relation — a lossy XML round-trip breaks counts or money."""
    t = Tables(spark, sf_dir)
    out = op_tmpdir("xml_rt_")
    sliced = t.orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    sliced.write.format("xml").option("rowTag", "order").mode(
        "overwrite"
    ).save(out)
    back = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .schema("o_orderkey bigint, o_orderstatus string, o_totalprice double")
        .load(out)
    )
    return back.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2)
        .cast("double")
        .alias("rev"),
    )


@register(
    "stream_available_now_drain",
    oracle="""
SELECT o_orderstatus AS status, count(*) AS n
FROM orders GROUP BY 1
""",
)
def stream_available_now_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger.AvailableNow backlog drain: a two-batch file backlog is
    processed by a STREAMING query that reads everything currently
    available in rate-limited micro-batches and then STOPS — the
    idempotent catch-up mode a scheduled ingestion job uses instead of
    an always-on stream (same checkpoint, same exactly-once file sink;
    re-running after new arrivals drains only the delta). The drained
    sink is read back and aggregated; equality with the source proves
    no batch was lost or doubled across micro-batch boundaries. Oracle:
    the source aggregate."""
    t = Tables(spark, sf_dir)
    orders = t.orders
    root = op_tmpdir("anow_")
    src = os.path.join(root, "src")
    ck = os.path.join(root, "ck")
    out = os.path.join(root, "out")
    shutil.rmtree(src, ignore_errors=True)
    orders.filter(F.col("o_orderkey") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "batch1"))
    orders.filter(F.col("o_orderkey") % 2 == 1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "batch2"))
    stream = (
        spark.readStream.schema(orders.schema)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # a hung drain must fail loudly, not aggregate a partial sink as if
        # it were the full backlog (ADVICE r6)
        q.stop()
        raise TimeoutError("AvailableNow drain did not finish within 300s")
    os.makedirs(out, exist_ok=True)  # zero-row drain: sink dir may be bare
    back = spark.read.schema(orders.schema).parquet(out)
    return back.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n")
    )
