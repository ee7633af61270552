"""§2.A Scans / sources / sinks.

Format round-trip operators write to a per-invocation temp directory and
read back through the matching reader — the read path (explicit schema,
header/null handling) is the thing under test, and the re-read result is
compared against the DuckDB view of the original parquet, so a lossy
round-trip fails the oracle.

Scale notes: sinks repartition to a target file count before writing (the
small-files problem is the #1 operational failure of 100 TB ingestion);
partitioned writes use partitionBy on a low-cardinality natural key so
downstream reads get partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.tmpdirs import op_tmpdir
from ai_dataingestion_spark.registry import SCHEMAS, Tables, load_table


@register(
    "scan_parquet",
    oracle="SELECT * FROM nation",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-schema parquet scan — the registry primitive every other
    operator builds on (registry.py, incl. the events NANOS shim)."""
    return load_table(spark, sf_dir, "nation")


@register(
    "scan_csv",
    oracle="SELECT * FROM nation",
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion with explicit schema + header: parquet → csv → read
    back. Null round-trip is exercised via nullValue on both sides."""
    out = op_tmpdir("scan_csv_")
    nation = load_table(spark, sf_dir, "nation")
    nation.coalesce(1).write.mode("overwrite").option("header", True).option(
        "nullValue", "\\N"
    ).csv(out)
    return spark.read.schema(SCHEMAS["nation"]).option("header", True).option(
        "nullValue", "\\N"
    ).csv(out)


@register(
    "scan_json",
    oracle="SELECT * FROM nation",
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL ingestion with explicit schema + corrupt-record column."""
    from pyspark.sql.types import StringType, StructField, StructType

    out = op_tmpdir("scan_json_")
    nation = load_table(spark, sf_dir, "nation")
    nation.coalesce(1).write.mode("overwrite").json(out)
    # copy the fields — StructType.add would mutate the shared registry schema
    schema = StructType(
        list(SCHEMAS["nation"].fields)
        + [StructField("_corrupt_record", StringType(), True)]
    )
    return (
        spark.read.schema(schema)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
        .select(*[f.name for f in SCHEMAS["nation"].fields])
    )


@register(
    "scan_text",
    # the line-oriented text format can only carry non-null, newline-free
    # payloads: a NULL has no line representation and an embedded newline
    # splits into several rows on read-back — both are out of the
    # format's domain, stated identically on both sides
    oracle="""
SELECT text AS value FROM documents
WHERE text IS NOT NULL AND strpos(text, chr(10)) = 0
""",
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-line text ingestion (raw-document reader): one row per line."""
    out = op_tmpdir("scan_text_")
    docs = Tables(spark, sf_dir).documents
    writable = docs.where(
        F.col("text").isNotNull() & ~F.col("text").contains("\n")
    )
    writable.select("text").coalesce(1).write.mode("overwrite").text(out)
    return spark.read.text(out)


@register(
    "sink_parquet_part",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def sink_parquet_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned, compacted parquet sink: repartition by the partition
    column (one task's output per partition value → no file explosion),
    write partitionBy(l_returnflag), re-read and aggregate — proving the
    sink round-trips and the partition column survives directory encoding."""
    out = op_tmpdir("sink_parquet_")
    li = Tables(spark, sf_dir).lineitem
    (
        li.repartition("l_returnflag")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(out)
    )
    # explicit schema: a zero-row write leaves no data files, and schema
    # inference over an empty partitioned dir fails; partition columns are
    # still resolved from the directory names when files do exist
    back = spark.read.schema(li.schema).parquet(out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "sink_csv_json",
    oracle="""
SELECT 'csv' AS fmt, count(*) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum FROM orders
UNION ALL
SELECT 'json', count(*), CAST(sum(o_orderkey) AS BIGINT) FROM orders
""",
)
def sink_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSONL export sinks, re-read and checksummed per format."""
    o = Tables(spark, sf_dir).orders.select("o_orderkey", "o_orderstatus")
    out_csv = op_tmpdir("sink_csv_")
    out_json = op_tmpdir("sink_json_")
    o.write.mode("overwrite").option("header", True).csv(out_csv)
    o.write.mode("overwrite").json(out_json)
    csv_back = (
        spark.read.schema("o_orderkey bigint, o_orderstatus string")
        .option("header", True)
        .csv(out_csv)
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("o_orderkey").alias("key_sum"))
        .select(F.lit("csv").alias("fmt"), "n_rows", "key_sum")
    )
    json_back = (
        spark.read.schema("o_orderkey bigint, o_orderstatus string")
        .json(out_json)
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("o_orderkey").alias("key_sum"))
        .select(F.lit("json").alias("fmt"), "n_rows", "key_sum")
    )
    return csv_back.unionByName(json_back)


@register(
    "scan_orc",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC format round-trip (the columnar format Spark supports natively
    besides parquet — Hive-ecosystem interop): write nation as ORC with
    zlib compression, read it back with the declared schema. DuckDB cannot
    read ORC, so the oracle verifies the round-tripped CONTENT against the
    parquet source — format fidelity, not format parsing."""
    out = op_tmpdir("scan_orc_")
    n = Tables(spark, sf_dir).nation
    n.coalesce(1).write.mode("overwrite").option("compression", "zlib").orc(out)
    return spark.read.schema(n.schema).orc(out)
