"""Round-6 fifty-fifth wave (SURVEY.md §2.R): lake scan/sink governance
and SQL ergonomics — recursive glob scans, max-records-per-file sizing,
the SQL PIVOT clause, and named WINDOW definitions.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables, register_views
from ai_dataingestion_spark.tmpdirs import op_tmpdir


@register(
    "scan_recursive_glob",
    oracle="""
SELECT CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS year,
       count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
         AS rev
FROM orders
WHERE strftime(o_orderdate, '%Y') IN ('1995', '1996')
GROUP BY 1
""",
)
def scan_recursive_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive lake discovery with format filtering: orders for two
    years are written into ARBITRARILY nested directories (y=Y/nested/
    deep) alongside decoy JSON exports in sibling dirs, then read back
    with recursiveFileLookup=true + pathGlobFilter='*.parquet' — the
    scan must walk the whole tree, take only parquet, and skip the
    decoys without a schema error. This is how a scan survives the
    messy multi-producer lake layouts that partition-discovery
    conventions don't cover. The glob filter applies at file-listing
    time (planner-side), so decoy bytes are never read. Oracle: the
    year-filtered aggregate on the source relation — any missed or
    double-read file breaks counts."""
    t = Tables(spark, sf_dir)
    orders = t.orders
    root = op_tmpdir("rec_glob_")
    for y in (1995, 1996):
        part = orders.filter(F.year("o_orderdate") == y)
        part.write.mode("overwrite").parquet(
            os.path.join(root, f"y={y}", "nested", "deep")
        )
        part.limit(5).write.mode("overwrite").json(
            os.path.join(root, f"y={y}", "nested", "decoy_json")
        )
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .schema(orders.schema)
        .parquet(root)
    )
    return back.groupBy(F.year("o_orderdate").alias("year")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2)
        .cast("double")
        .alias("rev"),
    )


_MAX_REC = 100


@register(
    "sink_max_records_per_file",
    oracle=f"""
SELECT CAST(CAST(ceil(count(*) / {_MAX_REC}.0) AS BIGINT) AS INTEGER)
         AS n_files,
       count(*) AS n_rows, true AS sizes_within_cap
FROM orders WHERE o_orderkey % 10 = 0
""",
)
def sink_max_records_per_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-size governance on write: maxRecordsPerFile caps every
    output file at 100 rows, so a single writer task emits
    ceil(n/100) files instead of one unbounded blob — the knob that
    keeps downstream readers' task sizing uniform when upstream
    parallelism is low (here coalesce(1) forces the worst case: one
    task, many files). The audit re-lists the sink and fans the footer
    reads across executors via mapInPandas (the scan_parquet_footer_audit
    kernel) — a driver loop over per-file footers measured 124 s at the
    10x sweep's 15k files; distributed it is bounded by executor count,
    not file count. Output: file count, row reconciliation, and the
    per-file cap assertion. Oracle: the ceil arithmetic + source count."""
    t = Tables(spark, sf_dir)
    out = op_tmpdir("maxrec_")
    # Deterministic 10% export slice: the one-task worst case writes
    # files sequentially, so the demo input is bounded (the 10x sweep
    # measured 127 s for the unsliced 15k-file write — file-open cost,
    # not a plan defect; production caps are ~1M rows, not 100).
    export = t.orders.filter(F.col("o_orderkey") % 10 == 0)
    export.coalesce(1).write.option(
        "maxRecordsPerFile", _MAX_REC
    ).mode("overwrite").parquet(out)
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    paths = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(16, "path")

    def footer_rows(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            yield pd.DataFrame(
                {"rows": [pq.ParquetFile(p).metadata.num_rows
                          for p in b["path"]]}
            )

    per_file = paths.mapInPandas(footer_rows, "rows long")
    # Empty slice: the ungrouped agg still emits one row, and the oracle pins
    # literals (0 files, 0 rows, cap trivially satisfied) — coalesce the
    # NULL-on-empty aggregates to match (ADVICE r6).
    return per_file.agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        F.coalesce(F.sum("rows"), F.lit(0).cast("long")).alias("n_rows"),
        F.coalesce(F.max("rows") <= _MAX_REC, F.lit(True)).alias(
            "sizes_within_cap"
        ),
    )


_PIVOT_SPARK = """
SELECT * FROM (
  SELECT c_mktsegment AS seg, o_orderstatus AS st, o_totalprice AS p
  FROM orders JOIN customer ON o_custkey = c_custkey)
PIVOT (count(*) AS n,
       CAST(round(sum(CAST(p AS DECIMAL(20,6))), 2) AS DOUBLE) AS rev
       FOR st IN ('F' AS f, 'O' AS o, 'P' AS pp))
"""

_PIVOT_DUCK = """
SELECT seg,
  count(*) FILTER (st='F') AS f_n,
  CAST(round(sum(CAST(p AS DECIMAL(20,6))) FILTER (st='F'), 2) AS DOUBLE)
    AS f_rev,
  count(*) FILTER (st='O') AS o_n,
  CAST(round(sum(CAST(p AS DECIMAL(20,6))) FILTER (st='O'), 2) AS DOUBLE)
    AS o_rev,
  count(*) FILTER (st='P') AS pp_n,
  CAST(round(sum(CAST(p AS DECIMAL(20,6))) FILTER (st='P'), 2) AS DOUBLE)
    AS pp_rev
FROM (SELECT c_mktsegment AS seg, o_orderstatus AS st, o_totalprice AS p
      FROM orders JOIN customer ON o_custkey = c_custkey) t
GROUP BY seg
"""


@register("sql_pivot_clause", oracle=_PIVOT_DUCK)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (Spark 3.4+): two measures (count, revenue)
    spread across three pinned status columns per market segment —
    the analyst spelling of the DataFrame pivot already covered by
    pivot_wide. Pinned IN-list means no extra distinct-values job;
    Catalyst compiles the clause to the same single partial-aggregable
    hash aggregate as manual FILTER columns (which is exactly how the
    DuckDB oracle spells it, pinning both semantics and output naming
    f_n/f_rev/...)."""
    register_views(spark, sf_dir)
    return spark.sql(_PIVOT_SPARK)


_WINDOW_SQL = """
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS rn,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(20,6))) OVER w, 2)
            AS DOUBLE) AS run_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("sql_named_window_clause", oracle=_WINDOW_SQL)
def sql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW definitions: one shared `WINDOW w AS (...)` clause
    referenced by multiple over-expressions — the deduplicated spelling
    that also guarantees both functions share ONE physical Window node
    (same partitioning + ordering => one sort, one pass), instead of
    the accidental two-window plans copy-pasted inline specs can drift
    into. Both engines run the identical statement; the running sum's
    default frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW) ties by the
    orderkey sort key so it is deterministic."""
    register_views(spark, sf_dir)
    return spark.sql(_WINDOW_SQL)
