"""Round-6 fifty-third wave (SURVEY.md §2.R): lakehouse pipeline
composition — the medallion (bronze/silver/gold) orders pipeline,
mergeable HLL sketch hierarchy rollups, and multi-char-delimiter CSV
ingestion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir


@register(
    "pipeline_medallion_orders",
    oracle="""
WITH bronze AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority FROM orders
  UNION ALL  -- injected corruption: negative totals (every 7th key)
  SELECT o_orderkey, o_custkey, o_orderstatus, -o_totalprice, o_orderdate,
         o_orderpriority FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL  -- injected corruption: null custkey (every 11th key)
  SELECT o_orderkey, NULL, o_orderstatus, o_totalprice, o_orderdate,
         o_orderpriority FROM orders WHERE o_orderkey % 11 = 0),
silver AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey
                ORDER BY o_totalprice DESC) AS rn
    FROM bronze
    WHERE o_totalprice > 0 AND o_custkey IS NOT NULL) t
  WHERE rn = 1),
gold AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
         count(*) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(20,6))) AS rev
  FROM silver GROUP BY 1, 2)
SELECT (SELECT count(*) FROM bronze) AS bronze_rows,
       (SELECT count(*) FROM silver) AS silver_rows,
       (SELECT count(*) FROM bronze) - (SELECT count(*) FROM silver)
         AS quarantined_rows,
       (SELECT count(*) FROM gold) AS gold_cells,
       CAST((SELECT round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2)
             FROM silver) AS DOUBLE) AS silver_rev,
       (SELECT round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2)
          FROM silver)
         = (SELECT round(sum(rev), 2) FROM gold) AS rev_reconciles
""",
)
def pipeline_medallion_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The medallion lakehouse pipeline end-to-end, with REAL lake hops:
    bronze (raw orders + deterministically injected corruption — negative
    totals on every 7th key, null custkeys on every 11th) is WRITTEN to
    parquet, read back, validated and deduped into silver (rules drop
    corrupt rows; per-orderkey keep-highest-total resolves the duplicate
    the negative-total twin left behind), silver is WRITTEN again, and
    gold is the monthly-by-priority revenue mart aggregated from the
    silver files. The output row is the run's reconciliation ledger —
    bronze/silver/quarantine counts and the silver-vs-gold revenue
    equality a promotion job asserts before repointing the gold table.
    Every hop is a plain partial-aggregable or windowed plan: validation
    filters push into the silver scan, the dedup window partitions by
    orderkey, the mart is a two-key groupBy. At 100 TB each hop is the
    same plan over partitioned storage. Oracle: DuckDB composes the same
    three layers as CTEs (no files; content is what's compared)."""
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    bronze = (
        base.unionAll(
            base.filter(F.col("o_orderkey") % 7 == 0).withColumn(
                "o_totalprice", -F.col("o_totalprice")
            )
        ).unionAll(
            base.filter(F.col("o_orderkey") % 11 == 0).withColumn(
                "o_custkey", F.lit(None).cast("bigint")
            )
        )
    )
    root = op_tmpdir("medallion_")
    bronze_path = os.path.join(root, "bronze")
    silver_path = os.path.join(root, "silver")
    bronze.write.mode("overwrite").parquet(bronze_path)
    bronze_r = spark.read.schema(bronze.schema).parquet(bronze_path)

    from pyspark.sql import Window

    w = Window.partitionBy("o_orderkey").orderBy(F.desc("o_totalprice"))
    silver = (
        bronze_r.filter(
            (F.col("o_totalprice") > 0) & F.col("o_custkey").isNotNull()
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    silver.write.mode("overwrite").parquet(silver_path)
    silver_r = spark.read.schema(silver.schema).parquet(silver_path)

    gold = silver_r.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(20,6)")).alias("rev"),
    )

    b_n = bronze_r.agg(F.count(F.lit(1)).alias("bronze_rows"))
    s_agg = silver_r.agg(
        F.count(F.lit(1)).alias("silver_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,6)")), 2).alias(
            "srev"
        ),
    )
    g_agg = gold.agg(
        F.count(F.lit(1)).alias("gold_cells"),
        F.round(F.sum("rev"), 2).alias("grev"),
    )
    return (
        b_n.crossJoin(s_agg)
        .crossJoin(g_agg)
        .select(
            "bronze_rows",
            "silver_rows",
            (F.col("bronze_rows") - F.col("silver_rows")).alias(
                "quarantined_rows"
            ),
            "gold_cells",
            F.col("srev").cast("double").alias("silver_rev"),
            (F.col("srev") == F.col("grev")).alias("rev_reconciles"),
        )
    )


@register(
    "agg_hll_union_rollup",
    oracle="""
SELECT strftime(ts, '%Y-%m') AS month,
       count(DISTINCT user_id) AS exact_u,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       true AS within_5pct
FROM events GROUP BY 1
""",
)
def agg_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch hierarchy rollup with Spark 3.5's built-in
    Apache DataSketches HLL functions: per-DAY hll_sketch_agg(user_id)
    sketches union upward to months via hll_union_agg — distinct counts
    DON'T roll up, sketches DO, which is why a 100 TB metrics store keeps
    constant-size sketch columns per grain instead of recomputing
    distincts from raw events at every level. lgConfigK=14 bounds the
    standard error at ~0.8%, so the month-level estimate must land within
    5% of the exact distinct (asserted per month). Unlike the
    DataSketches-library agg_hll_sketch_merge (rows-only by design), the
    contract form here is oracle-checkable: exact counts + the
    within-bound boolean. Both aggregation levels are partial-aggregable;
    the shuffle carries <=16 KB sketch blobs."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(
        F.to_date("ts").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
    ).agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    monthly = daily.groupBy("month").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = t.events.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month")
    ).agg(F.count_distinct("user_id").alias("exact_u"))
    return monthly.join(exact, "month").select(
        "month",
        "exact_u",
        F.col("n_days").cast("bigint").alias("n_days"),
        (
            F.abs(F.col("est") - F.col("exact_u")) / F.col("exact_u")
            <= 0.05
        ).alias("within_5pct"),
    )


@register(
    "scan_csv_multichar_delim",
    oracle="""
SELECT o_orderstatus AS status, count(*) AS n,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE)
         AS rev
FROM orders GROUP BY 1
""",
)
def scan_csv_multichar_delim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-character-delimiter CSV ingestion (sep='||'), the legacy
    mainframe/ETL export format single-char CSV readers can't split:
    orders are exported with '||' separators (values that could contain
    the delimiter are absent by construction — keys, statuses, money),
    read back with Spark's multi-char sep support + explicit schema, and
    aggregated. The written lake uses text-mode concat so the export is
    byte-deterministic; the read is a normal distributed CSV scan
    (splittable per file). Oracle: the same aggregate on the source
    relation — a lossy export/reimport would break counts or money.
    (DuckDB's own reader caps delimiters at 1 byte — the capability gap
    this operator documents.)"""
    t = Tables(spark, sf_dir)
    out = op_tmpdir("csv_md_")
    line = F.concat_ws(
        "||",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("string"),
    )
    t.orders.select(line.alias("value")).write.mode("overwrite").text(out)
    back = (
        spark.read.option("sep", "||")
        .schema("okey bigint, status string, price double")
        .csv(out)
    )
    return back.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("price").cast("decimal(20,6)")), 2)
        .cast("double")
        .alias("rev"),
    )
