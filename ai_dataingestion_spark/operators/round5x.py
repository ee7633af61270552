"""Round-5 twenty-fourth wave (SURVEY.md §2.Q, continued): vector-index
upsert refresh, two-sample Kolmogorov-Smirnov drift test, keyset
(seek) pagination, and fiscal-calendar rollups.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


def _pround(col, dp: int = 6):
    """Portable IEEE rounding floor(x*10^dp + 0.5)/10^dp (see
    tpch_q2_min_cost_supplier)."""
    scale = 10**dp
    return F.floor(col * scale + 0.5) / scale


@register(
    "embed_index_upsert_refresh",
    oracle="""
WITH lake AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 <> 0
),
batch AS (
  -- new vectors (the %5 slice) + re-embeddings of every 10th lake vector
  -- (negated -> provably different), which must REPLACE their lake rows
  SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 5 = 0
  UNION ALL
  SELECT vec_id, list_transform(embedding, x -> -x), label
  FROM embeddings WHERE vec_id % 5 <> 0 AND vec_id % 10 = 0
),
merged AS (
  SELECT vec_id, embedding, label FROM batch
  UNION ALL
  SELECT l.vec_id, l.embedding, l.label FROM lake l
  WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.vec_id = l.vec_id)
)
SELECT label,
       count(*) AS n_vectors,
       CAST(sum(CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inserted,
       CAST(sum(CASE WHEN vec_id % 5 <> 0 AND vec_id % 10 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_replaced,
       floor(sum(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE)))) * 1000000 + 0.5) / 1000000
         AS component_sum
FROM merged GROUP BY label
""",
)
def embed_index_upsert_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-index upsert: a batch of NEW vectors plus RE-EMBEDDINGS of
    existing ids (model-version bump — injected as negations so
    replacement is provable) merges into the vector lake with
    last-writer-wins on vec_id — the refresh cycle every embedding
    store runs when the encoder changes. The merge is the anti-join
    upsert (batch ∪ lake-not-in-batch), keyed on vec_id; the per-label
    report checksums the post-merge state via each vector's component
    sum (left-to-right fold), which flips sign for replaced vectors —
    so a botched merge (duplicate id, missed replacement) breaks the
    hash, not just the count."""
    e = Tables(spark, sf_dir).embeddings
    lake = e.filter(F.col("vec_id") % 5 != 0)
    re_embedded = (
        e.filter((F.col("vec_id") % 5 != 0) & (F.col("vec_id") % 10 == 0))
        .select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: -x).alias("embedding"),
            "label",
        )
    )
    batch = e.filter(F.col("vec_id") % 5 == 0).select(
        "vec_id", "embedding", "label"
    ).unionByName(re_embedded)
    merged = batch.unionByName(
        lake.join(batch.select("vec_id"), "vec_id", "left_anti").select(
            "vec_id", "embedding", "label"
        )
    )
    comp_sum = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return merged.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.when(F.col("vec_id") % 5 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.sum(
            F.when(
                (F.col("vec_id") % 5 != 0) & (F.col("vec_id") % 10 == 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_replaced"),
        _pround(F.sum(comp_sum)).alias("component_sum"),
    )


_KS_CUT = "2024-01-15"


@register(
    "quality_ks_two_sample",
    oracle=f"""
WITH tagged AS (
  SELECT value,
         CASE WHEN ts < TIMESTAMP '{_KS_CUT}' THEN 1 ELSE 0 END AS pre
  FROM events
),
counts AS (
  SELECT value,
         CAST(sum(pre) AS BIGINT) AS c1,
         CAST(sum(1 - pre) AS BIGINT) AS c2
  FROM tagged GROUP BY value
),
tot AS (
  SELECT CAST(sum(c1) AS DOUBLE) AS n1, CAST(sum(c2) AS DOUBLE) AS n2
  FROM counts
),
ecdf AS (
  SELECT value,
         sum(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS r1,
         sum(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS r2
  FROM counts
),
gaps AS (
  SELECT value,
         abs(CAST(r1 AS DOUBLE) / n1 - CAST(r2 AS DOUBLE) / n2) AS gap
  FROM ecdf CROSS JOIN tot
)
SELECT floor((SELECT max(gap) FROM gaps) * 1000000 + 0.5) / 1000000
         AS ks_statistic,
       (SELECT value FROM gaps ORDER BY gap DESC, value LIMIT 1)
         AS ks_location,
       (SELECT CAST(n1 AS BIGINT) FROM tot) AS n_pre,
       (SELECT CAST(n2 AS BIGINT) FROM tot) AS n_post
""",
)
def quality_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on the value column
    around a cutover: D = max |ECDF_pre − ECDF_post| plus the value
    where the gap peaks — the distribution-shape drift detector that
    mean/variance screens (Welch t) are blind to. Scale shape: raw
    rows first collapse to per-DISTINCT-VALUE counts (the 2-decimal
    domain bounds this relation regardless of event volume), and the
    ECDFs are running sums over that bounded relation — the global
    ordered window never sees raw events. Exact integer ranks, two
    divisions per distinct value, deterministic argmax with a value
    tiebreak."""
    e = Tables(spark, sf_dir).events
    tagged = e.select(
        "value",
        F.when(F.col("ts") < F.lit(_KS_CUT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("pre"),
    )
    counts = tagged.groupBy("value").agg(
        F.sum("pre").cast("bigint").alias("c1"),
        F.sum(1 - F.col("pre")).cast("bigint").alias("c2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ecdf = counts.select(
        "value",
        F.sum("c1").over(w).alias("r1"),
        F.sum("c2").over(w).alias("r2"),
    )
    gaps = ecdf.crossJoin(F.broadcast(tot)).select(
        "value",
        F.abs(
            F.col("r1").cast("double") / F.col("n1")
            - F.col("r2").cast("double") / F.col("n2")
        ).alias("gap"),
    )
    top = (
        gaps.orderBy(F.desc("gap"), F.asc("value"))
        .limit(1)
        .select(
            _pround(F.col("gap")).alias("ks_statistic"),
            F.col("value").alias("ks_location"),
        )
    )
    return top.crossJoin(
        F.broadcast(
            tot.select(
                F.col("n1").cast("bigint").alias("n_pre"),
                F.col("n2").cast("bigint").alias("n_post"),
            )
        )
    )


_PAGE_SIZE = 50


@register(
    "sort_keyset_pagination",
    oracle=f"""
WITH ranked AS (
  SELECT o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
SELECT CAST((rn - 1) // {_PAGE_SIZE} + 1 AS INT) AS page,
       o_orderkey, o_orderdate, o_totalprice
FROM ranked WHERE rn <= {3 * _PAGE_SIZE}
""",
)
def sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination: three consecutive pages fetched
    by CURSOR PREDICATE — page n+1 filters (date, key) > (last row of
    page n) and takes the next {_PAGE_SIZE} — instead of OFFSET, which
    re-sorts and discards n·page rows per request (limit_offset
    documents that cost; this is the serving-scale answer). Each page
    is a pushdown-able range predicate + TakeOrderedAndProject; the
    oracle spells the same three pages as one ranked window. The
    (date, key) cursor is totally ordered because orderkey is unique —
    the precondition keyset pagination always needs."""
    o = Tables(spark, sf_dir).orders.select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    pages = []
    cursor = None  # (date, key) of last row seen
    for page_no in range(1, 4):
        q = o
        if cursor is not None:
            cd, ck = cursor
            q = q.filter(
                (F.col("o_orderdate") > F.lit(cd))
                | (
                    (F.col("o_orderdate") == F.lit(cd))
                    & (F.col("o_orderkey") > F.lit(ck))
                )
            )
        page = q.orderBy("o_orderdate", "o_orderkey").limit(_PAGE_SIZE)
        rows = page.collect()  # bounded: _PAGE_SIZE rows per fetch
        pages.append((page_no, rows))
        if not rows:  # exhausted relation (e.g. empty corpus): stop seeking
            break
        last = rows[-1]
        cursor = (last["o_orderdate"], last["o_orderkey"])
    flat = [
        (p, r["o_orderkey"], r["o_orderdate"], r["o_totalprice"])
        for p, rows in pages
        for r in rows
    ]
    return spark.createDataFrame(
        flat,
        "page int, o_orderkey bigint, o_orderdate timestamp_ntz,"
        " o_totalprice double",
    )


@register(
    "orders_fiscal_calendar_rollup",
    oracle="""
WITH tagged AS (
  -- fiscal year starts Feb 1: FY(x) = calendar year of (date - 1 month)
  SELECT year(o_orderdate - INTERVAL 1 MONTH) AS fiscal_year,
         CAST((month(o_orderdate - INTERVAL 1 MONTH) - 1) // 3 + 1 AS INT)
           AS fiscal_quarter,
         CAST(o_totalprice AS DECIMAL(19, 2)) AS p
  FROM orders
)
SELECT fiscal_year, fiscal_quarter,
       count(*) AS n_orders,
       CAST(round(sum(p), 2) AS DOUBLE) AS revenue
FROM tagged GROUP BY fiscal_year, fiscal_quarter
""",
)
def orders_fiscal_calendar_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fiscal-calendar rollup for a February-start fiscal year: FY and
    fiscal quarter derived by the shift-then-extract rule (subtract one
    month, then use calendar year/quarter arithmetic) — the offset-
    calendar family every finance rollup needs, where naive year() per
    row silently books January into the wrong FY. Pure expressions +
    one aggregate; DECIMAL revenue."""
    o = Tables(spark, sf_dir).orders
    shifted = F.col("o_orderdate") - F.expr("INTERVAL 1 MONTH")
    return (
        o.select(
            F.year(shifted).alias("fiscal_year"),
            (((F.month(shifted) - 1) / 3).cast("int") + 1).alias(
                "fiscal_quarter"
            ),
            F.col("o_totalprice").cast("decimal(19,2)").alias("p"),
        )
        .groupBy("fiscal_year", "fiscal_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("p"), 2).cast("double").alias("revenue"),
        )
    )
