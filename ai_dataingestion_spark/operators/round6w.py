"""Round-6 forty-ninth wave (SURVEY.md §2.R): Spark 4 engine-surface
operators — VARIANT semi-structured access, recursive CTEs, bitmap
exact-distinct aggregation, LATERAL correlated subqueries, collation-aware
grouping, and AES column-encryption round-trips.

These exercise engine capabilities a migrating user gains with Spark 4.x
(all public API: parse_json/variant_get SPARK-45891, WITH RECURSIVE
SPARK-24497, bitmap_* aggregates SPARK-44189, LATERAL subquery
SPARK-34382, collations SPARK-46830, aes_encrypt/aes_decrypt SPARK-12567).
Each has a DuckDB oracle spelling the same semantics in portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables, register_views


@register(
    "fn_variant_json_path",
    oracle="""
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CAST(json_extract(
             '{"a":[' || CAST(json_extract(props, '$.k') AS BIGINT) || ','
                      || CAST(json_extract(props, '$.k') AS BIGINT) * 2 || ']}',
             '$.a[1]') AS BIGINT)) AS BIGINT) AS sum_nested
FROM events GROUP BY event_type
""",
)
def fn_variant_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through the VARIANT type (Spark 4.x):
    ``parse_json`` shreds the raw ``events.props`` JSON once into Spark's
    binary variant encoding, ``variant_get`` navigates JSON paths —
    including array indexing on a nested document built inline — without
    ever re-parsing text per field. At 100 TB this is the difference
    between O(fields) JSON re-parses per row (``get_json_object``) and one
    parse + O(1) binary offset lookups; everything stays JVM-side inside
    whole-stage codegen and the aggregate is a plain partial-aggregable
    groupBy on event_type (5-row output at any scale). Oracle: DuckDB
    json_extract over the identical paths."""
    t = Tables(spark, sf_dir)
    # One physical shred: props crosses parse_json exactly once (the alias
    # below survives CollapseProject — parse_json is not a cheap expression),
    # and every path lookup reads the binary variant. Pinned by
    # tests/test_plans.py::test_variant_shreds_props_once.
    shredded = t.events.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    nested = F.expr(
        "variant_get(parse_json(concat('{\"a\":[', "
        "CAST(variant_get(v, '$.k', 'bigint') AS STRING), ',', "
        "CAST(variant_get(v, '$.k', 'bigint') * 2 AS STRING), "
        "']}')), '$.a[1]', 'bigint')"
    )
    return shredded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.sum(nested).alias("sum_nested"),
    )


_RECURSIVE_SQL = """
WITH RECURSIVE bom(root, node) AS (
  SELECT p_partkey, p_partkey FROM part WHERE p_partkey BETWEEN 1 AND 3
  UNION ALL
  SELECT b.root, p.p_partkey
  FROM bom b
  CROSS JOIN (VALUES (0), (1)) AS o(off)
  JOIN part p ON p.p_partkey = b.node * 2 + o.off
  WHERE b.node >= 1
)
SELECT root, count(*) AS n_nodes,
       CAST(round(sum(CAST(p.p_retailprice AS DECIMAL(19,2))), 2) AS DOUBLE)
         AS subtree_cost
FROM bom JOIN part p ON p.p_partkey = bom.node
GROUP BY root
"""


@register("sql_recursive_cte_rollup", oracle=_RECURSIVE_SQL)
def sql_recursive_cte_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, Spark 4.0 SPARK-24497): a
    bill-of-materials-style hierarchy rollup. The part hierarchy is the
    implicit binary tree ``k -> {2k, 2k+1}`` (synthesized: the corpus has
    no parent column; the operator under test is recursive traversal, and
    the tree is deterministic from the keys alone). Three roots seed the
    anchor; each recursion step is a pure EQUI-join (the child offset is
    expanded via a 2-row VALUES cross join first, so Catalyst plans a hash
    join per iteration, never a nested-loop on an OR predicate — the shape
    that survives a 1000-executor fan-out). Depth is log2(max key): 11
    iterations at sf0.01, 15 at ~20k parts, always far under the engine's
    100-level guard. The ``node >= 1`` guard pins the k=0 self-loop
    (0*2=0) that would otherwise never exhaust — the classic cyclic-input
    recursion trap, caught by prototype. Oracle: DuckDB runs the identical
    statement."""
    register_views(spark, sf_dir)
    # Spark's VALUES-in-FROM spelling drops the parens DuckDB requires.
    return spark.sql(_RECURSIVE_SQL.replace("(VALUES (0), (1))", "VALUES (0), (1)"))


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(DISTINCT o_custkey) AS n_cust
FROM orders GROUP BY 1
""",
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-count at scale via bitmap aggregation (Spark 3.5+
    bitmap_* functions, SPARK-44189): customers per order-month. Keys are
    bucketed into 32768-bit ranges (``bitmap_bucket_number``), each
    (month, bucket) group ORs its bit positions into a <=4 KB binary bitmap
    map-side, and the final per-month count is ``bitmap_count`` over the
    OR-merge of bucket bitmaps. Both aggregation levels are
    partial-aggregable, so the shuffle carries fixed-size bitmaps instead
    of raw keys — the exact-distinct answer with HLL-like movement cost
    (vs count(DISTINCT) whose expand-shuffle moves every key occurrence).
    Keys are shifted +1 before bucketing: Spark's bit positions are
    1-based (``bitmap_bit_position(x) = (x-1) % 32768``), so a 0 key
    collides with another key's slot — measured as an off-by-one distinct
    count (189 vs 190) before the shift; +1 is bijective so counts are
    unaffected. Oracle: DuckDB's plain count(DISTINCT)."""
    t = Tables(spark, sf_dir)
    per_bucket = (
        t.orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.expr("bitmap_bucket_number(o_custkey + 1)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey + 1)").alias("pos"),
        )
        .groupBy("month", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("month").agg(
        F.expr("bitmap_count(bitmap_or_agg(bm))").alias("n_cust")
    )


_LATERAL_SQL = """
SELECT n.n_name, l.c_name,
       CAST(round(CAST(l.c_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS bal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) l
"""


@register("join_lateral_topk", oracle=_LATERAL_SQL)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 4 SPARK-34382): top-2 customers
    by balance per nation, written as the for-each-row subquery a SQL user
    migrating from Postgres/DuckDB would write. Catalyst de-correlates the
    LATERAL into a join + per-key limit rather than executing the inner
    query once per outer row — same physical shape as the window-function
    top-k (win_topk_group) but proving the correlated-subquery surface.
    ORDER BY carries the c_name tie-break so the top-2 set is
    deterministic cross-engine. Oracle: DuckDB runs the identical
    statement."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@register(
    "fn_collation_lcase_group",
    oracle="""
SELECT lower(seg) AS seg_lc, count(*) AS n,
       count(DISTINCT seg) AS n_case_variants
FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
             ELSE lower(c_mktsegment) END AS seg
      FROM customer) t
GROUP BY 1
""",
)
def fn_collation_lcase_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations, SPARK-46830): group
    mixed-case segment labels under UTF8_LCASE so 'AUTOMOBILE' and
    'automobile' are ONE group — the collation is a property of the
    comparison, not a lower() rewrite of the data (binary-preserving:
    n_case_variants proves both spellings reached the group). Mixed case
    is synthesized deterministically from key parity because the corpus
    stores segments uniformly upper. Collation comparisons stay JVM-side
    (no UDF); grouping on a collated key shuffles exactly like any other
    key. Oracle: DuckDB spells the same semantics with lower()
    normalization."""
    t = Tables(spark, sf_dir)
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    return (
        t.customer.select(seg.alias("seg"))
        .groupBy(F.expr("seg COLLATE UTF8_LCASE").alias("seg_ci"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.expr("seg COLLATE UTF8_BINARY")).alias(
                "n_case_variants"
            ),
        )
        .select(
            F.lower(F.col("seg_ci").cast("string")).alias("seg_lc"),
            "n",
            "n_case_variants",
        )
    )


@register(
    "fn_aes_encrypt_roundtrip",
    oracle="""
SELECT count(*) AS n, count(*) AS n_ok,
       count(DISTINCT c_name) AS n_distinct_ct
FROM customer
""",
)
def fn_aes_encrypt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round-trip (aes_encrypt/aes_decrypt,
    SPARK-12567): PII-bearing names encrypted with AES-128-GCM and a
    pinned IV, then decrypted and compared. Proves (a) every row
    round-trips losslessly (n_ok == n) and (b) deterministic-IV ciphertext
    is injective on plaintext (distinct ciphertexts == distinct names), so
    encrypted columns can still serve as exact-match join/dedup keys — the
    property an ingestion pipeline relies on when it encrypts PII at the
    edge but still needs entity resolution downstream. (In production the
    IV comes from a per-batch secret, not a constant; the pinned IV here
    makes the parity check deterministic.) All JVM-side codegen
    expressions, one scan, 1-row output. Oracle: the decrypt side cannot
    be spelled portably, so DuckDB pins the invariants' expected values —
    full-cardinality round-trip and name-cardinality ciphertexts."""
    t = Tables(spark, sf_dir)
    enc = t.customer.select(
        "c_name",
        F.expr(
            "aes_encrypt(c_name, '0123456789abcdef', 'GCM', 'NONE', "
            "unhex('000000000000000000000000'))"
        ).alias("ct"),
    )
    return enc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.expr(
                    "CAST(aes_decrypt(ct, '0123456789abcdef', 'GCM') AS STRING)"
                )
                == F.col("c_name"),
                1,
            ).otherwise(0)
        ).alias("n_ok"),
        F.count_distinct("ct").alias("n_distinct_ct"),
    )
