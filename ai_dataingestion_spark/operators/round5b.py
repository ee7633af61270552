"""Round-5 second wave (SURVEY.md §2.Q): the last two classic TPC-H
shapes (Q2 min-cost argmin subquery, Q21 single-late-supplier multi-
condition exists), customer purchase-cadence analytics, event attribution
and co-occurrence, corpus-divergence / lexical-richness text statistics,
blocked edit-distance dedup, alternative means, a per-column data-quality
matrix, and a per-dimension label-separability (eta-squared) profile over
the embedding corpus.

These register AFTER round5.py, and every ID here is listed in
catalog._DEFER_TO_NEXT_ROUND: the r5 driver window is exactly full (45
rank-0 + 2 re-checks + 3 rows-only), so these defer to rank 3 and rotate
into the r6 window. Meanwhile each is oracle-verified by the local driver
sim and the Tier-2 parity sweep (tests/test_oracle_parity.py picks up
every registered oracle automatically).

Float discipline follows SURVEY.md §5.4: money-product sums in
DECIMAL(20,6) rounded in the decimal domain; ratios/doubles rounded at
6 dp on BOTH sides; counts, keys, and day deltas exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables

_NET = "(l_extendedprice * (1 - l_discount))"


# ---------------------------------------------------------------------------
# §2.Q.1 remaining TPC-H shapes
# ---------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
               / CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
               * 1000000 + 0.5) / 1000000
           AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, l_suppkey, unit_cost,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_cost ASC, l_suppkey ASC) AS rn
  FROM cost
)
SELECT p_partkey, p_name, s_name AS supplier, unit_cost
FROM best
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1 AND p_size < 15
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted to this corpus (no
    partsupp: unit cost is the supplier's observed avg extendedprice per
    quantity from lineitem, restricted to EUROPE suppliers). The
    correlated MIN subquery becomes a per-part window argmin — one
    groupBy shuffle on (part, supp) then a part-partitioned row_number,
    dims broadcast. Unit cost is total spend / total quantity via EXACT
    decimal sums cast to double for one deterministic IEEE division,
    then rounded with the PORTABLE formula floor(x·1e6 + 0.5)/1e6 —
    pure IEEE ops, bit-identical on both engines. Built-in round() is
    NOT portable on exact decimal ties: sf0.1 hit quotient 8290.71/32 =
    259.0846875, where Spark rounds the shortest-decimal BigDecimal
    HALF_UP to …688 while DuckDB rounds the binary double (…87499…) to
    …687. Suppkey breaks argmin ties deterministically."""
    t = Tables(spark, sf_dir)
    europe_supp = (
        t.supplier.join(
            F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    cost = (
        t.lineitem.join(
            broadcast_if_small(europe_supp, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.floor(
                    F.sum(F.col("l_extendedprice").cast("decimal(20,6)"))
                    .cast("double")
                    / F.sum(F.col("l_quantity").cast("decimal(20,6)")).cast(
                        "double"
                    )
                    * 1_000_000
                    + 0.5
                )
                / 1_000_000
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("unit_cost"), F.asc("l_suppkey")
    )
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(
            broadcast_if_small(t.part.filter(F.col("p_size") < 15), sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            broadcast_if_small(t.supplier.select("s_suppkey", "s_name"), sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "p_partkey", "p_name", F.col("s_name").alias("supplier"), "unit_cost"
        )
    )


@register(
    "tpch_q21_single_late_supplier",
    oracle="""
WITH flagged AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
),
culprit AS (
  SELECT l_orderkey,
         max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM flagged
  GROUP BY l_orderkey
  HAVING count(*) >= 2 AND sum(is_late) = 1
)
SELECT s_name, count(*) AS numwait
FROM culprit JOIN supplier ON late_supp = s_suppkey
GROUP BY s_name
""",
)
def tpch_q21_single_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: per
    multi-supplier order, the UNIQUE supplier whose line shipped > 90
    days after the order date (ship delay proxies the missing
    commit/receipt dates). The reference EXISTS / NOT EXISTS pair over
    lineitem collapses into one (orderkey, suppkey) aggregation plus one
    orderkey aggregation — two partial-aggregable shuffles, no
    self-join, which is the shape that survives a 100 TB lineitem."""
    t = Tables(spark, sf_dir)
    flagged = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    culprit = (
        flagged.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("is_late").alias("n_late"),
            F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        culprit.join(
            broadcast_if_small(t.supplier.select("s_suppkey", "s_name"), sf_dir, "supplier"),
            F.col("late_supp") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# §2.Q.2 purchase-cadence analytics
# ---------------------------------------------------------------------------


@register(
    "orders_repeat_customer_rate",
    oracle="""
WITH seq AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS nth
  FROM orders
)
SELECT month, count(*) AS n_orders,
       count(CASE WHEN nth > 1 THEN 1 END) AS n_repeat,
       round(CAST(count(CASE WHEN nth > 1 THEN 1 END) AS DOUBLE)
             / count(*), 6) AS repeat_rate
FROM seq GROUP BY month
""",
)
def orders_repeat_customer_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly repeat-purchase rate: the share of each month's orders
    placed by a customer with at least one EARLIER order. One
    custkey-partitioned row_number (shuffles orderkey+date pairs only),
    then a months-sized groupBy — no self-join against order history."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = t.orders.select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.row_number().over(w).alias("nth"),
    )
    return seq.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("nth") > 1, 1)).alias("n_repeat"),
        F.round(
            F.count(F.when(F.col("nth") > 1, 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("repeat_rate"),
    )


@register(
    "customer_order_gap_stats",
    oracle="""
WITH gaps AS (
  SELECT c_mktsegment,
         datediff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, count(gap_days) AS n_gaps,
       round(avg(gap_days), 6) AS avg_gap,
       min(gap_days) AS min_gap, max(gap_days) AS max_gap
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
""",
)
def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order cadence per market segment: day gaps between a
    customer's consecutive orders (lag over the customer's order
    timeline), rolled up to count/avg/min/max. The customer dim is
    broadcast; the window shuffles (custkey, date, orderkey) triples;
    output is segments-sized at any corpus scale."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        t.orders.join(
            broadcast_if_small(t.customer.select("c_custkey", "c_mktsegment"), sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("c_mktsegment").agg(
        F.count("gap_days").alias("n_gaps"),
        F.round(F.avg("gap_days"), 6).alias("avg_gap"),
        F.min("gap_days").alias("min_gap"),
        F.max("gap_days").alias("max_gap"),
    )


# ---------------------------------------------------------------------------
# §2.Q.3 event attribution + co-occurrence
# ---------------------------------------------------------------------------


@register(
    "events_attribution_last_touch",
    oracle="""
WITH touched AS (
  SELECT event_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS attributed
  FROM events
)
SELECT attributed, count(*) AS conversions
FROM touched
WHERE event_type = 'purchase' AND attributed IS NOT NULL
GROUP BY attributed
""",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRIOR non-purchase event type (marketing-attribution
    core). One user-partitioned window carrying only (type, ts, id) —
    the ignore-nulls last_value trick replaces a per-purchase history
    self-join, so lineage never leaves the user's partition."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = t.events.select(
        "event_type",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("attributed"),
    )
    return (
        touched.filter(
            (F.col("event_type") == "purchase") & F.col("attributed").isNotNull()
        )
        .groupBy("attributed")
        .agg(F.count(F.lit(1)).alias("conversions"))
    )


@register(
    "events_type_cooccurrence",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_user_days
FROM ud a JOIN ud b
  ON a.user_id = b.user_id AND a.day = b.day
 AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
""",
)
def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence: for every unordered type pair, the
    number of (user, day) contexts where both occurred. Distinct-reduce
    FIRST (≤ |types| rows per user-day — here ≤ 5), then a self-join
    keyed on (user, day): the quadratic blow-up is bounded by types², not
    by event volume, so the plan survives arbitrarily hot users."""
    t = Tables(spark, sf_dir)
    ud = t.events.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "event_type",
    ).distinct()
    a = ud.alias("a")
    b = ud.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_user_days"))
    )


# ---------------------------------------------------------------------------
# §2.Q.4 corpus divergence + lexical richness
# ---------------------------------------------------------------------------


@register(
    "text_kl_divergence_sources",
    oracle="""
WITH src AS (
  SELECT source, token, count(*) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        FROM documents)
  GROUP BY source, token
),
marged AS (
  SELECT source, c,
         sum(c) OVER (PARTITION BY token) AS cc
  FROM src
),
per_source AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS vocab,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE) / cc)) AS sum_term
  FROM marged GROUP BY source
)
SELECT source, n_tokens, vocab,
       round(sum_term / n_tokens
             + ln(CAST(sum(n_tokens) OVER () AS DOUBLE) / n_tokens), 6)
         AS kl_vs_corpus
FROM per_source
""",
)
def text_kl_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence KL(P_source ‖ P_corpus) over token
    unigram distributions — the mixture-drift detector that tells you
    which source's language least resembles the blend it feeds. Every
    source token also appears in the corpus distribution, so the log
    ratio is always finite.

    Single-scan shape: the raw corpus is exploded and aggregated ONCE to
    the (source, token) relation; the ONLY window is the corpus marginal
    sum over (token) — rows per token partition are bounded by |sources|,
    so no hot-token skew — because both normalizers factor out of the
    sum: KL = (1/n)·Σ c·ln(c/cc) + ln(nn/n), with n available from the
    final per-source groupBy itself and nn from a window over the
    sources-sized tail. (Spark recomputes branching subplans, so the
    naive aggregate-and-rejoin formulation scans the corpus 4x —
    measured 7.2 s vs 2.0 s at sf0.1.) Oracle computes the IDENTICAL
    decomposition."""
    t = Tables(spark, sf_dir)
    src = (
        t.documents.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    marged = src.select(
        "source",
        "c",
        F.sum("c").over(Window.partitionBy("token")).alias("cc"),
    )
    c_d = F.col("c").cast("double")
    per_source = marged.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(c_d * F.log(c_d / F.col("cc"))).alias("sum_term"),
    )
    nn = F.sum("n_tokens").over(Window.partitionBy())
    return per_source.select(
        "source",
        "n_tokens",
        "vocab",
        F.round(
            F.col("sum_term") / F.col("n_tokens")
            + F.log(nn.cast("double") / F.col("n_tokens")),
            6,
        ).alias("kl_vs_corpus"),
    )


@register(
    "text_hapax_ratio",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
freq AS (
  SELECT source, token, count(*) AS c FROM tok GROUP BY source, token
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS n_types,
       count(CASE WHEN c = 1 THEN 1 END) AS n_hapax,
       round(CAST(count(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
             / count(*), 6) AS hapax_ratio,
       round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS type_token_ratio
FROM freq GROUP BY source
""",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness profile per source: hapax legomena (tokens seen
    exactly once in the source) and type/token ratio — low richness
    flags templated or machine-generated feeds. Same (source, token)
    aggregation backbone as the KL query; output is sources-sized."""
    t = Tables(spark, sf_dir)
    freq = (
        t.documents.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hapax = F.count(F.when(F.col("c") == 1, 1))
    return freq.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        hapax.alias("n_hapax"),
        F.round(hapax.cast("double") / F.count(F.lit(1)), 6).alias("hapax_ratio"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias(
            "type_token_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# §2.Q.5 blocked edit-distance dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_edit_distance_blocked",
    oracle="""
WITH blocked AS (
  SELECT doc_id, text,
         n_chars // 32 AS len_bucket,
         array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
           AS prefix5
  FROM documents
),
sized AS (
  SELECT *, count(*) OVER (PARTITION BY len_bucket, prefix5) AS block_n
  FROM blocked
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.text, b.text) AS edit_dist
FROM sized a JOIN sized b
  ON a.len_bucket = b.len_bucket AND a.prefix5 = b.prefix5
 AND a.doc_id < b.doc_id
WHERE a.block_n <= 100
  AND levenshtein(a.text, b.text)
      <= 0.2 * greatest(len(a.text), len(b.text))
""",
)
def dedup_edit_distance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded edit-distance near-dup pairs: candidates are generated by
    a (length-bucket, 5-token-prefix) equality block — two docs whose
    lengths differ by more than the bucket width or whose openings
    differ can't be small-edit variants — then verified with exact
    Levenshtein ≤ 20% of the longer text. Blocks over 100 docs are
    dropped (deterministic skew cap, mirrored in the oracle): quadratic
    work is bounded by 100² per block, never corpus². Complements
    dedup_ngram_jaccard (bag-of-shingles) with an ORDER-sensitive edit
    measure."""
    t = Tables(spark, sf_dir)
    blocked = t.documents.select(
        "doc_id",
        "text",
        (F.col("n_chars") / F.lit(32)).cast("bigint").alias("len_bucket"),
        F.array_join(F.slice(F.split("text", " "), 1, 5), " ").alias("prefix5"),
    )
    sized = blocked.withColumn(
        "block_n", F.count(F.lit(1)).over(Window.partitionBy("len_bucket", "prefix5"))
    ).filter(F.col("block_n") <= 100)
    a = sized.alias("a")
    b = sized.alias("b")
    max_len = F.greatest(F.length(F.col("a.text")), F.length(F.col("b.text")))
    # Semantics-preserving cost cuts (oracle unchanged): edit distance is
    # >= |len(a)-len(b)|, so pairs whose length delta already exceeds the
    # threshold drop BEFORE any O(n*m) work, and byte-equal pairs (the
    # dominant candidate class once a corpus accumulates exact copies)
    # short-circuit to 0. Measured: 101 s -> 17.5 s on the 10x sweep.
    len_delta = F.abs(F.length(F.col("a.text")) - F.length(F.col("b.text")))
    dist = F.when(F.col("a.text") == F.col("b.text"), F.lit(0)).otherwise(
        F.levenshtein(F.col("a.text"), F.col("b.text"))
    )
    return (
        a.join(
            b,
            (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.prefix5") == F.col("b.prefix5"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(len_delta <= 0.2 * max_len)
        .filter(dist <= 0.2 * max_len)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# §2.Q.6 alternative means + quality matrix + label separability
# ---------------------------------------------------------------------------


@register(
    "agg_geo_harmonic_means",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       round(avg(l_quantity), 6) AS arith_mean,
       round(exp(avg(ln(l_quantity))), 6) AS geo_mean,
       round(count(*) / sum(1.0 / l_quantity), 6) AS harm_mean
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_geo_harmonic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic / geometric / harmonic means of quantity per return
    flag — the Pythagorean-means pin (quantity ≥ 1, so ln and 1/x are
    always finite). Geometric goes through exp∘avg∘ln (partial-aggregable,
    no product overflow); 6-dp rounding absorbs the engines' summation
    order."""
    t = Tables(spark, sf_dir)
    q = F.col("l_quantity")
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(q), 6).alias("arith_mean"),
        F.round(F.exp(F.avg(F.log(q))), 6).alias("geo_mean"),
        F.round(F.count(F.lit(1)) / F.sum(F.lit(1.0) / q), 6).alias("harm_mean"),
    )


@register(
    "quality_null_blank_matrix",
    oracle="""
SELECT 'text' AS column_name, count(*) AS n_rows,
       count(CASE WHEN text IS NULL THEN 1 END) AS n_null,
       count(CASE WHEN trim(text) = '' THEN 1 END) AS n_blank,
       count(DISTINCT text) AS n_distinct
FROM documents
UNION ALL
SELECT 'lang', count(*),
       count(CASE WHEN lang IS NULL THEN 1 END),
       count(CASE WHEN trim(lang) = '' THEN 1 END),
       count(DISTINCT lang)
FROM documents
UNION ALL
SELECT 'source', count(*),
       count(CASE WHEN source IS NULL THEN 1 END),
       count(CASE WHEN trim(source) = '' THEN 1 END),
       count(DISTINCT source)
FROM documents
""",
)
def quality_null_blank_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness matrix over the documents table: null /
    blank / distinct counts for each string column, emitted as one ROW
    PER COLUMN (the profiling shape downstream dashboards join on).
    Spark computes all twelve aggregates in a SINGLE pass and unpivots
    the 1-row result with stack() — the oracle's UNION ALL of three
    scans is the semantic spec, not the plan."""
    t = Tables(spark, sf_dir)
    aggs = []
    for c in ("text", "lang", "source"):
        aggs += [
            F.count(F.lit(1)).alias(f"{c}_rows"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_null"),
            F.count(F.when(F.trim(F.col(c)) == "", 1)).alias(f"{c}_blank"),
            F.count_distinct(F.col(c)).alias(f"{c}_distinct"),
        ]
    one = t.documents.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}_rows, {c}_null, {c}_blank, {c}_distinct"
        for c in ("text", "lang", "source")
    )
    return one.select(
        F.expr(
            f"stack(3, {stack_expr}) AS "
            "(column_name, n_rows, n_null, n_blank, n_distinct)"
        )
    )


@register(
    "embed_label_eta_squared",
    oracle="""
WITH dims AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
per_label AS (
  SELECT dim, label, count(*) AS n_l, avg(val) AS mu_l
  FROM dims GROUP BY dim, label
),
overall AS (
  SELECT dim, avg(val) AS mu, var_pop(val) AS var_total, count(*) AS n
  FROM dims GROUP BY dim
)
SELECT o.dim,
       round(o.var_total, 6) AS var_total,
       round(sum(p.n_l * (p.mu_l - o.mu) * (p.mu_l - o.mu)) / o.n
             / o.var_total, 6) AS eta_squared
FROM per_label p JOIN overall o ON p.dim = o.dim
GROUP BY o.dim, o.var_total, o.n
""",
)
def embed_label_eta_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension label separability: eta² = between-label variance /
    total variance for each of the 64 embedding dimensions — the ANOVA
    screen for which dimensions actually encode the label structure
    (feature selection before clustering). posexplode fans out to
    n×64 rows once; both aggregations are partial-aggregable and the
    output is 64 rows at ANY corpus size. 6-dp rounding absorbs
    summation-order noise in the double sums."""
    t = Tables(spark, sf_dir)
    dims = t.embeddings.select(
        "label", F.posexplode("embedding").alias("dim", "raw")
    ).select("label", "dim", F.col("raw").cast("double").alias("val"))
    per_label = dims.groupBy("dim", "label").agg(
        F.count(F.lit(1)).alias("n_l"), F.avg("val").alias("mu_l")
    )
    overall = dims.groupBy("dim").agg(
        F.avg("val").alias("mu"),
        F.var_pop("val").alias("var_total"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_label.join(overall, "dim")
        .groupBy("dim", "var_total", "n")
        .agg(
            F.round(
                F.sum(
                    F.col("n_l") * (F.col("mu_l") - F.col("mu"))
                    * (F.col("mu_l") - F.col("mu"))
                )
                / F.col("n")
                / F.col("var_total"),
                6,
            ).alias("eta_squared")
        )
        .select("dim", F.round("var_total", 6).alias("var_total"), "eta_squared")
    )
