"""Round-5 seventh wave (SURVEY.md §2.Q, continued): growth accounting
(weekly new/retained/resurrected/churned user states), a cross-table
referential-integrity audit with injected violations, a time-bounded
conversion funnel (each step within 24 h of the previous), and MinHash
estimate-vs-exact Jaccard calibration over known near-dup pairs.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.scale import broadcast_if_small
from ai_dataingestion_spark.registry import Tables

_EPOCH = "DATE '2024-01-01'"


@register(
    "events_user_lifecycle_states",
    oracle=f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         datediff('day', {_EPOCH}, CAST(ts AS DATE)) // 7 AS week
  FROM events
),
maxw AS (SELECT max(week) AS max_week FROM uw),
flagged AS (
  SELECT user_id, week,
         min(week) OVER (PARTITION BY user_id) AS first_week,
         lag(week)  OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
         lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
  FROM uw
),
states AS (
  SELECT week,
         count(CASE WHEN week = first_week THEN 1 END) AS n_new,
         count(CASE WHEN week > first_week AND prev_week = week - 1
                    THEN 1 END) AS n_retained,
         count(CASE WHEN week > first_week
                     AND (prev_week IS NULL OR prev_week < week - 1)
                    THEN 1 END) AS n_resurrected
  FROM flagged GROUP BY week
),
churn AS (
  SELECT f.week + 1 AS week, count(*) AS n_churned
  FROM flagged f CROSS JOIN maxw m
  WHERE (f.next_week IS NULL OR f.next_week > f.week + 1)
    AND f.week + 1 <= m.max_week
  GROUP BY f.week + 1
)
SELECT s.week, s.n_new, s.n_retained, s.n_resurrected,
       COALESCE(c.n_churned, 0) AS n_churned
FROM states s LEFT JOIN churn c ON s.week = c.week
""",
)
def events_user_lifecycle_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per week, users who are NEW (first activity),
    RETAINED (also active the prior week), RESURRECTED (returning after
    a gap), and CHURNED (active the prior week, absent now) — the
    canonical DAU-quality decomposition. Distinct-reduce first: every
    window runs over the (user, week) relation (≤ users × weeks rows);
    the churn anchor week comes from a scalar broadcast, never a global
    window over the grid."""
    t = Tables(spark, sf_dir)
    week = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        / 7
    ).cast("bigint")
    uw = t.events.select("user_id", week.alias("week")).distinct()
    # churn anchor from RAW events (same max as over the distinct grid):
    # deriving it from uw would replay the distinct shuffle for a scalar
    maxw = t.events.agg(F.max(week).alias("max_week"))
    w_user = Window.partitionBy("user_id")
    w_seq = Window.partitionBy("user_id").orderBy("week")
    flagged = uw.select(
        "user_id",
        "week",
        F.min("week").over(w_user).alias("first_week"),
        F.lag("week").over(w_seq).alias("prev_week"),
        F.lead("week").over(w_seq).alias("next_week"),
    )
    states = flagged.groupBy("week").agg(
        F.count(F.when(F.col("week") == F.col("first_week"), 1)).alias("n_new"),
        F.count(
            F.when(
                (F.col("week") > F.col("first_week"))
                & (F.col("prev_week") == F.col("week") - 1),
                1,
            )
        ).alias("n_retained"),
        F.count(
            F.when(
                (F.col("week") > F.col("first_week"))
                & (
                    F.col("prev_week").isNull()
                    | (F.col("prev_week") < F.col("week") - 1)
                ),
                1,
            )
        ).alias("n_resurrected"),
    )
    churn = (
        flagged.crossJoin(F.broadcast(maxw))
        .filter(
            (F.col("next_week").isNull() | (F.col("next_week") > F.col("week") + 1))
            & (F.col("week") + 1 <= F.col("max_week"))
        )
        .groupBy((F.col("week") + 1).alias("week"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        states.join(churn, "week", "left")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0)).alias("n_churned"),
        )
    )


_RI_OFFSET = 900_000_000


@register(
    "quality_referential_integrity",
    oracle=f"""
WITH bad_orders AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + {_RI_OFFSET}
              ELSE o_custkey END AS o_custkey
  FROM orders
),
bad_lineitem AS (
  SELECT l_orderkey,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 101 = 0
              THEN l_partkey + {_RI_OFFSET} ELSE l_partkey END AS l_partkey,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 103 = 0
              THEN l_suppkey + {_RI_OFFSET} ELSE l_suppkey END AS l_suppkey
  FROM lineitem
)
SELECT 'orders.custkey->customer' AS fk, count(*) AS n_rows,
       count(CASE WHEN c_custkey IS NULL THEN 1 END) AS n_orphans
FROM bad_orders LEFT JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'lineitem.partkey->part', count(*),
       count(CASE WHEN p_partkey IS NULL THEN 1 END)
FROM bad_lineitem LEFT JOIN part ON l_partkey = p_partkey
UNION ALL
SELECT 'lineitem.suppkey->supplier', count(*),
       count(CASE WHEN s_suppkey IS NULL THEN 1 END)
FROM bad_lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
""",
)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for three
    foreign keys, against a corpus with deterministically injected FK
    violations (every 97th order's custkey, every 101st/103rd line's
    part/supp key pushed out of range — the corpus itself is FK-clean,
    so an un-mutated audit proves nothing). Each check is one left join
    + conditional count; the dimension sides broadcast. The cross-table
    sibling of quality_constraints (single-table rules) and
    pipeline_reconcile_totals (value-level reconciliation)."""
    t = Tables(spark, sf_dir)
    bad_orders = t.orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_custkey") + _RI_OFFSET
        )
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
    )
    lk = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    bad_lineitem = t.lineitem.select(
        "l_orderkey",
        F.when(lk % 101 == 0, F.col("l_partkey") + _RI_OFFSET)
        .otherwise(F.col("l_partkey"))
        .alias("l_partkey"),
        F.when(lk % 103 == 0, F.col("l_suppkey") + _RI_OFFSET)
        .otherwise(F.col("l_suppkey"))
        .alias("l_suppkey"),
    )

    def audit(name, child, child_key, dim, dim_key, dim_table):
        joined = child.join(
            broadcast_if_small(dim, sf_dir, dim_table),
            F.col(child_key) == F.col(dim_key),
            "left",
        )
        return joined.agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(dim_key).isNull(), 1)).alias("n_orphans"),
        ).select("fk", "n_rows", "n_orphans")

    return (
        audit(
            "orders.custkey->customer",
            bad_orders,
            "o_custkey",
            t.customer.select("c_custkey"),
            "c_custkey",
                "customer",
        )
        .unionByName(
            audit(
                "lineitem.partkey->part",
                bad_lineitem,
                "l_partkey",
                t.part.select("p_partkey"),
                "p_partkey",
                "part",
            )
        )
        .unionByName(
            audit(
                "lineitem.suppkey->supplier",
                bad_lineitem,
                "l_suppkey",
                t.supplier.select("s_suppkey"),
                "s_suppkey",
                "supplier",
            )
        )
    )


@register(
    "events_funnel_time_bounded",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOUR
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_24h,
       (SELECT count(*) FROM p) AS n_purchased_24h
""",
)
def events_funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel: first view → first click within
    24 h of it → first purchase within 24 h of that. The unbounded
    events_funnel counts eventual converters; this one enforces the
    step deadline product analytics actually uses. Each stage is one
    per-user aggregate + one user-keyed join — the stage relations
    shrink monotonically, and nothing self-joins raw events against raw
    events."""
    t = Tables(spark, sf_dir)
    ev = t.events
    # v and c each feed BOTH their own stage count and the next stage:
    # uncached, Spark recomputes the chain per count (events scanned
    # 1+2+3 = 6 times; measured 9.6 s -> 4.3 s at the 10x sweep). The
    # cached relations are per-user aggregates (users-sized, spill-safe).
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .cache()
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v.select(F.col("user_id").alias("vu"), "t1"),
              F.col("user_id") == F.col("vu"))
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .cache()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select(F.col("user_id").alias("cu"), "t2"),
              F.col("user_id") == F.col("cu"))
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_viewed"))
    nc = c.agg(F.count(F.lit(1)).alias("n_clicked_24h"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchased_24h"))
    return nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))


def _minhash_error_oracle() -> str:
    from ai_dataingestion_spark.ai.dedup import (
        _CW_A,
        _CW_B,
        _DUP_OFFSET,
        _MERSENNE_P,
        _duck_h,
        N_HASHES,
        SHINGLE_K,
    )

    sig_cols = ", ".join(
        "min((%d * hm + %d) %% %d) AS h%d" % (_CW_A[i], _CW_B[i], _MERSENNE_P, i)
        for i in range(N_HASHES)
    )
    eq_sum = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(N_HASHES)
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET},
         list_slice(string_split(text, ' '), 1, len(string_split(text, ' ')) - 1)
  FROM documents WHERE doc_id % 5 = 0
),
shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - {SHINGLE_K - 2}, 2)),
           i -> array_to_string(list_slice(toks, i, i + {SHINGLE_K - 1}), ' ')
         )) AS shingles
  FROM corpus
),
sp AS (SELECT doc_id, {_duck_h("shingle")} % {_MERSENNE_P} AS hm
       FROM (SELECT doc_id, unnest(shingles) AS shingle FROM shingled)),
sig AS (SELECT doc_id, {sig_cols} FROM sp GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_id, ({eq_sum}) AS n_eq
  FROM sig a JOIN sig b ON b.doc_id = a.doc_id + {_DUP_OFFSET}
  WHERE a.doc_id % 5 = 0 AND a.doc_id < {_DUP_OFFSET}
),
exact AS (
  SELECT p.doc_id, p.n_eq,
         CAST(len(list_filter(s1.shingles, s -> list_contains(s2.shingles, s)))
              AS DOUBLE)
         / (len(s1.shingles) + len(s2.shingles)
            - len(list_filter(s1.shingles, s -> list_contains(s2.shingles, s))))
           AS j_raw
  FROM pairs p
  JOIN shingled s1 ON s1.doc_id = p.doc_id
  JOIN shingled s2 ON s2.doc_id = p.doc_id + {_DUP_OFFSET}
)
SELECT doc_id,
       floor(j_raw * 1000000 + 0.5) / 1000000 AS jaccard_exact,
       CAST(n_eq AS DOUBLE) / {N_HASHES} AS jaccard_est,
       floor(abs(CAST(n_eq AS DOUBLE) / {N_HASHES} - j_raw) * 1000000 + 0.5)
         / 1000000 AS abs_err
FROM exact
"""


@register("dedup_minhash_estimate_error", oracle=_minhash_error_oracle())
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration: for every KNOWN near-dup pair (doc, doc with
    its last token dropped — the _corpus_with_near_dups fixture), the
    signature-estimated Jaccard (matching fraction of the 32 slots) next
    to the exact shingle-set Jaccard, per pair with absolute error — the
    introspection query that tells you whether 32 hashes are enough for
    your threshold before you trust an LSH sweep at corpus scale.
    Signatures are the same portable Carter-Wegman pipeline as
    dedup_near_minhash (oracle-identical end-to-end); the estimate k/32
    is binary-exact so only the exact-Jaccard ratio needs the portable
    floor(x·1e6+0.5)/1e6 rounding (SURVEY §5.4 round-tie trap)."""
    from ai_dataingestion_spark.ai.dedup import (
        _CW_A,
        _CW_B,
        _DUP_OFFSET,
        _MERSENNE_P,
        _SHINGLES_EXPR,
        _corpus_with_near_dups,
        _spark_h,
        N_HASHES,
    )

    corpus = _corpus_with_near_dups(spark, sf_dir).withColumn(
        "toks", F.split("text", " ")
    )
    docs = corpus.select("doc_id", F.expr(_SHINGLES_EXPR).alias("shingles"))
    sp = docs.select("doc_id", F.explode("shingles").alias("shingle")).select(
        "doc_id", F.expr(f"{_spark_h('shingle')} % {_MERSENNE_P}").alias("hm")
    )
    # cache: both pair sides consume sig — uncached, Spark replays the
    # explode + 32-min aggregation per side. docs-count-sized (33 cols).
    sig = sp.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(_CW_A[i]) * F.col("hm") + F.lit(_CW_B[i])) % _MERSENNE_P
            ).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    ).cache()
    a = sig.alias("a")
    b = sig.alias("b")
    n_eq = sum(
        F.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    pairs = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + _DUP_OFFSET)
        .filter((F.col("a.doc_id") % 5 == 0) & (F.col("a.doc_id") < _DUP_OFFSET))
        .select(F.col("a.doc_id").alias("doc_id"), n_eq.alias("n_eq"))
    )
    s1 = docs.select(F.col("doc_id").alias("d1"), F.col("shingles").alias("sh1"))
    s2 = docs.select(F.col("doc_id").alias("d2"), F.col("shingles").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2"))
    union = F.size("sh1") + F.size("sh2") - inter
    j_raw = inter.cast("double") / union
    est = F.col("n_eq").cast("double") / N_HASHES
    return (
        pairs.join(s1, F.col("doc_id") == F.col("d1"))
        .join(s2, F.col("doc_id") + _DUP_OFFSET == F.col("d2"))
        .select(
            "doc_id",
            (F.floor(j_raw * 1_000_000 + 0.5) / 1_000_000).alias("jaccard_exact"),
            est.alias("jaccard_est"),
            (F.floor(F.abs(est - j_raw) * 1_000_000 + 0.5) / 1_000_000).alias(
                "abs_err"
            ),
        )
    )
