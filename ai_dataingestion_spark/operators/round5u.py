"""Round-5 twenty-first wave (SURVEY.md §2.Q, continued): BM25 lexical
ranking, inverted-index boolean search, doc⇄embedding coverage audit,
and rolling 7-day distinct actives via the explode-offset pattern.

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


_BM25_TERMS = ["hash", "join", "filter"]
_K1, _B = 1.2, 0.75


def _bm25_term_sql(term: str) -> str:
    """One term's BM25 contribution (DuckDB dialect), 0 when absent."""
    return f"""
coalesce(max(CASE WHEN term = '{term}' THEN
  ln((nd - df + 0.5) / (df + 0.5) + 1)
  * (tf * ({_K1} + 1))
  / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl))
END), 0.0)"""


@register(
    "text_bm25_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl_rel AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS nd,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl_rel
),
tf_rel AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM toks WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
  GROUP BY doc_id, term
),
df_rel AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf_rel GROUP BY term
),
scored AS (
  SELECT t.doc_id,
         {" + ".join("(" + _bm25_term_sql(t) + ")" for t in _BM25_TERMS)}
           AS score
  FROM tf_rel t
  JOIN df_rel USING (term)
  JOIN dl_rel USING (doc_id)
  CROSS JOIN stats
  GROUP BY t.doc_id
)
SELECT doc_id, score FROM (
  SELECT doc_id,
         floor(score * 1000000 + 0.5) / 1000000 AS score,
         row_number() OVER (
           ORDER BY floor(score * 1000000 + 0.5) / 1000000 DESC, doc_id
         ) AS rn
  FROM scored)
WHERE rn <= 20
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical ranking (Robertson-Walker, k1=1.2 b=0.75) for the
    fixed query {{hash, join, filter}}: THE retrieval scorer behind
    every keyword-search and hybrid-RAG pipeline, built relationally —
    tf/df/doclen from exact integer counts, idf the +1-smoothed form,
    per-term contributions assembled via conditional aggregation so the
    three-term sum has a FIXED evaluation order (a GROUP BY over terms
    would sum in nondeterministic order), then 6dp-rounded BEFORE the
    deterministic top-20 cut. Scale shape: one token explode, (doc,
    term) and (term) aggregates, df/stats broadcast — the inverted-
    index build cost, paid once."""
    d = Tables(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl_rel = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("double").alias("dl")
    )
    stats = dl_rel.agg(
        F.count(F.lit(1)).cast("double").alias("nd"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf_rel = (
        toks.filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_rel = tf_rel.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    joined = (
        tf_rel.join(F.broadcast(df_rel), "term")
        .join(dl_rel, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    contrib = (
        F.log(
            (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
        )
        * (F.col("tf") * (_K1 + 1))
        / (
            F.col("tf")
            + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, contrib)), F.lit(0.0)
        )
        for t in _BM25_TERMS
    ]
    score = per_term[0] + per_term[1] + per_term[2]
    scored = joined.groupBy("doc_id").agg(_pround(score).alias("score"))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "score")
    )


@register(
    "search_inverted_index_and_query",
    oracle="""
WITH idx AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
)
SELECT 'hash AND join' AS query, count(*) AS n_matches,
       min(a.doc_id) AS first_doc, max(a.doc_id) AS last_doc
FROM idx a JOIN idx b ON a.doc_id = b.doc_id
WHERE a.term = 'hash' AND b.term = 'join'
UNION ALL
SELECT 'filter AND merge', count(*), min(a.doc_id), max(a.doc_id)
FROM idx a JOIN idx b ON a.doc_id = b.doc_id
WHERE a.term = 'filter' AND b.term = 'merge'
UNION ALL
SELECT 'scan AND NOT batch', count(*), min(a.doc_id), max(a.doc_id)
FROM idx a
WHERE a.term = 'scan'
  AND NOT EXISTS (SELECT 1 FROM idx b
                  WHERE b.doc_id = a.doc_id AND b.term = 'batch')
""",
)
def search_inverted_index_and_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inverted-index boolean retrieval: the postings relation
    (term → doc) built once, then three query shapes answered from it —
    conjunction (postings self-join on doc), and negation (anti join) —
    the boolean-search core of every lexical engine, and the same
    candidate-generation shape the rare-shingle dedup index uses.
    Postings are distinct (term, doc) pairs; each query touches only
    its terms' postings lists. The index is cached across the three
    queries."""
    d = Tables(spark, sf_dir).documents
    idx = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
        .cache()
    )

    def postings(term: str) -> DataFrame:
        return idx.filter(F.col("term") == term).select("doc_id")

    def q_and(name: str, t1: str, t2: str) -> DataFrame:
        m = postings(t1).join(postings(t2), "doc_id")
        return m.agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        ).select(F.lit(name).alias("query"), "n_matches", "first_doc", "last_doc")

    def q_and_not(name: str, t1: str, t2: str) -> DataFrame:
        m = postings(t1).join(postings(t2), "doc_id", "left_anti")
        return m.agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        ).select(F.lit(name).alias("query"), "n_matches", "first_doc", "last_doc")

    return (
        q_and("hash AND join", "hash", "join")
        .unionByName(q_and("filter AND merge", "filter", "merge"))
        .unionByName(q_and_not("scan AND NOT batch", "scan", "batch"))
    )


@register(
    "multimodal_coverage_audit",
    oracle="""
WITH avail AS (SELECT vec_id FROM embeddings WHERE vec_id % 7 <> 0)
SELECT
  (SELECT count(*) FROM documents) AS n_docs,
  (SELECT count(*) FROM avail) AS n_vectors,
  (SELECT count(*) FROM documents d
   WHERE NOT EXISTS (SELECT 1 FROM avail a WHERE a.vec_id = d.doc_id))
    AS docs_missing_vector,
  (SELECT count(*) FROM avail a
   WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = a.vec_id))
    AS dangling_vectors,
  floor((SELECT CAST(count(*) AS DOUBLE) FROM documents d
         WHERE EXISTS (SELECT 1 FROM avail a WHERE a.vec_id = d.doc_id))
        / (SELECT count(*) FROM documents) * 1000000 + 0.5) / 1000000
    AS coverage_ratio
""",
)
def multimodal_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal referential coverage: how many documents lack an
    embedding, how many embeddings dangle without a document, and the
    coverage ratio — the audit run before any multimodal join is
    trusted (a silent inner join would just drop the uncovered rows).
    The corpus ships with PERFECT 1:1 coverage [measured], so gaps are
    injected (vectors with vec_id % 7 = 0 withheld — the simulated
    failed-embedding-job slice) to keep the audit non-degenerate. Two
    anti-join counts + one semi count over key-only projections."""
    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id")
    avail = t.embeddings.filter(F.col("vec_id") % 7 != 0).select("vec_id")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    n_vec = avail.agg(F.count(F.lit(1)).alias("n_vectors"))
    missing = docs.join(
        avail, docs.doc_id == avail.vec_id, "left_anti"
    ).agg(F.count(F.lit(1)).alias("docs_missing_vector"))
    dangling = avail.join(
        docs, docs.doc_id == avail.vec_id, "left_anti"
    ).agg(F.count(F.lit(1)).alias("dangling_vectors"))
    covered = docs.join(
        avail, docs.doc_id == avail.vec_id, "left_semi"
    ).agg(F.count(F.lit(1)).cast("double").alias("n_cov"))
    return (
        n_docs.crossJoin(F.broadcast(n_vec))
        .crossJoin(F.broadcast(missing))
        .crossJoin(F.broadcast(dangling))
        .crossJoin(F.broadcast(covered))
        .select(
            "n_docs",
            "n_vectors",
            "docs_missing_vector",
            "dangling_vectors",
            _pround(F.col("n_cov") / F.col("n_docs")).alias(
                "coverage_ratio"
            ),
        )
    )


@register(
    "events_rolling_7d_active_users",
    oracle="""
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
expanded AS (
  SELECT user_id, day + CAST(off AS INT) AS window_day
  FROM user_days, unnest(generate_series(0, 6)) g(off)
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM user_days)
SELECT CAST(window_day AS TIMESTAMP) AS window_day,
       count(DISTINCT user_id) AS active_7d
FROM expanded CROSS JOIN bounds
WHERE window_day >= d0 AND window_day <= d1
GROUP BY window_day
""",
)
def events_rolling_7d_active_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling 7-day distinct active users per day — the windowed
    DISTINCT that neither window frames (no COUNT DISTINCT OVER) nor
    plain grouping can express — via the EXPLODE-OFFSET pattern: each
    distinct (user, day) activity emits itself into the 7 window-days
    it contributes to (map-side ×7 fan-out of user-day rows, never raw
    events), then one distinct-count per window-day. Calendar edges
    trimmed to observed days. This is the standard WAU/rolling-MAU
    shape at any scale: fan-out is bounded by window length, not data
    skew."""
    e = Tables(spark, sf_dir).events
    user_days = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    bounds = user_days.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    expanded = user_days.select(
        "user_id",
        F.explode(
            F.expr("sequence(0, 6)")
        ).alias("off"),
        "day",
    ).select(
        "user_id", F.expr("date_add(day, off)").alias("window_day")
    )
    return (
        expanded.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("window_day") >= F.col("d0"))
            & (F.col("window_day") <= F.col("d1"))
        )
        .groupBy(F.col("window_day").cast("timestamp").alias("window_day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )
