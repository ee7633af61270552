"""Round-5 eighth wave (SURVEY.md §2.Q, continued): discrete-vs-
continuous percentile parity, two-step event path mining, the shingle
document-frequency spectrum (the introspection that justifies the
rare-shingle DF cap), and a per-type ingestion freshness report.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "win_percentile_disc_vs_cont",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS p50_disc,
       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50_cont,
       CAST(quantile_disc(l_quantity, 0.9) AS DOUBLE) AS p90_disc,
       CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90_cont
FROM lineitem GROUP BY l_returnflag
""",
)
def win_percentile_disc_vs_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete vs continuous percentiles side by side (§2.D family
    completion): percentile_disc returns an actual data value (what a
    'p90 order actually looked like'), percentile_cont interpolates —
    the distinction that matters when the value is fed back into a
    filter. Quantity values carry ≤ 2 decimals and midpoints halve
    exactly in binary, so no rounding layer is needed for parity."""
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)"
        ).alias("p50_disc"),
        F.expr(
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)"
        ).alias("p50_cont"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)"
        ).alias("p90_disc"),
        F.expr(
            "percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)"
        ).alias("p90_cont"),
    )


@register(
    "events_markov_2step_paths",
    oracle="""
WITH seq AS (
  SELECT event_type AS step3,
         lag(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS step2,
         lag(event_type, 2) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS step1
  FROM events
)
SELECT step1, step2, step3, count(*) AS n_paths
FROM seq WHERE step1 IS NOT NULL AND step2 IS NOT NULL
GROUP BY step1, step2, step3
""",
)
def events_markov_2step_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step path mining: counts of every (A → B → C) event-type
    trigram along user timelines — the sequence-mining extension of
    events_transition_matrix (1-step). One user-partitioned window
    carrying only the type column produces both lags; output is bounded
    by |types|³ at any event volume."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        F.col("event_type").alias("step3"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.lag("event_type", 2).over(w).alias("step1"),
    )
    return (
        seq.filter(F.col("step1").isNotNull() & F.col("step2").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )


@register(
    "text_shingle_df_spectrum",
    oracle="""
WITH shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 1, 2)),
           i -> array_to_string(
                  list_slice(string_split(text, ' '), i, i + 2), ' ')
         )) AS shingles
  FROM documents
),
df AS (
  SELECT shingle, count(*) AS doc_freq
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM shingled)
  GROUP BY shingle
)
SELECT doc_freq, count(*) AS n_shingles
FROM df GROUP BY doc_freq
""",
)
def text_shingle_df_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency spectrum of 3-token shingles: how many
    distinct shingles appear in exactly k documents — the measurement
    that justifies (or refutes) the rare-shingle DF≤50 cap the near-dup
    index rests on (ai/dedup.py): a heavy tail above the cap means the
    hot-hash rescue path actually carries load. Two chained
    partial-aggregable groupBys; the spectrum is ≤ max-df rows."""
    from ai_dataingestion_spark.ai.dedup import _SHINGLES_EXPR

    t = Tables(spark, sf_dir)
    docs = t.documents.withColumn("toks", F.split("text", " ")).select(
        "doc_id", F.expr(_SHINGLES_EXPR).alias("shingles")
    )
    df = (
        docs.select("doc_id", F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    return df.groupBy("doc_freq").agg(F.count(F.lit(1)).alias("n_shingles"))


@register(
    "pipeline_watermark_lag_report",
    oracle="""
WITH per_type AS (
  SELECT event_type, max(ts) AS last_seen, count(*) AS n_events
  FROM events GROUP BY event_type
)
SELECT event_type, last_seen, n_events,
       CAST(floor((epoch(max(last_seen) OVER ()) - epoch(last_seen)) / 60)
            AS BIGINT) AS minutes_behind,
       floor((epoch(max(last_seen) OVER ()) - epoch(last_seen)) / 60) >= 60
         AS is_stale
FROM per_type
""",
)
def pipeline_watermark_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion freshness report: per event type, the last event seen
    and how many whole minutes it trails the freshest type — the
    watermark-lag table an ingest pipeline publishes so a stalled
    upstream (≥ 60 min behind) pages someone. Aggregate-first: the
    global anchor is a window over the types-sized relation; lag is
    integer minutes (floor of an epoch-second difference — exact
    arithmetic, no float parity surface)."""
    t = Tables(spark, sf_dir)
    per_type = t.events.groupBy("event_type").agg(
        F.max("ts").alias("last_seen"), F.count(F.lit(1)).alias("n_events")
    )
    anchor = F.max("last_seen").over(Window.partitionBy())
    behind = F.floor(
        (F.unix_timestamp(anchor) - F.unix_timestamp("last_seen")) / 60
    ).cast("bigint")
    return per_type.select(
        "event_type",
        "last_seen",
        "n_events",
        behind.alias("minutes_behind"),
        (behind >= 60).alias("is_stale"),
    )


def _range_search_oracle() -> str:
    from ai_dataingestion_spark.ai.similarity import _COSINE_PAIRS_SQL

    return f"""
WITH {_COSINE_PAIRS_SQL}
SELECT probe_id, neighbor_id, round(cos, 9) AS cos
FROM pairs WHERE round(cos, 9) >= 0.3
"""


@register("sim_cosine_range_search", oracle=_range_search_oracle())
def sim_cosine_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range similarity search: EVERY neighbor with cosine ≥ 0.3 of each
    probe — the epsilon-ball companion to sim_cosine_topk's kNN (a range
    query returns all sufficiently-similar items, however many; top-k
    returns k, however dissimilar — retrieval pipelines need both). Same
    one-Arrow-crossing matmul kernel and 9-dp parity rounding; the
    threshold filter replaces the rank window, so no per-probe sort at
    all — at scale this is strictly cheaper than top-k."""
    import numpy as np
    import pandas as pd

    from ai_dataingestion_spark.ai.similarity import _probe_matrix

    e = Tables(spark, sf_dir).embeddings
    pids, Pn = _probe_matrix(spark, sf_dir)

    def score(batches):
        for pdf in batches:
            if not len(pdf) or not len(pids):
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            Bn = B / np.sqrt((B * B).sum(axis=1, keepdims=True))
            C = np.round(Bn @ Pn.T, 9)  # (n_batch, n_probes)
            ni, pi = np.nonzero(C >= 0.3)  # kernel-side threshold: only
            # qualifying pairs cross back out of the Python worker
            yield pd.DataFrame(
                {
                    "probe_id": np.asarray(pids)[pi],
                    "neighbor_id": pdf["vec_id"].to_numpy()[ni],
                    "cos": C[ni, pi],
                }
            )

    return (
        e.select("vec_id", "embedding")
        .mapInPandas(score, "probe_id bigint, neighbor_id bigint, cos double")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
    )
