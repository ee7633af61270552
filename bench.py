"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "suite_warm_seconds", "value": <sum>, "unit": "sec",
   "queries": {...per-query median warm sec...}, "sf": <sf>}

Methodology (BASELINE.md): the DuckDB baseline numbers are warm single-node
timings (engine buffer pool populated, intra-query parallelism available),
so the Spark side is measured in the equivalent warm state:

- one shared SparkSession (JVM amortized),
- base tables materialized in the in-memory columnar cache, REPARTITIONED
  for parallelism (registry.warm_tables) — the corpus parquet files are
  single-row-group, so cold scans would be single-task by file layout, which
  is a fixture artifact, not an engine property,
- per query: one untimed warmup (whole-stage codegen JIT), then the median
  of 3 timed runs; each timed run builds a FRESH plan and executes every
  stage end-to-end (no shuffle-stage reuse) with an Arrow toPandas collect.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# BASELINE.md's six representative queries (§2.D/C/E/I/K shapes) plus the
# extended set measured against DuckDB in BASELINE.md's engine table
# (composite TPC-H shape, AI-pipeline dedup/similarity, funnel, compaction).
HEADLINE = (
    "agg_groupby",
    "join_multiway",
    "win_topk_group",
    "stream_tumbling",
    "sim_cosine_topk",
    "stream_session",
    "tpch_q5_local_volume",
    "dedup_exact",
    "text_tfidf",
    "multimodal_join",
    "dedup_ngram_jaccard",
    "sim_pair_dedup",
    "events_funnel",
    "pipeline_compact_latest",
)

N_RUNS = 3
SLOW_QUERY_CUTOFF_S = 5.0  # warmup slower than this -> single timed run


def main() -> None:
    from ai_dataingestion_spark.catalog import queries
    from ai_dataingestion_spark.registry import warm_tables
    from ai_dataingestion_spark.session import get_spark

    spark = get_spark(
        "ai_dataingestion_spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=min(16, int(CPUS)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_tables(spark, SF_DIR, n_partitions=min(16, int(CPUS)))

    qs = queries()
    results: dict[str, float] = {}
    for qid in HEADLINE:
        fn = qs[qid]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).toPandas()  # warmup: codegen JIT + broadcast build
        warm_cost = time.perf_counter() - t0
        n_runs = 1 if warm_cost > SLOW_QUERY_CUTOFF_S else N_RUNS
        times = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toPandas()  # fresh plan, full execution
            times.append(time.perf_counter() - t0)
        results[qid] = round(statistics.median(times), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "suite_warm_seconds",
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": results,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
