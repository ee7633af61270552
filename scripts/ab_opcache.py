"""A/B: did the opcache release-at-next-operator-start fix (commit c27556b)
*correct* earlier flattered bench numbers, or regress real work?

Hypothesis (VERDICT r7 'what's wrong' item 1): pre-r7 min-of-3 numbers for
op_cache-using queries were flattered — Spark's CacheManager substitutes any
analyzed-plan fragment equal to a persisted one, so run 2/3 of min-of-3
silently reused run 1's persisted intermediates. Post-fix, each run releases
the previous invocation's caches and recomputes, so min-of-3 reports the
honest cost of a fresh execution.

Method: one warm session (bench.py methodology — AQE off at bench SF, warm
tables, untimed pre-pass), then per query min-of-3 twice:
  [release]   opcache release active (post-c27556b, today's bench path)
  [noop]      release_op_caches monkeypatched to a no-op (pre-c27556b
              behavior: runs 2-3 hit run 1's persisted caches)
A noop/release ratio well under 1 on exactly the cache-using queries — and
~1 on the no-cache control — confirms the measurement-correction reading.

Usage: python scripts/ab_opcache.py   (writes one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

# The three queries whose r6->r7 delta exceeded the 1.5x noise band, plus a
# no-op_cache control with similar wall time.
CACHE_USERS = (
    "graph_copurchase_triangles",
    "sql_recursive_cte_rollup",
    "embed_kmeans_iterations",
)
CONTROL = ("dedup_fingerprint_pairs",)  # no op_cache in its plan


def min_of_3(fn, spark) -> float:
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).toPandas()
        times.append(time.perf_counter() - t0)
    return round(min(times), 4)


def main() -> None:
    from ai_dataingestion_spark import opcache
    from ai_dataingestion_spark.catalog import queries
    from ai_dataingestion_spark.registry import warm_tables
    from ai_dataingestion_spark.session import get_spark

    spark = get_spark(
        "ab-opcache", master=f"local[{CPUS}]",
        shuffle_partitions=min(16, int(CPUS)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    warm_tables(spark, SF_DIR, n_partitions=min(16, int(CPUS)))

    qs = queries()
    out: dict[str, dict[str, float]] = {}
    real_release = opcache.release_op_caches
    for qid in CACHE_USERS + CONTROL:
        fn = qs[qid]
        fn(spark, SF_DIR).toPandas()  # untimed pre-pass (JIT, workers)

        with_release = min_of_3(fn, spark)

        # pre-c27556b behavior: caches never released between invocations
        opcache.release_op_caches = lambda: None
        try:
            no_release = min_of_3(fn, spark)
        finally:
            opcache.release_op_caches = real_release
            real_release()  # drop whatever the noop phase left persisted

        out[qid] = {
            "release": with_release,
            "noop": no_release,
            "noop_over_release": round(no_release / with_release, 3),
        }

    print(json.dumps({"ab_opcache": out, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
