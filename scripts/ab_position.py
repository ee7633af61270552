"""Same-session position A/B for pipeline_cdc_apply_deletes (VERDICT-r10
item 5).

BENCH_r10 printed the query at 1.50x its r9 time (0.385 -> 0.577 s) —
exactly the documented cross-round noise-band edge — two rounds after its
code path last changed. Hypothesis space: (a) cross-round band noise
(different process, different box load), or (b) a real suite-POSITION
effect (the query runs late in bench.py's HEADLINE order, after ~30 heavy
queries have churned the JVM heap / code cache / shuffle dirs).

Method, one warm session (bench.py methodology — warm tables, AQE off,
untimed pre-pass): min-of-3 the query EARLY (right after warm-up), then
run the full HEADLINE prefix that precedes it in the bench suite once
(the pressure the real bench applies), then min-of-3 it LATE, then again
LATER after a second pressure pass. late/early ~ 1 ==> position is
irrelevant and the r9->r10 delta is band noise; late/early >~ 1.3
reproducibly ==> a real position effect that bench ordering must account
for.

Usage: python scripts/ab_position.py   (writes one JSON line)
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

TARGET = "pipeline_cdc_apply_deletes"


def timed(fn, spark, n=3) -> dict[str, float]:
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).toPandas()
        times.append(time.perf_counter() - t0)
    return {
        "min": round(min(times), 4),
        "max": round(max(times), 4),
        "spread": round(max(times) / min(times), 3),
    }


def main() -> None:
    import bench
    from ai_dataingestion_spark.catalog import queries
    from ai_dataingestion_spark.registry import warm_tables
    from ai_dataingestion_spark.session import get_spark

    spark = get_spark(
        "ab-position", master=f"local[{CPUS}]",
        shuffle_partitions=min(16, int(CPUS)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    warm_tables(spark, SF_DIR, n_partitions=min(16, int(CPUS)))

    qs = queries()
    fn = qs[TARGET]
    prefix = [q for q in bench.HEADLINE if q != TARGET]

    fn(spark, SF_DIR).toPandas()  # untimed pre-pass (JIT, worker spin-up)
    early = timed(fn, spark)

    for qid in prefix:  # the suite pressure the real bench applies
        qs[qid](spark, SF_DIR).toPandas()
    late = timed(fn, spark)

    for qid in prefix:
        qs[qid](spark, SF_DIR).toPandas()
    later = timed(fn, spark)

    out = {
        "ab_position": {
            "target": TARGET,
            "early": early,
            "late_after_suite": late,
            "later_after_2_suites": later,
            "late_over_early": round(late["min"] / early["min"], 3),
            "later_over_early": round(later["min"] / early["min"], 3),
        },
        "sf_dir": SF_DIR,
        "loadavg": list(os.getloadavg()),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
