"""Per-query optimization profile: plan-build time vs execution time, plus
plan-shape counters (Exchange / Python-eval / scan counts) for the bench
suite. Guide §1 (measure first): separates driver-side planning cost from
executor compute so optimization effort lands where the time actually goes.

Usage: python scripts/profile_queries.py [query ...]   (default: HEADLINE)

Prints one JSON line per query:
  {"q": id, "plan_s": ..., "exec_s": [...], "exchanges": n,
   "py_evals": n, "scans": n, "codegen_spans": n}

Same session shape as bench.py (warm tables, AQE off at sf<1, 16 shuffle
partitions) so numbers correspond to the bench's timed state.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = 3


def main() -> int:
    import bench
    from ai_dataingestion_spark.catalog import queries
    from ai_dataingestion_spark.registry import warm_tables
    from ai_dataingestion_spark.session import get_spark

    ids = sys.argv[1:] or list(bench.HEADLINE)

    spark = get_spark(
        "ai_dataingestion_spark-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=min(16, int(CPUS)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        bench_sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        bench_sf = 1.0
    if bench_sf < 1:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    warm_tables(spark, SF_DIR, n_partitions=min(16, int(CPUS)))

    qs = queries()
    for qid in ids:
        if qid not in qs:
            print(json.dumps({"q": qid, "err": "not registered"}))
            continue
        # warm pre-pass (codegen JIT, python workers, broadcasts)
        qs[qid](spark, SF_DIR).toPandas()
        # plan-build + optimize time: DataFrame construction through
        # formatted explain (analysis + optimization + physical planning)
        t0 = time.perf_counter()
        df = qs[qid](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan_s = time.perf_counter() - t0
        plan = buf.getvalue()
        execs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            qs[qid](spark, SF_DIR).toPandas()
            execs.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "q": qid,
                    "plan_s": round(plan_s, 3),
                    "exec_s": execs,
                    "exchanges": len(re.findall(r"\bExchange\b", plan)),
                    "reused_exch": len(re.findall(r"ReusedExchange", plan)),
                    "py_evals": len(
                        re.findall(
                            r"BatchEvalPython|ArrowEvalPython|MapInPandas"
                            r"|MapInArrow|FlatMapGroupsInPandas",
                            plan,
                        )
                    ),
                    "scans": len(re.findall(r"Scan parquet|Scan ExistingRDD", plan)),
                    "inmem_scans": len(
                        re.findall(r"InMemoryTableScan|Scan In-memory", plan)
                    ),
                    "sorts": len(re.findall(r"^\(\d+\) Sort", plan, re.M)),
                    "codegen_spans": len(
                        set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
                    ),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
