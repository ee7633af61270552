"""10x scale-up sweep (SCALE.md §'10× scale-up validation'): replicate
sf0.1 ten times with offset keys into a scratch dir, then run registered
queries against it and report wall times. Catches scale defects the small
SFs can't: broadcast mis-estimation, driver-heap pressure, quadratic
candidate blowups, single-partition windows that stop being "tiny".

Usage:
    python scripts/scaleup_sweep.py                 # all registered queries
    python scripts/scaleup_sweep.py qid [qid ...]   # just these
    SPARK_GRAFT_SCALEUP_DIR=/tmp/sfx1.0 to pin the scratch location.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SCALEUP_DIR", "/tmp/spark_graft_sfx1.0")
# 10 => sfx1.0 (the round-8 full-surface certification scale);
# 100 => sfx10 (events 10M / lineitem 60M — the round-11 heavy-op decade)
COPIES = int(os.environ.get("SPARK_GRAFT_SCALEUP_COPIES", "10"))

# (table, [key columns to offset per copy]) — offsets keep keys distinct so
# per-key group sizes stay realistic instead of multiplying 10x.
TABLES: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    for table, keys in TABLES.items():
        dst = os.path.join(OUT, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        if not keys:  # tiny dims: replication would corrupt join semantics
            src.write.mode("overwrite").parquet(dst)
            continue
        n = src.count()
        # Round power beyond max key PLUS two extra decades of headroom:
        # operators inject their own id offsets (e.g. similarity.py's
        # _DUP_OFFSET = 100_000), and the old `10 ** len(str(n*COPIES))`
        # rule landed EXACTLY on that constant for embeddings at sf0.1,
        # colliding copy k's base ids with copy k-1's injected-dup ids
        # (duplicate vec_ids -> oracle double-counts row-pairs that the
        # engine's pair dedup collapses; caught by the sfx1.0 parity run).
        offset = 10 ** (len(str(n * COPIES)) + 2)
        # batched append writes: a single COPIES-way union is fine at 10
        # copies but the analyzed plan (and its codegen) grows linearly —
        # at 100 copies chunked appends keep plan size and peak memory flat
        chunk = 10
        for lo in range(0, COPIES, chunk):
            parts = []
            for i in range(lo, min(lo + chunk, COPIES)):
                c = src
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * offset))
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            mode = "overwrite" if lo == 0 else "append"
            out.repartition(32).write.mode(mode).parquet(dst)
        print(f"[build] {table}: {n} -> {n * COPIES}", flush=True)


def main() -> None:
    from ai_dataingestion_spark.catalog import all_specs
    from ai_dataingestion_spark.registry import warm_tables
    from ai_dataingestion_spark.session import get_spark

    spark = get_spark("ai_dataingestion_spark-scaleup", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    warm_tables(spark, OUT, n_partitions=32)

    specs = all_specs()
    qids = sys.argv[1:] or list(specs)
    failed: list[str] = []
    for qid in qids:
        t0 = time.perf_counter()
        try:
            n = specs[qid].fn(spark, OUT).count()
            print(f"[ OK ] {qid}: {n} rows {time.perf_counter() - t0:.1f}s",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            failed.append(qid)
            msg = str(exc).splitlines()[0][:200] if str(exc) else repr(exc)
            print(f"[FAIL] {qid}: {msg}", flush=True)
    print(f"\n{len(qids) - len(failed)} ok, {len(failed)} fail"
          + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
