"""ANN recall at the sfx10 decade WITHOUT replication flattery
(VERDICT-r11 item 5).

The round-11 sfx10 ANN measurement (SCALE.md addendum 2) replicated sf0.1
embeddings 100x with offset ids but IDENTICAL vectors, so every true
neighbor of a probe was a bit-identical copy that necessarily co-buckets
with it in every LSH table / IVF cell — recall@5 = 1.00 was partly an
artifact. This fixture adds a deterministic per-copy jitter: copy 0 keeps
the pristine vectors (probes are vec_id < 10, i.e. copy 0), and each
component of copy i>=1 gets a xxhash64-derived uniform offset in
[-EPS, +EPS]. At EPS = 0.05 against component sigma ~= 0.13 the jittered
copies sit ~10-15 degrees off the original — still unambiguous nearest
neighbors (cos ~= 0.97+ vs ~0 for random pairs), but no two replicas share
a bit pattern, so sign-flips near hyperplane boundaries and IVF cell edges
happen at realistic rates and the bucketing has to EARN its recall.

Everything is hash-derived (vec_id, component index, copy number), so the
corpus is bit-reproducible without any RNG state.

Usage:
    python scripts/ann_jitter_decade.py            # build + measure
    SPARK_GRAFT_ANNJITTER_DIR=/tmp/... to pin the scratch location.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_ANNJITTER_DIR", "/tmp/spark_graft_annjitter")
COPIES = int(os.environ.get("SPARK_GRAFT_ANNJITTER_COPIES", "100"))
EPS = float(os.environ.get("SPARK_GRAFT_ANNJITTER_EPS", "0.05"))

ANN_QUERIES = ("sim_ann_lsh", "sim_ann_ivf")


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    dst = os.path.join(OUT, "embeddings.parquet")
    # The corpus is written in chunked append mode, so a bare existence
    # check would treat an interrupted partial build as complete and
    # silently measure recall against a truncated replica set (ADVICE
    # r12). A sentinel recording the expected row count is written only
    # after the final chunk; absent or mismatched => rebuild from scratch.
    sentinel = os.path.join(OUT, "_COMPLETE_ROWCOUNT")
    src = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    n = src.count()
    if os.path.exists(dst):
        try:
            with open(sentinel) as f:
                expected = int(f.read().strip())
            actual = spark.read.parquet(dst).count()
        except (OSError, ValueError):
            expected, actual = -1, -2
        if expected == n * COPIES and actual == expected:
            return
        print(f"[build] stale/partial corpus at {dst} "
              f"(sentinel={expected}, rows={actual}, want={n * COPIES}) — "
              "rebuilding", flush=True)
        shutil.rmtree(dst, ignore_errors=True)
        try:
            os.remove(sentinel)
        except OSError:
            pass
    offset = 10 ** (len(str(n * COPIES)) + 2)  # scaleup_sweep's headroom rule
    chunk = 10
    for lo in range(0, COPIES, chunk):
        parts = []
        for i in range(lo, min(lo + chunk, COPIES)):
            c = src.withColumn("vec_id", F.col("vec_id") + F.lit(i * offset))
            if i > 0:
                # uniform in [-EPS, EPS], derived from (vec_id, j, copy):
                # pmod of xxhash64 over 2001 levels, centered and scaled
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: (
                            x
                            + (
                                (
                                    F.pmod(
                                        F.xxhash64(F.col("vec_id"), j, F.lit(i)),
                                        F.lit(2001),
                                    )
                                    - F.lit(1000)
                                )
                                / F.lit(1000.0)
                            )
                            * F.lit(EPS)
                        ).cast("float"),
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        mode = "overwrite" if lo == 0 else "append"
        out.repartition(32).write.mode(mode).parquet(dst)
    with open(sentinel, "w") as f:
        f.write(str(n * COPIES))
    print(f"[build] embeddings: {n} -> {n * COPIES} (EPS={EPS}, copy 0 pristine)",
          flush=True)


def main() -> None:
    from ai_dataingestion_spark.catalog import all_specs
    from ai_dataingestion_spark.session import get_spark

    spark = get_spark("ai_dataingestion_spark-annjitter", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    specs = all_specs()
    t0 = time.perf_counter()
    exact = specs["sim_cosine_topk"].fn(spark, OUT).toPandas()
    t_exact = time.perf_counter() - t0
    truth = exact.groupby("probe_id")["neighbor_id"].apply(set)
    print(f"[exact] sim_cosine_topk: {len(exact)} rows {t_exact:.1f}s", flush=True)

    for qid in ANN_QUERIES:
        t0 = time.perf_counter()
        ann = specs[qid].fn(spark, OUT).toPandas()
        wall = time.perf_counter() - t0
        got = ann.groupby("probe_id")["neighbor_id"].apply(set)
        hits = [len(got.get(p, set()) & t) / max(len(t), 1) for p, t in truth.items()]
        recall = round(sum(hits) / max(len(hits), 1), 4)
        print(f"[ ann ] {qid}: recall@5={recall} wall={wall:.1f}s "
              f"(exact baseline {t_exact:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
