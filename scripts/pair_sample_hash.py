"""Deterministic-sample value parity for the pair-emitting heavies at scale-up
(VERDICT-r11 item 3).

The sfx10 decade sweep (scaleup_sweep.py, SCALE.md round-11) proved the
multi-million-row pair emitters complete at 100x driver scale, but only
count+schema — full value-hashing 12.9M pairs on both engines per round is
wasted budget. This closes the gap with a ~6% DETERMINISTIC sample: both
engines keep exactly the rows whose md5 over the pair KEY columns starts
with nibble '0' (1/16 of the keyspace, engine-independent because the hash
input is canonical integer/string text, never floats), then the sampled
rows are compared with the driver's full canon machinery (column names +
order-insensitive value multiset, type-strict). A value defect that hits
>= ~50 of a million emitted pairs is caught with near-certainty; a defect
confined to fewer rows than that is below what count-parity plus the sf0.01
full-hash gate could have shipped anyway.

Usage:
    SPARK_GRAFT_SCALEUP_COPIES=100 SPARK_GRAFT_SCALEUP_DIR=/tmp/spark_graft_sfx10 \
        SPARK_GRAFT_DRIVER_MEM=16g python scripts/pair_sample_hash.py
    python scripts/pair_sample_hash.py market_basket_pairs   # subset
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# op id -> pair-key columns (integer/string only: the md5 sampling text must
# format identically on both engines, so float columns never enter the hash —
# they are still VALUE-compared on the sampled rows)
PAIR_OPS: dict[str, list[str]] = {
    "sim_pair_dedup_lsh": ["id1", "id2"],
    "market_basket_pairs": ["part1", "part2"],
    "dedup_removal_plan": ["doc_id"],
}

NIBBLE = os.environ.get("SPARK_GRAFT_PAIR_SAMPLE_NIBBLE", "0")


def main() -> int:
    import duckdb
    from pyspark.sql import functions as F

    from ai_dataingestion_spark.catalog import all_specs
    from ai_dataingestion_spark.registry import SCHEMAS, warm_tables
    from ai_dataingestion_spark.session import get_spark
    from driver_sim import TABLES, canon
    import scaleup_sweep

    spark = get_spark("ai_dataingestion_spark-pairhash", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    scaleup_sweep.build(spark)
    out = scaleup_sweep.OUT
    warm_tables(spark, out, n_partitions=32)

    con = duckdb.connect()
    # The removal-plan oracle's shingle CTEs exceed physical RAM at sfx10
    # (two unlimited-memory attempts OOM-killed at ~70+ GB RSS on a 125 GB
    # box); cap DuckDB below the box and give it a spill dir so the oracle
    # trades wall for residency instead of dying.
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "80GB")
    spill = os.environ.get("SPARK_GRAFT_ORACLE_SPILL", "/tmp/duck_spill")
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        path = f"{out}/{t}.parquet"
        cols = ", ".join(f.name for f in SCHEMAS[t].fields)
        src = (
            f"read_parquet('{path}/*.parquet', union_by_name=true)"
            if os.path.isdir(path)
            else f"read_parquet('{path}')"
        )
        con.execute(f"CREATE VIEW {t} AS SELECT {cols} FROM {src}")

    specs = all_specs()
    qids = sys.argv[1:] or list(PAIR_OPS)
    failed: list[str] = []
    for qid in qids:
        keys = PAIR_OPS[qid]
        key_text = ", ".join(f"CAST({k} AS VARCHAR)" for k in keys)
        t0 = time.perf_counter()
        sdf = specs[qid].fn(spark, out)
        sample = F.md5(
            F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
        ).startswith(NIBBLE)
        sp = sdf.where(sample).toPandas()
        t_spark = time.perf_counter() - t0

        t0 = time.perf_counter()
        dd = con.execute(
            f"SELECT * FROM ({specs[qid].oracle}) q "
            f"WHERE md5(concat_ws('|', {key_text})) LIKE '{NIBBLE}%'"
        ).fetchdf()
        t_duck = time.perf_counter() - t0

        sc, sr = canon(sp)
        dc, dr = canon(dd)
        if sc != dc:
            print(f"[FAIL] {qid}: cols spark={sc} oracle={dc}")
            failed.append(qid)
        elif len(sr) != len(dr):
            print(f"[FAIL] {qid}: sampled rows spark={len(sr)} oracle={len(dr)}")
            failed.append(qid)
        else:
            bad = next((i for i, (a, b) in enumerate(zip(sr, dr)) if a != b), None)
            if bad is None:
                print(f"[ OK ] {qid}: {len(sr)} sampled rows value-match "
                      f"(spark {t_spark:.1f}s, oracle {t_duck:.1f}s)", flush=True)
            else:
                print(f"[FAIL] {qid}: sampled value mismatch row {bad}:\n"
                      f"  spark : {sr[bad]}\n  oracle: {dr[bad]}")
                failed.append(qid)

    print(f"\n{len(qids) - len(failed)} ok, {len(failed)} fail"
          + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
