"""Build a SKEWED corpus tier at /tmp/spark_graft_skew (SCALE.md round 8).

The driver corpus is uniform: every user/order/customer carries ~the same
row count, so hot-key behavior — the dominant real-world failure mode of
key-partitioned operators at 100 TB — is never exercised. This fixture
derives from sf0.1 with three deterministic whale injections:

- events: every 5th event (event_id % 5 == 0, ~20% of rows) is reassigned
  to user_id 42 — one whale user through every sessionize / window /
  per-user aggregation path (a single window partition holding 20% of the
  relation; Spark's window sort spills, but per-key hash-agg state and the
  AQE skew-join splitter are what's actually on trial).
- lineitem: rows with l_orderkey % 751 == 0 (~0.13%, ~800 rows at sf0.1)
  collapse into mega-order 4242424242 — a single order whose part set
  forms a ~700-part clique in every basket self-join (C(n,2) pair blowup
  per ONE key; the class the bounded_self_join posture must absorb).
- orders: every 3rd order (o_orderkey % 3 == 0) is reassigned to customer
  424242 — a whale customer through RFM / cohort / order-gap paths.

Keys keep their original dtype; all other tables copy through unchanged.
Oracle parity transfers: DuckDB recomputes over the SAME skewed parquet,
so driver_sim --sf-dir /tmp/spark_graft_skew is a full correctness check
under skew, not just a does-it-finish check.

Usage: python scripts/skew_fixture.py  (idempotent; rm -rf the dir to
rebuild)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SKEW_SRC", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_skew")

WHALE_USER = 42
MEGA_ORDER = 4242424242
WHALE_CUST = 424242

PLAIN_TABLES = (
    "region nation customer supplier part documents embeddings"
).split()


def build() -> None:
    from pyspark.sql import functions as F

    from ai_dataingestion_spark.session import get_spark

    spark = get_spark("skew-fixture", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    def done(t: str) -> bool:
        return os.path.exists(os.path.join(OUT, f"{t}.parquet"))

    for t in PLAIN_TABLES:
        if done(t):
            continue
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).coalesce(
            4
        ).write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))

    if not done("events"):
        e = spark.read.parquet(os.path.join(SRC, "events.parquet"))
        e.withColumn(
            "user_id",
            F.when(
                F.col("event_id") % 5 == 0, F.lit(WHALE_USER)
            ).otherwise(F.col("user_id")).cast(dict(e.dtypes)["user_id"]),
        ).coalesce(8).write.mode("overwrite").parquet(
            os.path.join(OUT, "events.parquet")
        )

    if not done("lineitem"):
        li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
        li.withColumn(
            "l_orderkey",
            F.when(
                F.col("l_orderkey") % 751 == 0, F.lit(MEGA_ORDER)
            ).otherwise(F.col("l_orderkey")).cast(dict(li.dtypes)["l_orderkey"]),
        ).coalesce(8).write.mode("overwrite").parquet(
            os.path.join(OUT, "lineitem.parquet")
        )

    if not done("orders"):
        o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
        o.withColumn(
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 3 == 0, F.lit(WHALE_CUST)
            ).otherwise(F.col("o_custkey")).cast(dict(o.dtypes)["o_custkey"]),
        ).coalesce(8).write.mode("overwrite").parquet(
            os.path.join(OUT, "orders.parquet")
        )

    print(f"skew fixture ready at {OUT}")
    spark.stop()


if __name__ == "__main__":
    build()
