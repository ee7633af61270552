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
  collapse into one EXISTING mega-order — a single order whose part set
  forms a ~700-part clique in every basket self-join (C(n,2) pair blowup
  per ONE key; the class the bounded_self_join posture must absorb).
- orders: every 3rd order (o_orderkey % 3 == 0) is reassigned to an
  EXISTING whale customer — skew through RFM / cohort / order-gap paths.

Both whale keys are real parent-table keys (derived at build time), so
inner joins CARRY the skew to the join output instead of dropping it as
dangling foreign keys; the mega-order belongs to the whale customer, so
the hot key compounds through lineitem -> orders -> customer chains.

Outputs are written via repartition(N), NOT coalesce: the source corpus is
single-row-group parquet, so a read gives ONE partition and coalesce can't
widen it — the old coalesce(8) silently wrote ONE file per table, which made
every row of a table a single atomic map block in every downstream shuffle.
AQE skew splitting works at map-block granularity, so that layout made whale
partitions UNSPLITTABLE — a fixture artifact masquerading as an engine limit
(found by scripts/skew_join_audit.py, round 9). Multi-file outputs mirror a
cluster scan's many map tasks.

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
# The whale keys are chosen from EXISTING parent rows at build time (review
# r8): a synthetic key (the old 4242424242 / 424242 constants) is a dangling
# foreign key — inner joins to the parent table drop every injected row at
# the exchange, so join-OUTPUT-side skew is never exercised even though the
# sweep reads green (DuckDB drops the same rows). The mega-order is picked
# from the whale customer's own orders so the skew compounds through the
# lineitem -> orders -> customer join chain.

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

    # Existing-key whales (see module comment): deterministic given the
    # source corpus — min() over fixed predicates, no sampling.
    # >= 42/4242 floors skip the degenerate key 0 (keyspaces start at 0;
    # a zero hot key would alias with default/sentinel arithmetic).
    whale_cust = (
        spark.read.parquet(os.path.join(SRC, "customer.parquet"))
        .where(F.col("c_custkey") >= 42)
        .agg(F.min("c_custkey"))
        .first()[0]
    )
    mega_order = (
        spark.read.parquet(os.path.join(SRC, "orders.parquet"))
        # % 3 == 0 so the mega-order's o_custkey is reassigned to the whale
        .where((F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") >= 4242))
        .agg(F.min("o_orderkey"))
        .first()[0]
    )

    for t in PLAIN_TABLES:
        if done(t):
            continue
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).repartition(
            4
        ).write.mode("overwrite").parquet(os.path.join(OUT, f"{t}.parquet"))

    if not done("events"):
        e = spark.read.parquet(os.path.join(SRC, "events.parquet"))
        e.withColumn(
            "user_id",
            F.when(
                F.col("event_id") % 5 == 0, F.lit(WHALE_USER)
            ).otherwise(F.col("user_id")).cast(dict(e.dtypes)["user_id"]),
        ).repartition(8).write.mode("overwrite").parquet(
            os.path.join(OUT, "events.parquet")
        )

    if not done("lineitem"):
        li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
        li.withColumn(
            "l_orderkey",
            F.when(
                F.col("l_orderkey") % 751 == 0, F.lit(mega_order)
            ).otherwise(F.col("l_orderkey")).cast(dict(li.dtypes)["l_orderkey"]),
        ).repartition(8).write.mode("overwrite").parquet(
            os.path.join(OUT, "lineitem.parquet")
        )

    if not done("orders"):
        o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
        o.withColumn(
            "o_custkey",
            F.when(
                F.col("o_orderkey") % 3 == 0, F.lit(whale_cust)
            ).otherwise(F.col("o_custkey")).cast(dict(o.dtypes)["o_custkey"]),
        ).repartition(8).write.mode("overwrite").parquet(
            os.path.join(OUT, "orders.parquet")
        )

    print(f"skew fixture ready at {OUT} (whale_cust={whale_cust}, mega_order={mega_order})")
    spark.stop()


if __name__ == "__main__":
    build()
