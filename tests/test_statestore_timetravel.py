"""Semantic tests for the round-14 point-in-time state-read block
(streaming/statestore_timetravel.py) — the properties the per-op oracle
hash can't see on its own: batchId reads form a consistent PREFIX series
(monotone counts, key-set growth), the change feed is self-sufficient to
reconstruct the latest state, the snapshot reconstruction equals the
direct point read partition-for-partition, and the drains leave no
state-store conf behind (ADVICE-r13 discipline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()


def test_batch_evolution_is_monotone_prefix_series(spark, sf_small):
    """Time-travel consistency: for every user, n_events at batch b must be
    non-decreasing in b, and the batch-2 row must equal the full batch
    GROUP BY (the final state). A violation means a point-in-time read
    leaked rows across batch boundaries."""
    from ai_dataingestion_spark.registry import load_table

    rows = SPECS["statestore_read_batch_evolution"].fn(
        spark, sf_small).collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r["user_id"], {})[r["batch_id"]] = r["n_events"]
    assert series, "evolution read returned nothing"
    final = {
        r["user_id"]: r["cnt"]
        for r in load_table(spark, sf_small, "events")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for uid, by_batch in series.items():
        seq = [by_batch[b] for b in sorted(by_batch)]
        assert seq == sorted(seq), f"user {uid}: non-monotone {seq}"
        assert by_batch[max(by_batch)] == final[uid], (
            f"user {uid}: last batch state != batch replay"
        )


def test_batch0_state_is_subset_of_final(spark, sf_small):
    """Keys absent from batch 0 must be ABSENT (not zero) — the
    key-existence property a restart-from-batch-0 resumes with — and every
    batch-0 key must still exist in the final state."""
    b0 = {
        r["user_id"]: r["n_events"]
        for r in SPECS["statestore_read_batch0_agg"].fn(
            spark, sf_small).collect()
    }
    ev = {
        r["user_id"]: {r["batch_id"]: r["n_events"]}
        for r in SPECS["statestore_read_batch_evolution"].fn(
            spark, sf_small).filter("batch_id = 2").collect()
    }
    assert set(b0) <= set(ev)
    assert all(n >= 1 for n in b0.values())


def test_changefeed_reconstructs_latest_state(spark, sf_small):
    """Changelog self-sufficiency: max_by(value.count, batch_id) recovered
    from the change feed alone must equal the batch GROUP BY over the full
    corpus — the recovery contract changelog checkpointing rests on."""
    from ai_dataingestion_spark.registry import load_table

    from_feed = {
        r["user_id"]: r["final_count"]
        for r in SPECS["statestore_read_changefeed_agg"].fn(
            spark, sf_small).collect()
    }
    batch = {
        r["user_id"]: r["cnt"]
        for r in load_table(spark, sf_small, "events")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert from_feed == batch


def test_changefeed_dedup_writes_each_key_once(spark, sf_small):
    """The dedup store must emit exactly ONE changelog put per distinct
    key (later duplicates never re-put): the grouped feed's row count
    equals the distinct-pair count, and every change_type is 'update'."""
    from ai_dataingestion_spark.registry import load_table

    out = SPECS["statestore_read_changefeed_dedup"].fn(spark, sf_small)
    rows = out.collect()
    n_distinct = (
        load_table(spark, sf_small, "events")
        .select("user_id", "event_type").distinct().count()
    )
    assert len(rows) == n_distinct
    assert all(r["change_type"] == "update" for r in rows)


def test_snapshot_reconstruction_matches_direct_batch_read(spark, sf_small):
    """The unioned per-partition snapshot reads must equal the direct
    batchId=1 cumulative aggregate — each snapshot file individually
    sufficient for its partition."""
    snap = {
        r["user_id"]: r["n_events"]
        for r in SPECS["statestore_read_snapshot_reconstruction"].fn(
            spark, sf_small).collect()
    }
    direct = {
        r["user_id"]: r["n_events"]
        for r in SPECS["statestore_read_batch_evolution"].fn(
            spark, sf_small).filter("batch_id = 1").collect()
    }
    assert snap == direct


def test_drains_restore_state_store_confs(spark, sf_small):
    """ADVICE-r13 discipline: the RocksDB provider + changelog flags are
    drain-scoped — after any op in the block runs, the session carries
    neither conf (or carries the pre-existing value unchanged)."""
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    log_key = (
        "spark.sql.streaming.stateStore.rocksdb"
        ".changelogCheckpointing.enabled"
    )

    def snapshot():
        out = {}
        for k in (prov_key, log_key):
            try:
                out[k] = spark.conf.get(k)
            except Exception:
                out[k] = None
        return out

    before = snapshot()
    SPECS["statestore_read_changefeed_agg"].fn(spark, sf_small).collect()
    SPECS["statestore_read_snapshot_reconstruction"].fn(
        spark, sf_small).collect()
    assert snapshot() == before
