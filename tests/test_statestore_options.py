"""Semantic tests for the round-15 statestore reader-options block
(streaming/statestore_options.py) — the cross-op properties the per-op
oracle hash can't see: the single-batch window is consistent with the
prefix window, the truncated-feed replay equals the direct point-in-time
re-open (delta path == reopen path), the join checkpoint carries exactly
the four symmetric-hash-join stores, and the changelog conf leaks
nothing."""

from __future__ import annotations

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()

_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def test_window_consistent_with_prefix(spark, sf_small):
    """Every (user, cumulative-count) row of the [1,1] window must appear
    identically in the [0,1] prefix fold: the single-batch delta is the
    prefix's last update for exactly the bucket-1-active users."""
    win = {
        r["user_id"]: r["count_after_b1"]
        for r in SPECS["statestore_read_changefeed_window"].fn(
            spark, sf_small).collect()
    }
    prefix = {
        r["user_id"]: r["count_at_b1"]
        for r in SPECS["statestore_read_changefeed_prefix_replay"].fn(
            spark, sf_small).collect()
    }
    assert win, "single-batch window returned nothing"
    assert set(win) <= set(prefix)
    for uid, n in win.items():
        assert prefix[uid] == n, (
            f"user {uid}: window says {n}, prefix fold says {prefix[uid]}"
        )


def test_prefix_replay_equals_direct_batch_read(spark, sf_small):
    """The changeEndBatchId=1 feed folded per key must equal the DIRECT
    option(batchId=1) re-open (statestore_read_batch_evolution's b=1
    slice) — feed-replay-to-b and store-reopen-at-b are the same state."""
    replay = {
        r["user_id"]: r["count_at_b1"]
        for r in SPECS["statestore_read_changefeed_prefix_replay"].fn(
            spark, sf_small).collect()
    }
    direct = {
        r["user_id"]: r["n_events"]
        for r in SPECS["statestore_read_batch_evolution"].fn(
            spark, sf_small).filter("batch_id = 1").collect()
    }
    assert replay == direct


def test_join_inventory_is_the_four_store_census(spark, sf_small):
    """A symmetric hash join owns exactly four stores, two per side, all
    spanning the full 3-batch drain."""
    rows = SPECS["statestore_read_join_store_inventory"].fn(
        spark, sf_small).collect()
    names = sorted(r["store_name"] for r in rows)
    assert names == [
        "left-keyToNumValues",
        "left-keyWithIndexToValue",
        "right-keyToNumValues",
        "right-keyWithIndexToValue",
    ]
    assert {r["operator_name"] for r in rows} == {"symmetricHashJoin"}
    assert {r["n_batches"] for r in rows} == {3}


def test_window_read_path_is_jvm_side(spark, sf_small):
    """The bounded change-feed read + fold must be pure JVM work: a state
    scan into max_by/groupBy, no EvalPython anywhere (plan pin, the §2.AC
    discipline)."""
    df = SPECS["statestore_read_changefeed_prefix_replay"].fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "StateScan" in plan or "statestore" in plan.lower()


def test_changelog_conf_restored(spark, sf_small):
    """The RocksDB changelog flag set for the drains must not leak into
    the session (ADVICE-r13 conf discipline, via _rocksdb_changelog)."""
    try:
        before = spark.conf.get(_CHANGELOG_KEY)
    except Exception:
        before = None
    SPECS["statestore_read_changefeed_window"].fn(spark, sf_small).collect()
    try:
        after = spark.conf.get(_CHANGELOG_KEY)
    except Exception:
        after = None
    assert after == before
