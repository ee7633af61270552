"""Semantic tests for the round-13 state-store reader block
(streaming/statestore_reader.py) — the properties the oracle hash can't
see: the read path stays JVM-side, the reader's partition layout matches
the writer's, and the state-vs-emission reconciliation property."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()


def test_liststate_read_path_has_no_python(spark, sf_small):
    """Building the flattened tail from persisted array state must be pure
    higher-order-function work: the BATCH READ plan (statestore scan →
    zip_with/filter/aggregate projection) must not contain an EvalPython
    node — Python ran in the streaming WRITE, never in the audit read."""
    df = SPECS["statestore_read_liststate_tail"].fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "StateScan" in plan or "statestore" in plan.lower()


def test_state_readback_matches_live_emission(spark, sf_small):
    """Recovery-correctness: the tail reconstructed FROM THE CHECKPOINT
    must equal the live drain's final emission (stream_tws_list_state) row
    for row — state on disk is the state the semantics require."""
    from_state = {
        r["user_id"]: (r["n_seen"], r["tail_n"], r["tail_sum"])
        for r in SPECS["statestore_read_liststate_tail"].fn(
            spark, sf_small).collect()
    }
    live = {
        r["user_id"]: (r["n_seen"], r["tail_n"], r["tail_sum"])
        for r in SPECS["stream_tws_list_state"].fn(spark, sf_small).collect()
    }
    assert from_state == live


def test_dedup_state_cardinality_is_exact(spark, sf_small):
    """The dedup store holds exactly one key per distinct pair — no
    duplicate state rows across partitions."""
    out = SPECS["statestore_read_dedup_state"].fn(spark, sf_small)
    rows = [(r["user_id"], r["event_type"]) for r in out.collect()]
    assert len(rows) == len(set(rows))


def test_join_buffer_holds_whole_left_input(spark, sf_small):
    """Without a watermark the symmetric hash join evicts nothing, so the
    left buffer must hold every left row — n_buffered equals the event
    count exactly (not approximately)."""
    from ai_dataingestion_spark.registry import load_table

    [row] = SPECS["statestore_read_join_buffer"].fn(spark, sf_small).collect()
    n_events = load_table(spark, sf_small, "events").count()
    assert row["n_buffered"] == n_events
    assert row["n_keys"] <= n_events


def test_metadata_pins_one_batch_per_staged_drop(spark, sf_small):
    """The 3-file staging with maxFilesPerTrigger=1 must produce exactly
    batches 0..2 — the multi-batch state-evolution property every state_v2
    oracle depends on, proven from checkpoint metadata."""
    [row] = SPECS["statestore_read_metadata_inventory"].fn(
        spark, sf_small).collect()
    assert row["operator_name"] == "dedupe"
    assert row["state_store_name"] == "default"
    assert row["n_batches"] == 3


def test_agg_state_is_one_row_per_user(spark, sf_small):
    """Aggregation state read-back: one buffer row per distinct user, and
    the count column sums to the corpus row count."""
    from ai_dataingestion_spark.registry import load_table

    out = SPECS["statestore_read_agg_state"].fn(spark, sf_small)
    rows = out.collect()
    uids = [r["user_id"] for r in rows]
    assert len(uids) == len(set(uids))
    total = sum(r["n_events"] for r in rows)
    assert total == load_table(spark, sf_small, "events").count()
