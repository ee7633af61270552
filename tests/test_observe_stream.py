"""Semantic tests for the round-15 streaming-observability block
(streaming/observe_stream.py) — cross-op reconciliation the per-op oracle
hash can't see: the observe() gate, the listener bus, and the source
corpus all report the SAME batch structure; and the listener registration
is cleaned up (no leak into the session bus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_dataingestion_spark.catalog import all_specs
from ai_dataingestion_spark.registry import load_table

SPECS = all_specs()


def test_observe_metrics_reconcile_with_corpus(spark, sf_small):
    """Σ per-batch n_rows == corpus row count, batch ids are the
    contiguous prefix 0..k-1, and every batch is non-empty — the
    one-batch-per-staged-file invariant read from the metrics side."""
    rows = SPECS["stream_observe_batch_metrics"].fn(spark, sf_small).collect()
    n_corpus = load_table(spark, sf_small, "events").count()
    assert sum(r["n_rows"] for r in rows) == n_corpus
    assert sorted(r["batch_id"] for r in rows) == list(range(len(rows)))
    assert all(r["n_rows"] > 0 for r in rows)


def test_listener_and_observe_paths_agree(spark, sf_small):
    """Two independent monitoring paths — QueryProgress.observedMetrics
    and the listener bus — must report identical (batch_id, rows) pairs
    for equivalent drains over the same staged corpus."""
    obs = {
        (r["batch_id"], r["n_rows"])
        for r in SPECS["stream_observe_batch_metrics"].fn(
            spark, sf_small).collect()
    }
    bus = {
        (r["batch_id"], r["num_input_rows"])
        for r in SPECS["stream_listener_progress_relation"].fn(
            spark, sf_small).collect()
    }
    assert obs == bus


def test_lifecycle_census_matches_bucket_count(spark, sf_small):
    """Exactly one started and one terminated event; one data-carrying
    progress event per staged bucket (recomputed from the corpus, not
    assumed to be 3)."""
    row = SPECS["stream_listener_lifecycle_audit"].fn(
        spark, sf_small).collect()[0]
    n = load_table(spark, sf_small, "events").count()
    n_buckets = min(n, 3)
    assert row["n_started"] == 1
    assert row["n_terminated"] == 1
    assert row["n_progress_batches"] == n_buckets


def test_listener_removed_after_ops(spark, sf_small):
    """The ops' listeners must be removed in their finally blocks: running
    a block op twice must not double-count events (a leaked listener from
    run 1 would capture run 2's events under a foreign runId filter — the
    census totals stay exactly (1, k, 1))."""
    first = SPECS["stream_listener_lifecycle_audit"].fn(
        spark, sf_small).collect()[0]
    second = SPECS["stream_listener_lifecycle_audit"].fn(
        spark, sf_small).collect()[0]
    assert first == second
    assert second["n_started"] == 1 and second["n_terminated"] == 1
