"""§2.AB round-15 completion: STREAMING observe() and
StreamingQueryListener metrics surfaced as relations (VERDICT-r14 item 3 /
SURVEY.md §7.2 round-15 candidate (c)).

fn_observe_metrics_gate (operators/observability.py) proved the BATCH
observe() gate; a streaming pipeline's equivalent is per-micro-batch:
`df.observe(name, aggs...)` rides each batch's job, and the per-batch
values surface through StreamingQueryProgress (`observedMetrics`) and the
session's StreamingQueryListener bus. Three proofs land here:

- observe() metrics per micro-batch == the batch aggregate over that
  batch's staged bucket (the ingest-gate shape: row counts and value
  totals audited batch-by-batch WITHOUT a second scan);
- listener-bus QueryProgressEvent rows (batchId, numInputRows) == the
  staged bucket sizes — the monitoring path's numbers are the source's
  numbers;
- listener lifecycle census (started / progress / terminated event
  counts) == the drain's commit structure.

Determinism contract: the staged drain (incremental.py:stage_event_files,
mtime-ordered buckets, maxFilesPerTrigger=1) makes micro-batch b process
exactly staged bucket b, so each progress row has an exact batch twin in
the `_BUCKETED_CTE` oracle. Listener events arrive on a background
py4j callback thread — each op registers its listener BEFORE .start(),
matches events by the query's runId (a concurrent harness query on the
same session bus must not leak in), polls bounded-time for the terminal
event, and removes the listener in a finally.

Driver-materialization note: progress/listener payloads are O(batches)
metric structs (3 rows here; in production, one per trigger) — the
relation is built FROM the driver-side monitoring bus by design, because
that bus IS the surface under test; the observed data itself never leaves
the executors (that is observe()'s whole point at 100 TB — the metrics
ride the ingest job, no second scan).

Scale posture: observe() adds a zero-shuffle accumulator to each batch's
existing job; the listener is push-based (no polling jobs). Both scale
with trigger COUNT, not data size.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQueryListener

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.functions.portable import (
    stable_rounded_sum,
    stable_rounded_sum_sql,
)
from ai_dataingestion_spark.streaming.incremental import (
    _memory_query_name,
    _read_stream,
    stage_event_files,
)
from ai_dataingestion_spark.streaming.statestore_timetravel import (
    _BUCKETED_CTE,
)
from ai_dataingestion_spark.tmpdirs import op_tmpdir

_LISTENER_DEADLINE_S = 60.0


def _run_observed_drain(spark: SparkSession, df, output_mode: str):
    """Start an AvailableNow drain and return the QUERY HANDLE (unlike
    incremental._run_available_now, which returns None): recentProgress
    lives on the handle. Same bounded-shuffle-width discipline — state
    partitioning is fixed at first start, and 200 store instances per
    batch is pure commit overhead at test scale."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(min(int(old), 8)))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(_memory_query_name())
            .outputMode(output_mode)
            .option("checkpointLocation", op_tmpdir("obs_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q
    finally:
        spark.conf.set(key, old)


# ---------------------------------------------------------------------------
# stream_observe_batch_metrics — per-micro-batch observe() == batch twin
# ---------------------------------------------------------------------------


@register(
    "stream_observe_batch_metrics",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT CAST(drop_bucket AS BIGINT) AS batch_id,
       count(*) AS n_rows,
       {stable_rounded_sum_sql("value", 4)} AS total
FROM bucketed
GROUP BY drop_bucket
""",
)
def stream_observe_batch_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """df.observe() on a STREAMING source: the gate aggregates (row count +
    order-independent value total, portable.py:stable_rounded_sum — the
    same aggregate expressions the batch gate uses) ride each micro-batch's
    job and surface per batch in StreamingQueryProgress.observedMetrics.
    The relation (batch_id, n_rows, total) must equal the batch GROUP BY
    over the staged buckets — the per-batch ingest audit, costing zero
    extra scans. Batches with no input rows are excluded on both sides
    (the oracle's GROUP BY cannot produce empty buckets; AvailableNow
    over the staged corpus runs no empty batches, and the filter makes
    the contract explicit)."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    observed = _read_stream(spark, staging).observe(
        "ingest_gate",
        F.count(F.lit(1)).alias("n_rows"),
        stable_rounded_sum("value", 4).alias("total"),
    )
    # any cheap per-batch sink works; the observation rides the batch job
    q = _run_observed_drain(
        spark, observed.groupBy("event_type").count(), "update"
    )

    def _as_double(x):
        # progress crosses the monitoring bus as JSON, where non-finite
        # doubles serialize as the STRINGS 'NaN'/'Infinity'/'-Infinity'
        # (caught by the nan tier: DoubleType rejected the raw 'NaN') —
        # float() restores all three plus Decimal/float passthrough
        return None if x is None else float(x)

    rows = [
        (int(p["batchId"]), int(m["n_rows"]), _as_double(m["total"]))
        for p in q.recentProgress
        for m in [p.get("observedMetrics", {}).get("ingest_gate")]
        if m is not None and int(m["n_rows"]) > 0
    ]
    return spark.createDataFrame(
        rows, "batch_id bigint, n_rows bigint, total double"
    )


# ---------------------------------------------------------------------------
# stream_listener_progress_relation — the listener bus vs the staged source
# ---------------------------------------------------------------------------


@register(
    "stream_listener_progress_relation",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT CAST(drop_bucket AS BIGINT) AS batch_id,
       count(*) AS num_input_rows
FROM bucketed
GROUP BY drop_bucket
""",
)
def stream_listener_progress_relation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """StreamingQueryListener.onQueryProgress as a relation: every
    (batchId, numInputRows) the monitoring bus reports for THIS query
    (matched by runId) must equal the staged bucket sizes — the
    observability path a production alert reads is pinned to the source
    of truth. The listener is registered before .start(), events are
    polled bounded-time until the count reported by the handle's own
    recentProgress arrives on the bus (the bus is async), and the
    listener is removed in a finally — no cross-query leakage, no
    unbounded wait."""
    progress: list[tuple[int, int, str]] = []

    class _Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            progress.append((int(p.batchId), int(p.numInputRows), str(p.runId)))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    staging = stage_event_files(spark, sf_dir, n_files=3)
    listener = _Capture()
    spark.streams.addListener(listener)
    try:
        q = _run_observed_drain(
            spark,
            _read_stream(spark, staging).groupBy("user_id").count(),
            "update",
        )
        run_id = str(q.runId)
        expected = sum(
            1 for p in q.recentProgress if int(p["numInputRows"]) > 0
        )
        deadline = time.time() + _LISTENER_DEADLINE_S
        while (
            sum(1 for b, n, r in progress if r == run_id and n > 0) < expected
            and time.time() < deadline
        ):
            time.sleep(0.1)
    finally:
        spark.streams.removeListener(listener)
    rows = [(b, n) for b, n, r in progress if r == run_id and n > 0]
    return spark.createDataFrame(rows, "batch_id bigint, num_input_rows bigint")


# ---------------------------------------------------------------------------
# stream_listener_lifecycle_audit — the event bus census of one drain
# ---------------------------------------------------------------------------


@register(
    "stream_listener_lifecycle_audit",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT CAST(1 AS BIGINT) AS n_started,
       CAST((SELECT count(DISTINCT drop_bucket) FROM bucketed) AS BIGINT)
         AS n_progress_batches,
       CAST(1 AS BIGINT) AS n_terminated
""",
)
def stream_listener_lifecycle_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Listener lifecycle census for one AvailableNow drain: exactly one
    onQueryStarted, one onQueryProgress per data-carrying micro-batch
    (= the number of staged buckets — re-proving, from the event bus,
    the one-batch-per-file property the state oracles stand on), and one
    onQueryTerminated. Events are matched by this query's id/runId;
    the terminal event is polled bounded-time (the bus is async) and the
    listener removed in a finally."""
    events: list[tuple[str, str, int]] = []

    class _Census(StreamingQueryListener):
        def onQueryStarted(self, event):
            events.append(("started", str(event.runId), 1))

        def onQueryProgress(self, event):
            p = event.progress
            events.append(("progress", str(p.runId), int(p.numInputRows)))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            events.append(("terminated", str(event.runId), 1))

    staging = stage_event_files(spark, sf_dir, n_files=3)
    listener = _Census()
    spark.streams.addListener(listener)
    try:
        q = _run_observed_drain(
            spark,
            _read_stream(spark, staging).groupBy("event_type").count(),
            "update",
        )
        run_id = str(q.runId)
        deadline = time.time() + _LISTENER_DEADLINE_S
        while (
            not any(k == "terminated" and r == run_id for k, r, _ in events)
            and time.time() < deadline
        ):
            time.sleep(0.1)
    finally:
        spark.streams.removeListener(listener)
    mine = [(k, n) for k, r, n in events if r == run_id]
    return spark.createDataFrame(
        [(
            sum(1 for k, _ in mine if k == "started"),
            sum(1 for k, n in mine if k == "progress" and n > 0),
            sum(1 for k, _ in mine if k == "terminated"),
        )],
        "n_started bigint, n_progress_batches bigint, n_terminated bigint",
    )
