"""Tier-4 streaming semantics (SURVEY.md §5.3): watermark late-data drops,
cross-batch dedup eviction, and idempotent re-runs — deterministic staged
micro-batches via maxFilesPerTrigger=1 + Trigger.AvailableNow."""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import Row, functions as F


def _write_drop(spark, staging: str, name: str, rows: list[Row]) -> None:
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(staging, name))
    time.sleep(0.05)


def _ts(s: str):
    from datetime import datetime

    return datetime.fromisoformat(s)


@pytest.fixture()
def staged_late_data(spark):
    """Three drops exercising window finalization. Measured Spark semantics
    (recentProgress trace): a late row is dropped only once its window's
    state has been EVICTED, and eviction happens at the end of the first
    batch whose watermark exceeds the window end — one batch later than the
    watermark crossing itself. So: batch 0 pushes the watermark to 13:20;
    batch 1 (watermark 13:20) evicts + emits the 11:00 window at its end;
    batch 2's 11:20 straggler then hits evicted state and is dropped."""
    staging = tempfile.mkdtemp(prefix="wm_fixture_")
    _write_drop(spark, staging, "drop_0", [
        Row(event_id=1, ts=_ts("2024-01-01 11:05:00"), user_id=1, value=1.0),
        Row(event_id=2, ts=_ts("2024-01-01 13:30:00"), user_id=1, value=1.0),
    ])
    _write_drop(spark, staging, "drop_1", [
        Row(event_id=4, ts=_ts("2024-01-01 13:40:00"), user_id=1, value=1.0),
    ])
    _write_drop(spark, staging, "drop_2", [
        Row(event_id=3, ts=_ts("2024-01-01 11:20:00"), user_id=1, value=1.0),  # late!
        Row(event_id=5, ts=_ts("2024-01-01 15:00:00"), user_id=1, value=1.0),
    ])
    return staging


def _run_windowed(spark, staging: str, name: str):
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staging)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("win_start"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r.win_start: r.n for r in spark.table(name).collect()}


def test_watermark_drops_late_rows(spark, staged_late_data):
    """Batch 0 (events at 11:05 and 13:30) pushes the watermark to 13:20,
    so batch 1 (13:40) evicts + emits the finalized 11:00 window. Batch 2
    then delivers the 11:20 straggler — behind the watermark, state already
    evicted — which must be dropped, plus a 15:00 event whose window never
    finalizes (the watermark never passes 16:00)."""
    got = _run_windowed(spark, staged_late_data, "wm_late_test")
    # 11:00 window evicted+emitted at end of batch 1 with only event 1;
    # batch 2's 11:20 straggler hit evicted state and was dropped.
    assert got.get("2024-01-01 11:00:00") == 1
    # 13:00 window holds events 2 and 4, finalized by batch 2's watermark
    # (14:50 > 14:00) at the AvailableNow flush.
    assert got.get("2024-01-01 13:00:00") == 2
    # 15:00 window never finalizes (watermark never passes 16:00) — absent.
    assert "2024-01-01 15:00:00" not in got


def test_dedup_within_watermark_multibatch(spark):
    """Duplicate event_id arriving in the NEXT batch within the watermark is
    removed; a duplicate far behind the watermark is not guaranteed removed
    (state evicted) — assert the guaranteed part."""
    staging = tempfile.mkdtemp(prefix="dedup_fixture_")
    _write_drop(spark, staging, "drop_0", [
        Row(event_id=1, ts=_ts("2024-01-01 10:00:00"), user_id=1, value=1.0),
        Row(event_id=2, ts=_ts("2024-01-01 10:00:30"), user_id=1, value=1.0),
    ])
    _write_drop(spark, staging, "drop_1", [
        Row(event_id=1, ts=_ts("2024-01-01 10:00:00"), user_id=1, value=1.0),  # dup
        Row(event_id=3, ts=_ts("2024-01-01 10:01:00"), user_id=1, value=1.0),
    ])
    name = "dedup_test"
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staging)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = sorted(r.event_id for r in spark.table(name).collect())
    assert ids == [1, 2, 3]


def test_stream_sink_rerun_is_noop(spark, sf_small):
    """stream_sink_parquet runs the stream twice on one checkpoint inside
    the operator; equality with the batch count proves the second run
    appended nothing."""
    from ai_dataingestion_spark.catalog import all_specs
    from ai_dataingestion_spark.registry import load_table

    got = {
        r.event_type: r.n
        for r in all_specs()["stream_sink_parquet"].fn(spark, sf_small).collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stateful_processor_accumulates_across_batches():
    """Unit test of the transformWithStateInPandas processor logic (the
    primary stream_stateful path; end-to-end runs need protobuf, absent in
    this container): ValueState round-trips between handleInputRows calls."""
    import pandas as pd

    from ai_dataingestion_spark.streaming.incremental import _UserCountProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, new):
            self._v = tuple(new)

        def clear(self):
            self._v = None

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.states.setdefault(name, FakeValueState())

    proc = _UserCountProcessor()
    handle = FakeHandle()
    proc.init(handle)
    out1 = pd.concat(
        proc.handleInputRows((7,), iter([pd.DataFrame({"x": range(3)})]), None)
    )
    out2 = pd.concat(
        proc.handleInputRows(
            (7,),
            iter([pd.DataFrame({"x": range(2)}), pd.DataFrame({"x": range(4)})]),
            None,
        )
    )
    assert out1.n_events.tolist() == [3]
    assert out2.n_events.tolist() == [9]  # 3 carried + 2 + 4
    assert handle.states["n"].get() == (9,)
    proc.close()


def test_tws_runtime_gate_both_ways(monkeypatch):
    """The stream_stateful primary-path gate (has_tws_runtime) has never
    executed its True branch in this container (protobuf absent) — verify
    the gate's wiring both ways by mocking the import probe (VERDICT r2 #7):
    present → True, absent → False, and a missing PARENT package (which
    makes find_spec itself raise, the measured container behavior) → False.
    """
    import importlib.util

    from ai_dataingestion_spark.streaming import incremental

    real_find_spec = importlib.util.find_spec

    def fake(name, *a, **kw):
        if name == "google.protobuf":
            return object()  # a ModuleSpec stand-in: truthy, non-None
        return real_find_spec(name, *a, **kw)

    monkeypatch.setattr(importlib.util, "find_spec", fake)
    assert incremental.has_tws_runtime() is True

    monkeypatch.setattr(
        importlib.util, "find_spec",
        lambda name, *a, **kw: None if name == "google.protobuf"
        else real_find_spec(name, *a, **kw),
    )
    assert incremental.has_tws_runtime() is False

    def raising(name, *a, **kw):
        if name == "google.protobuf":
            raise ModuleNotFoundError("No module named 'google'")
        return real_find_spec(name, *a, **kw)

    monkeypatch.setattr(importlib.util, "find_spec", raising)
    assert incremental.has_tws_runtime() is False


def test_rocksdb_state_store_sets_and_restores_conf(spark):
    """The TWS branch binds the RocksDB state-store provider for the
    duration of the query start; the conf must not leak afterwards."""
    from ai_dataingestion_spark.streaming.incremental import rocksdb_state_store

    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        before = spark.conf.get(key)
    except Exception:
        before = None
    with rocksdb_state_store(spark):
        assert "RocksDBStateStoreProvider" in spark.conf.get(key)
    try:
        after = spark.conf.get(key)
    except Exception:
        after = None
    assert after == before


def test_stateful_event_time_timeout_evicts_state(spark):
    """State eviction via event-time timeout: user 1 goes quiet after 10:00
    with a timeout registered at 10:30; user 2 keeps producing, pushing the
    watermark past 10:30 by batch 2, so user 1's state times out — the
    callback fires with hasTimedOut, emits a sentinel final row, and
    removes the state. User 2 keeps renewing its timeout and never expires."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    staging = tempfile.mkdtemp(prefix="timeout_fixture_")
    _write_drop(spark, staging, "drop_0", [
        Row(event_id=1, ts=_ts("2024-01-01 10:00:00"), user_id=1, value=1.0),
        Row(event_id=2, ts=_ts("2024-01-01 10:00:00"), user_id=2, value=1.0),
    ])
    _write_drop(spark, staging, "drop_1", [
        Row(event_id=3, ts=_ts("2024-01-01 12:00:00"), user_id=2, value=1.0),
    ])
    _write_drop(spark, staging, "drop_2", [
        Row(event_id=4, ts=_ts("2024-01-01 12:30:00"), user_id=2, value=1.0),
    ])

    def count_with_timeout(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "final": [True]}
            )
        else:
            n = state.get[0] if state.exists else 0
            last_ms = 0
            for pdf in pdf_iter:
                n += len(pdf)
                last_ms = max(
                    last_ms, int(pdf["ts"].max().timestamp() * 1000)
                )
            state.update((n,))
            # session closes 30 min after this user's latest event
            state.setTimeoutTimestamp(last_ms + 30 * 60 * 1000)
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "final": [False]}
            )

    name = "timeout_test"
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staging)
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            count_with_timeout,
            outputStructType="user_id bigint, n bigint, final boolean",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    finals = [(r.user_id, r.n) for r in rows if r.final]
    assert finals == [(1, 1)]  # user 1 evicted with its carried count
    # user 2 never timed out: no final row, running count reached 3
    assert max(r.n for r in rows if r.user_id == 2 and not r.final) == 3


def test_checkpoint_kill_and_resume_exactly_once(spark, sf_small):
    """Crash-recovery (VERDICT r6 item 5): a checkpointed file-sink drain
    KILLED MID-BACKLOG — stopped after at least one micro-batch commit but
    before the 8-file backlog drains — must, when resumed from the same
    checkpoint, deliver every source row exactly once: the interrupted
    run's committed batches are not re-emitted (offset log) and its
    in-flight batch's partial output stays invisible (file-sink metadata
    log), so sink == source with zero duplicates."""
    import shutil

    from ai_dataingestion_spark.streaming.incremental import (
        _RAW_EVENTS_DDL,
        stage_event_files,
    )

    staging = stage_event_files(spark, sf_small, n_files=8)

    def start_drain(out, ck):
        return (
            spark.readStream.schema(_RAW_EVENTS_DDL)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(staging)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    def committed(ck):
        # digit-named batch commit markers only (skip .crc siblings)
        return len(
            [f for f in os.listdir(os.path.join(ck, "commits")) if f.isdigit()]
        )

    # The kill must land mid-backlog (>=1 commit, <8). A warm JVM can race
    # through all 8 micro-batches before the poll fires, so retry the
    # scenario on a fresh sink+checkpoint until the interrupt lands inside
    # the backlog (observed to succeed on the first try cold, rarely needs
    # a retry warm; 5 consecutive full drains before a 10 ms poll would
    # mean ~sub-2ms batches — not a real local[8] behavior).
    for _attempt in range(5):
        root = tempfile.mkdtemp(prefix="kill_resume_")
        out, ck = os.path.join(root, "out"), os.path.join(root, "ck")
        q1 = start_drain(out, ck)
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q1.lastProgress  # progress for batch N posts after N commits
            if p is not None and p["batchId"] >= 0:
                break
            time.sleep(0.01)
        q1.stop()  # the kill: interrupts whatever batch is in flight
        q1.awaitTermination(60)
        committed_1 = committed(ck)
        assert committed_1 >= 1, "kill landed before any commit"
        if committed_1 < 8:
            break
        shutil.rmtree(root, ignore_errors=True)
    else:
        raise AssertionError("backlog fully drained before the kill, 5 times")

    q2 = start_drain(out, ck)  # resume: same checkpoint, same sink
    assert q2.awaitTermination(300), "resumed drain did not finish"
    assert committed(ck) == 8

    from ai_dataingestion_spark.registry import load_table

    src = load_table(spark, sf_small, "events")
    # spark.read on the sink root honors the _spark_metadata commit log, so
    # the killed run's uncommitted partial files are excluded
    sink = spark.read.parquet(out)
    assert sink.count() == src.count()
    assert (
        sink.select("event_id").distinct().count()
        == src.select("event_id").distinct().count()
    )
    got = {
        r.event_type: r.n
        for r in sink.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        r.event_type: r.n
        for r in src.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    shutil.rmtree(root, ignore_errors=True)


def test_stateful_dedup_state_survives_kill_and_resume(spark):
    """Stateful restart-recovery: dropDuplicatesWithinWatermark state must
    be REBUILT FROM THE CHECKPOINT across a process restart. Run 1 drains
    drop_0 (events 1..300) and terminates; drop_1 then re-delivers the
    same 300 (duplicates) plus 301..600 and run 2 resumes on the same
    checkpoint. The duplicates arrive only in the SECOND process, so they
    can be suppressed only if the dedup state store round-tripped through
    the checkpoint: lost state emits 900 rows, replayed batch 0 emits 300
    twice. (The interrupted-mid-backlog kill is covered by
    test_checkpoint_kill_and_resume_exactly_once.)"""
    import shutil

    from datetime import datetime, timedelta

    staging = tempfile.mkdtemp(prefix="dedup_kill_")
    base_ts = datetime.fromisoformat("2024-01-01 12:00:00")

    def rows(lo, hi):
        return [
            Row(
                event_id=i,
                ts=base_ts + timedelta(seconds=i),
                user_id=i % 7,
                value=float(i),
            )
            for i in range(lo, hi)
        ]

    _write_drop(spark, staging, "drop_0", rows(1, 301))

    root = tempfile.mkdtemp(prefix="dedup_kill_out_")
    out, ck = os.path.join(root, "out"), os.path.join(root, "ck")

    def start():
        return (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(staging)
            .withWatermark("ts", "30 days")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start()
    assert q1.awaitTermination(300), "first drain did not finish"
    first = sorted(
        r.event_id for r in spark.read.parquet(out).select("event_id").collect()
    )
    assert first == list(range(1, 301)), f"first drain wrote {len(first)} rows"

    # the duplicates + new rows arrive only after the first process is gone
    _write_drop(spark, staging, "drop_1", rows(1, 301) + rows(301, 601))
    q2 = start()
    assert q2.awaitTermination(300), "resumed drain did not finish"

    sink = spark.read.parquet(out)
    got = sorted(r.event_id for r in sink.select("event_id").collect())
    assert got == list(range(1, 601)), (
        f"{len(got)} rows (dups suppressed iff state recovered)"
    )
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)


def test_watermark_append_boundary_is_inclusive_and_flushes(spark, tmp_path):
    """Pins the two empirical facts stream_watermark_late's batch-replay
    oracle is built on (VERDICT-r10 item 3):

    1. AvailableNow runs a final no-data flush batch — the watermark
       advances once more AFTER the last data batch and evicts+emits the
       windows it finalized, so the append output reflects the GLOBAL
       max event time, not the penultimate batch's.
    2. The finalization boundary is INCLUSIVE: a window whose end equals
       the final watermark (max ts - delay) IS emitted (end <= frontier).

    The corpus is crafted so max ts = 04:10:00 exactly => final watermark
    = 04:00:00 = the end of the [03:00, 04:00) window."""
    staging = str(tmp_path / "wm_boundary")
    _write_drop(spark, staging, "drop_0", [
        Row(event_id=1, ts=_ts("2024-01-10 01:05:00"), user_id=1, value=1.0),
        Row(event_id=2, ts=_ts("2024-01-10 01:30:00"), user_id=1, value=1.0),
    ])
    _write_drop(spark, staging, "drop_1", [
        Row(event_id=3, ts=_ts("2024-01-10 02:30:00"), user_id=2, value=1.0),
    ])
    _write_drop(spark, staging, "drop_2", [
        Row(event_id=4, ts=_ts("2024-01-10 03:00:00"), user_id=2, value=1.0),
        Row(event_id=5, ts=_ts("2024-01-10 03:05:00"), user_id=3, value=1.0),
        Row(event_id=6, ts=_ts("2024-01-10 04:10:00"), user_id=3, value=1.0),
    ])
    got = _run_windowed(spark, staging, "wm_boundary_test")
    assert got == {
        "2024-01-10 01:00:00": 2,
        "2024-01-10 02:00:00": 1,
        # end 04:00:00 == final watermark: inclusive boundary, and only a
        # post-last-batch flush could have emitted it at all
        "2024-01-10 03:00:00": 2,
        # [04:00, 05:00) never finalizes (watermark never passes 05:00)
    }, got


def test_tws_event_timer_expiry_is_strictly_greater(spark, tmp_path):
    """Pins the timer-expiry boundary stream_tws_event_timer's replay
    oracle encodes: an event-time timer fires only when the watermark
    advances STRICTLY beyond its timestamp. Crafted corpus: user 1's only
    event at 01:00:00 sets a timer at 01:30:00; the global max (user 2 at
    01:40:00) puts the final watermark at exactly 01:30:00 — equal, not
    greater, so user 1's session must NOT be emitted. User 3's session at
    00:10:00 (timer 00:40:00 < 01:30:00) must be emitted. Gap-closure is
    exercised by user 2's two sessions 40+ minutes apart."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_dataingestion_spark.catalog import all_specs

    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "timer_boundary")
    os.makedirs(out)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "events.parquet":
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    orig = pq.read_table(os.path.join(src, "events.parquet"))

    def ts(h, m, s=0):
        from datetime import datetime

        return datetime(2024, 1, 10, h, m, s)

    rows = {
        "event_id": [1, 2, 3, 4, 5],
        "ts": [ts(1, 0), ts(0, 50), ts(1, 40), ts(0, 10), ts(0, 12)],
        "user_id": [1, 2, 2, 3, 3],
        "event_type": ["a"] * 5,
        "value": [1.0] * 5,
        "props": ["{}"] * 5,
    }
    t = pa.table(rows, schema=pa.schema([(f.name, f.type) for f in orig.schema]))
    pq.write_table(t, os.path.join(out, "events.parquet"))

    got = {
        (r.user_id, r.sess_start_us): r.n_events
        for r in all_specs()["stream_tws_event_timer"].fn(spark, out).collect()
    }

    def us(h, m):
        from datetime import datetime, timezone

        return int(
            datetime(2024, 1, 10, h, m, tzinfo=timezone.utc).timestamp() * 1_000_000
        )

    assert got == {
        # user 2: first session (00:50) closed by the 01:40 gap event
        (2, us(0, 50)): 1,
        # user 3: session of 2 events, timer 00:42 < watermark 01:30
        (3, us(0, 10)): 2,
        # user 1 (timer 01:30:00 == watermark 01:30:00): NOT emitted
        # user 2's second session (01:40): watermark never passes 02:10
    }, got


@pytest.mark.skipif(
    not __import__(
        "ai_dataingestion_spark.streaming.incremental",
        fromlist=["has_tws_runtime"],
    ).has_tws_runtime(),
    reason="transformWithStateInPandas needs the protobuf state-server "
    "runtime; absent in this environment, so the five state-v2 operators "
    "run their legacy applyInPandasWithState twins (certification "
    "asymmetry recorded in SCALE.md round 12) — this test flips on "
    "automatically in the first protobuf-bearing environment",
)
def test_tws_primary_paths_match_oracles_when_runtime_present(spark, sf_oracle):
    """VERDICT r11 item 4: the transformWithStateInPandas PRIMARY halves of
    the state-v2 block have never executed in any driver environment (no
    protobuf wheel, offline index) — only the legacy twins carry the green.
    This test is the standing certification for the first environment where
    the runtime exists: it runs each primary path (has_tws_runtime() is
    True here, so the operators take the TWS branch) against the SAME
    DuckDB oracle the driver uses, via the tests/parity.py comparator."""
    from ai_dataingestion_spark.catalog import all_specs
    from tests.parity import compare, duckdb_connect

    specs = all_specs()
    con = duckdb_connect(sf_oracle)
    for qid in (
        "stream_tws_list_state",
        "stream_tws_map_state",
        "stream_tws_initial_state",
        "stream_tws_event_timer",
        "source_python_datasource_stream",
    ):
        spec = specs[qid]
        report = compare(spec.fn(spark, sf_oracle), con, spec.oracle)
        assert report["ok"], (qid, report)


def test_stream_session_total_is_run_deterministic(spark, sf_small):
    """r14 ties-tier catch: round(sum(double), 4) flipped a half-ulp
    boundary once across full-sweep draws (accumulation-order noise).
    The finite path now sums through DECIMAL(38,6), which is exact and
    order-independent — two runs must agree bit-for-bit."""
    from ai_dataingestion_spark.catalog import all_specs

    spec = all_specs()["stream_session"]
    a = sorted(map(tuple, spec.fn(spark, sf_small).collect()))
    b = sorted(map(tuple, spec.fn(spark, sf_small).collect()))
    assert a == b
