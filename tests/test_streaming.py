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
    """Event 3 (11:20) arrives after the watermark passed 11:50 — it must
    NOT appear in the finalized 11:00 window. Event 4 (11:55) lands in the
    12:00 window, which finalizes once the watermark passes 13:00."""
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
