"""§2.AC round-14 block: point-in-time state reads — the state source's
time-travel options (`batchId`, `snapshotStartBatchId`/`snapshotPartitionId`,
`readChangeFeed`/`changeStartBatchId`; SPARK-45511 follow-ons).

§2.W (statestore_reader.py) reads a checkpoint's LATEST state; this block
reads its HISTORY — the surface a production debugging session reaches for
when "the aggregate is wrong NOW" needs "so when did it go wrong":

- `batchId` re-opens the store as of any committed micro-batch, so state
  is inspectable at every point the query could have restarted from;
- `readChangeFeed` turns the RocksDB changelog into a relation of
  (batch_id, change_type, key, value) rows — the per-batch state DELTA,
  i.e. which keys each micro-batch touched;
- `snapshotStartBatchId` + `snapshotPartitionId` reconstructs one state
  partition from a specific on-disk snapshot, the recovery-forensics path
  ("is THIS snapshot file intact?") — proven here by rebuilding every
  partition from its own-version snapshot and matching the direct read.

Oracle strategy: the staged drain is deterministic (incremental.py's
stage_event_files ranks events by (ts ASC NULLS LAST, event_id) and cuts
three equal buckets; one file per AvailableNow trigger ⇒ micro-batch b
processes exactly bucket b). So "state as of batch b" has an exact batch
twin — the same aggregate over the events whose bucket ≤ b — and the
bucket is reproducible in DuckDB with a window CTE (validated row-exact at
sf0.001 and sf0.01 against the staged parquet's own drop_bucket column).

Scale posture: every read here plans one scan task per state-store
partition, exactly like the latest-state reads (statestore_reader.py:16) —
time-travel changes WHICH files each task opens (older delta/changelog/
snapshot versions), not the parallelism. The change feed reads changelog
files proportional to the batch RANGE requested, not to total state size —
at 100 TB of state, auditing "what did batch N touch" costs O(delta),
the whole point of reading the changelog instead of diffing two full
snapshots. The snapshot read is per-partition by API design (its unit of
recovery), so the full-reconstruction op fans out one bounded read per
partition — partition COUNT (a conf, 8 here) drives the loop, never data.

Conf discipline (ADVICE r13): the RocksDB provider + changelog flags are
set for the drain and restored in a finally — the provider binds per query
at start, so nothing else in the session inherits them.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.streaming.incremental import (
    _read_stream,
    rocksdb_state_store,
    stage_event_files,
)
from ai_dataingestion_spark.streaming.statestore_reader import (
    _drain_to_checkpoint,
    _read_state,
)

# The staged drop buckets, reproduced in DuckDB (mirrors
# incremental.py:stage_event_files exactly: rank by (ts ASC NULLS LAST,
# event_id), bucket = min(int((rn-1)*3/N), 2); floor == Spark's int-cast
# truncation because the quotient is non-negative). Validated row-exact
# against the staged parquet's drop_bucket at sf0.001 and sf0.01.
_BUCKETED_CTE = """
bucketed AS (
  SELECT *,
         CAST(least(floor((row_number() OVER (ORDER BY ts ASC NULLS LAST,
                                              event_id ASC) - 1) * 3.0
                          / count(*) OVER ()), 2) AS INT) AS drop_bucket
  FROM events
)
"""


@contextlib.contextmanager
def _rocksdb_changelog(spark: SparkSession, enabled: bool):
    """RocksDB provider with changelog checkpointing explicitly on or off,
    both restored after the drain starts. Changelog ON ⇒ per-version
    .changelog files (the change-feed's input); OFF ⇒ per-version full
    .zip snapshots (the snapshot-read's input)."""
    key = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, "true" if enabled else "false")
    try:
        with rocksdb_state_store(spark):
            yield
    finally:
        if old is not None:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)


def _drained_agg_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """The block's shared drain: streaming groupBy(user_id).count() over
    the 3-file staged corpus (one micro-batch per file), on the DEFAULT
    state store provider — batchId time travel is a stock-provider
    capability, no RocksDB required."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    agg = (
        _read_stream(spark, staging)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)))
    )
    return _drain_to_checkpoint(spark, agg, "update")


_AGG_STATE_DDL = (
    "key struct<user_id: bigint>, "
    "value struct<count: bigint>, partition_id int"
)


# ---------------------------------------------------------------------------
# statestore_read_batch0_agg — state as of the FIRST committed micro-batch
# ---------------------------------------------------------------------------


@register(
    "statestore_read_batch0_agg",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT user_id, count(*) AS n_events
FROM bucketed WHERE drop_bucket = 0
GROUP BY user_id
""",
)
def statestore_read_batch0_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """option("batchId", 0) over the fully-drained agg checkpoint: the
    store re-opened as of micro-batch 0, AFTER two further batches have
    been committed on top — time travel, not just early read. Batch 0
    processed exactly staged bucket 0, so the point-in-time state must
    equal the batch GROUP BY over that slice (users whose first event
    arrives later are ABSENT here, not zero — the key-existence property
    a restart-from-batch-0 would resume with). Read cost: one task per
    state partition opening version-1 delta files; history depth changes
    file choice, not parallelism."""
    ckpt = _drained_agg_checkpoint(spark, sf_dir)
    st = _read_state(spark, ckpt, _AGG_STATE_DDL, batchId="0")
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# statestore_read_batch_evolution — the same key's state across ALL batches
# ---------------------------------------------------------------------------


@register(
    "statestore_read_batch_evolution",
    oracle=f"""
WITH {_BUCKETED_CTE},
batches AS (SELECT * FROM (VALUES (0), (1), (2)) AS b(batch_id))
SELECT b.batch_id AS batch_id, e.user_id,
       CAST(count(*) AS BIGINT) AS n_events
FROM batches b JOIN bucketed e ON e.drop_bucket <= b.batch_id
GROUP BY b.batch_id, e.user_id
""",
)
def statestore_read_batch_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The agg state read back at EVERY committed batch (batchId ∈ {0,1,2})
    and unioned with a batch_id tag: per user, the running count exactly as
    each micro-batch left it. The oracle is the cumulative GROUP BY over
    buckets ≤ b — green means the store's whole history matches a batch
    replay at every prefix, the strongest executable form of 'the
    checkpoint is restartable from any batch'. Three bounded point reads,
    each partition-parallel; the union is plan-level (no driver
    materialization)."""
    ckpt = _drained_agg_checkpoint(spark, sf_dir)
    out = None
    for b in (0, 1, 2):
        st = _read_state(spark, ckpt, _AGG_STATE_DDL, batchId=str(b)).select(
            F.lit(b).alias("batch_id"),
            F.col("key.user_id").alias("user_id"),
            F.col("value.count").alias("n_events"),
        )
        out = st if out is None else out.unionByName(st)
    return out


# ---------------------------------------------------------------------------
# statestore_read_changefeed_dedup — the changelog as a first-seen relation
# ---------------------------------------------------------------------------


@register(
    "statestore_read_changefeed_dedup",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT user_id, event_type,
       CAST(min(drop_bucket) AS BIGINT) AS first_batch,
       'update' AS change_type
FROM bucketed
GROUP BY user_id, event_type
""",
)
def statestore_read_changefeed_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """readChangeFeed over a dropDuplicates drain (RocksDB changelog
    checkpointing ON): the dedup store writes each key exactly ONCE — an
    'update' put in the micro-batch that first sees the pair, and never
    again on later duplicates — so the change feed IS the first-seen
    relation: (user_id, event_type, batch first seen). Oracle:
    min(drop_bucket) per distinct pair. This is the O(delta) audit shape:
    reading 'what did these batches insert' costs the changelog files in
    the range, not a scan of total state — the reason the changelog
    exists. NULL user_id dedups as its own key on both engines (nulls
    tier)."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    with _rocksdb_changelog(spark, enabled=True):
        dd = _read_stream(spark, staging).dropDuplicates(
            ["user_id", "event_type"]
        )
        ckpt = _drain_to_checkpoint(spark, dd, "append")
    cf = _read_state(
        spark, ckpt,
        "batch_id bigint, change_type string, "
        "key struct<user_id: bigint, event_type: string>, "
        "value struct<dummy: int>, partition_id int",
        readChangeFeed="true", changeStartBatchId="0",
    )
    return cf.groupBy(
        F.col("key.user_id").alias("user_id"),
        F.col("key.event_type").alias("event_type"),
    ).agg(
        F.min("batch_id").alias("first_batch"),
        F.min("change_type").alias("change_type"),
    )


# ---------------------------------------------------------------------------
# statestore_read_changefeed_agg — per-batch state deltas of an aggregation
# ---------------------------------------------------------------------------


@register(
    "statestore_read_changefeed_agg",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT user_id,
       CAST(count(DISTINCT drop_bucket) AS BIGINT) AS n_updates,
       CAST(count(*) AS BIGINT) AS final_count
FROM bucketed
GROUP BY user_id
""",
)
def statestore_read_changefeed_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """readChangeFeed over the streaming aggregation: an update-mode agg
    rewrites a key's state buffer only in micro-batches where that key
    received input, so per user the feed carries one 'update' row per
    ACTIVE batch — n_updates = distinct staged buckets containing the
    user's events — and the LAST update's value.count is the final
    aggregate. Both are recovered from the changelog alone (max_by over
    batch_id, JVM-side), no latest-state read: the delta stream is
    self-sufficient for reconstructing current state, which is precisely
    the changelog-checkpointing recovery contract."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    with _rocksdb_changelog(spark, enabled=True):
        agg = (
            _read_stream(spark, staging)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)))
        )
        ckpt = _drain_to_checkpoint(spark, agg, "update")
    cf = _read_state(
        spark, ckpt,
        "batch_id bigint, change_type string, "
        "key struct<user_id: bigint>, "
        "value struct<count: bigint>, partition_id int",
        readChangeFeed="true", changeStartBatchId="0",
    )
    return cf.groupBy(F.col("key.user_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_updates"),
        F.max_by(F.col("value.count"), F.col("batch_id")).alias("final_count"),
    )


# ---------------------------------------------------------------------------
# statestore_read_snapshot_reconstruction — rebuild a batch from snapshots
# ---------------------------------------------------------------------------


@register(
    "statestore_read_snapshot_reconstruction",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT user_id, count(*) AS n_events
FROM bucketed WHERE drop_bucket <= 1
GROUP BY user_id
""",
)
def statestore_read_snapshot_reconstruction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """snapshotStartBatchId + snapshotPartitionId: every state partition of
    batch 1 rebuilt from its OWN version-2 snapshot file (changelog
    checkpointing OFF ⇒ the RocksDB provider uploads a full .zip per
    commit; pairing snapshotStartBatchId=1 with batchId=1 pins the replay
    range to empty, so the snapshot alone must carry the state). The
    per-partition reads are unioned and checked against the cumulative
    batch oracle over buckets ≤ 1 — green means each snapshot file is
    individually sufficient to recover its partition, the file-level
    forensics this option exists for. The fan-out is one bounded read per
    state partition; the count comes from the checkpoint's own
    state-metadata (a one-row metadata read, not data)."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    with _rocksdb_changelog(spark, enabled=False):
        agg = (
            _read_stream(spark, staging)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)))
        )
        ckpt = _drain_to_checkpoint(spark, agg, "update")
    import os

    has_commit = os.path.isdir(os.path.join(ckpt, "commits")) and any(
        not e.startswith(".")
        for e in os.listdir(os.path.join(ckpt, "commits"))
    )
    if not has_commit:
        return spark.createDataFrame([], "user_id bigint, n_events bigint")
    n_part = (
        spark.read.format("state-metadata")
        .load(ckpt)
        .select("numPartitions")
        .head()[0]
    )
    out = None
    for p in range(int(n_part)):
        st = _read_state(
            spark, ckpt, _AGG_STATE_DDL,
            snapshotStartBatchId="1", snapshotPartitionId=str(p),
            batchId="1",
        )
        out = st if out is None else out.unionByName(st)
    return out.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").alias("n_events"),
    )
