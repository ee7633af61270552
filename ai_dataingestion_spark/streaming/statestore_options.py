"""§2.W round-15 completion: the state source's remaining reader options —
bounded change-feed windows (`changeEndBatchId`) and the multi-store
checkpoint inventory (SPARK-45511 surface; VERDICT-r14 item 2 /
SURVEY.md §7.2 round-15 candidate (b)).

§2.AC (statestore_timetravel.py) reads the change feed from a START batch
to the head; production audits ask the bounded question — "what did
batches [a, b] touch?" — which is `changeStartBatchId` + `changeEndBatchId`
together. Two complementary proofs land here:

- a SINGLE-batch window ([1, 1]): the feed restricted to one micro-batch
  is exactly that batch's delta — the keys bucket 1 touched, each carrying
  its cumulative aggregate as of batch 1;
- a PREFIX window ([0, 1]) folded with max_by(batch_id): the truncated
  feed alone reconstructs point-in-time state at batch 1 — the delta-path
  twin of §2.AC's direct `batchId=1` read, proving feed-replay and
  store-reopen agree.

The third op reads `format("state-metadata")` over a stream-stream join
checkpoint: a symmetric hash join maintains FOUR state stores (per side:
key→row-count and key+index→row), and the inventory op pins that
operational fact — the store names an audit must enumerate before sizing
or migrating join state.

`flattenCollectionTypes` (list/map-state rows exploded per element)
remains ENVIRONMENT-BLOCKED: it only applies to `stateVarName` reads of
transformWithState checkpoints, and the TWS primary runtime needs the
protobuf wheel this container lacks (SCALE.md round-13; the self-arming
skip in tests/test_streaming.py covers the unlock).

Scale posture: identical to statestore_reader.py:16 — every read plans
one task per state partition; a bounded change-feed window reads
changelog files proportional to the BATCH RANGE requested, never total
state size (the O(delta) audit shape), and the metadata read is a
constant-row file-footer scan.

Conf discipline: the RocksDB provider + changelog flag route through
statestore_timetravel._rocksdb_changelog (set for the drain, restored in
a finally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.streaming.incremental import (
    _read_stream,
    stage_event_files,
)
from ai_dataingestion_spark.streaming.statestore_reader import (
    _drain_to_checkpoint,
    _read_state,
)
from ai_dataingestion_spark.streaming.statestore_timetravel import (
    _BUCKETED_CTE,
    _rocksdb_changelog,
)

_CF_AGG_DDL = (
    "batch_id bigint, change_type string, "
    "key struct<user_id: bigint>, "
    "value struct<count: bigint>, partition_id int"
)


def _changelog_agg_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Shared drain for the window ops: streaming groupBy(user_id).count()
    over the 3-file staged corpus with RocksDB changelog checkpointing ON
    (the change feed's input format)."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    with _rocksdb_changelog(spark, enabled=True):
        agg = (
            _read_stream(spark, staging)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)))
        )
        return _drain_to_checkpoint(spark, agg, "update")


# ---------------------------------------------------------------------------
# statestore_read_changefeed_window — one batch's delta, bounded both ends
# ---------------------------------------------------------------------------


@register(
    "statestore_read_changefeed_window",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT user_id,
       'update' AS change_type,
       CAST(count(*) FILTER (WHERE drop_bucket <= 1) AS BIGINT)
         AS count_after_b1
FROM bucketed
GROUP BY user_id
HAVING count(*) FILTER (WHERE drop_bucket = 1) > 0
""",
)
def statestore_read_changefeed_window(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """changeStartBatchId=1 + changeEndBatchId=1 over the agg drain: the
    feed bounded to ONE micro-batch is exactly that batch's state delta —
    an update-mode aggregation rewrites a key's buffer only in batches
    where the key received input, so the window holds one 'update' row per
    user ACTIVE in staged bucket 1, carrying the cumulative count over
    buckets ≤ 1 (state as the batch left it, not the batch's own count).
    Oracle: the HAVING clause selects bucket-1-active users; the FILTER
    computes their running total. Read cost is the changelog files of one
    version per partition — O(delta), independent of history depth and of
    total state size."""
    ckpt = _changelog_agg_checkpoint(spark, sf_dir)
    cf = _read_state(
        spark, ckpt, _CF_AGG_DDL,
        readChangeFeed="true", changeStartBatchId="1", changeEndBatchId="1",
    )
    return cf.select(
        F.col("key.user_id").alias("user_id"),
        F.col("change_type"),
        F.col("value.count").alias("count_after_b1"),
    )


# ---------------------------------------------------------------------------
# statestore_read_changefeed_prefix_replay — truncated feed == state-as-of
# ---------------------------------------------------------------------------


@register(
    "statestore_read_changefeed_prefix_replay",
    oracle=f"""
WITH {_BUCKETED_CTE}
SELECT user_id,
       CAST(count(DISTINCT drop_bucket)
            FILTER (WHERE drop_bucket <= 1) AS BIGINT) AS n_updates,
       CAST(count(*) FILTER (WHERE drop_bucket <= 1) AS BIGINT)
         AS count_at_b1
FROM bucketed
GROUP BY user_id
HAVING count(*) FILTER (WHERE drop_bucket <= 1) > 0
""",
)
def statestore_read_changefeed_prefix_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """changeEndBatchId as TIME TRAVEL through the delta path: the feed
    truncated to the prefix [0, 1] and folded per key (count of updates +
    max_by(batch_id) final value) must reconstruct exactly the state a
    direct option("batchId", 1) re-open would return — users first active
    in bucket 2 are ABSENT, everyone else carries their count over buckets
    ≤ 1. Green means feed-replay-to-b and store-reopen-at-b agree, the
    property a changelog-based backfill job stands on. The fold is
    JVM-side (max_by over the bounded feed relation), no driver
    materialization."""
    ckpt = _changelog_agg_checkpoint(spark, sf_dir)
    cf = _read_state(
        spark, ckpt, _CF_AGG_DDL,
        readChangeFeed="true", changeStartBatchId="0", changeEndBatchId="1",
    )
    return cf.groupBy(F.col("key.user_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_updates"),
        F.max_by(F.col("value.count"), F.col("batch_id")).alias("count_at_b1"),
    )


# ---------------------------------------------------------------------------
# statestore_read_join_store_inventory — the 4-store join checkpoint census
# ---------------------------------------------------------------------------


@register(
    "statestore_read_join_store_inventory",
    oracle="""
SELECT 'symmetricHashJoin' AS operator_name, store_name, CAST(3 AS BIGINT)
         AS n_batches
FROM (VALUES ('left-keyToNumValues'), ('left-keyWithIndexToValue'),
             ('right-keyToNumValues'), ('right-keyWithIndexToValue'))
       AS s(store_name)
""",
)
def statestore_read_join_store_inventory(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """format("state-metadata") over a stream-stream join checkpoint: a
    symmetric hash join maintains four stores — per side, keyToNumValues
    (join-key row counts) and keyWithIndexToValue (the buffered rows) —
    and the metadata relation must list exactly those four, each spanning
    the drain's full 3-batch range. This is the multi-store inventory an
    ops audit enumerates before sizing or migrating join state
    (statestore_read_join_buffer reads ONE of these stores' contents; this
    op pins the catalog of all four). Constant-cost: the read parses
    checkpoint metadata files, no state data is touched. Empty corpus ⇒
    no committed batch ⇒ empty inventory, handled by the same commit-log
    gate as every state read."""
    import os

    staging = stage_event_files(spark, sf_dir, n_files=3)
    left = _read_stream(spark, staging).select("event_id", "user_id")
    right = _read_stream(spark, staging).select(
        "event_id", F.col("event_type").alias("r_event_type")
    )
    ckpt = _drain_to_checkpoint(spark, left.join(right, "event_id"), "append")
    commits = os.path.join(ckpt, "commits")
    has_commit = os.path.isdir(commits) and any(
        not e.startswith(".") for e in os.listdir(commits)
    )
    if not has_commit:
        return spark.createDataFrame(
            [], "operator_name string, store_name string, n_batches bigint"
        )
    md = spark.read.format("state-metadata").load(ckpt)
    return md.select(
        F.col("operatorName").alias("operator_name"),
        F.col("stateStoreName").alias("store_name"),
        (F.col("maxBatchId") - F.col("minBatchId") + F.lit(1))
        .cast("bigint")
        .alias("n_batches"),
    )
