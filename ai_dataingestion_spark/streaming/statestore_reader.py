"""§2.W round-13 second block: the State Store reader (`spark.read.format
("statestore")` / `format("state-metadata")`, SPARK-45511).

Spark 4 exposes a streaming checkpoint's state stores as ordinary batch
relations — the state-audit / ops-debugging surface: inspect what a
stateful query is actually carrying without stopping it, reconcile state
against the source, size state before a migration. Each operator here runs
a real stateful drain (the incremental.py staged-drop harness: 3
deterministic event files, Trigger.AvailableNow, maxFilesPerTrigger=1 → 3
micro-batches) against its own checkpoint, then READS THE CHECKPOINT BACK
and oracle-checks the state contents against the equivalent batch SQL over
the same corpus — the strongest executable form of VERDICT-r12 item 4's
"read back the state the drains produce".

Scale posture: the state source plans one scan task per state-store
partition (the same partitioning the streaming query wrote), so the read
is cluster-parallel with no driver collect — at 100 TB of RocksDB state
the audit runs where the state lives. What bounds the state itself is
per-operator and restated in each docstring: per-key O(K) for the tail,
one row per distinct key for dedup, watermark-bounded join buffers in
production (unbounded here only because the AvailableNow corpus is
finite).

Flattening contract: state rows surface as (key struct, value struct,
partition_id). Oracle-compared outputs must be scalar-only (driver canon),
so array-typed state (the ListState tail) is reduced JVM-side with
zip_with/aggregate higher-order functions — no EvalPython in the read
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.streaming.incremental import (
    _memory_query_name,
    _read_stream,
    _run_available_now,
    stage_event_files,
)
from ai_dataingestion_spark.streaming.state_v2 import (
    _TAIL_K,
    _TAIL_OUT,
    _epoch_quarantine,
    _tail_legacy,
)
from ai_dataingestion_spark.tmpdirs import op_tmpdir


def _drain_to_checkpoint(spark: SparkSession, df, output_mode: str) -> str:
    """Run a streaming DataFrame to completion against a fresh checkpoint
    (memory sink; the sink rows are irrelevant — the checkpoint is the
    product) and return the checkpoint path."""
    ckpt = op_tmpdir("ss_ckpt_")
    _run_available_now(
        df.writeStream.format("memory")
        .queryName(_memory_query_name())
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
    )
    return ckpt


def _read_state(spark: SparkSession, ckpt: str, fallback_ddl: str,
                **options: str) -> DataFrame:
    """format("statestore") over a drained checkpoint, with the zero-batch
    edge handled EXPLICITLY: an empty corpus stages no files, so the
    AvailableNow drain commits no batch and the checkpoint holds no state
    the source could read (the reader throws on a state-less checkpoint).
    Zero committed batches ⇒ zero state rows BY DEFINITION, so this
    returns an empty relation with the documented state-row shape — the
    partition-pruned-to-nothing case every 100 TB audit job must survive.
    The gate checks the commit log directly (no exception classing): a
    checkpoint that HAS commits but fails to read still raises loudly."""
    import os

    commits = os.path.join(ckpt, "commits")
    has_commit = os.path.isdir(commits) and any(
        not e.startswith(".") for e in os.listdir(commits)
    )
    if not has_commit:
        return spark.createDataFrame([], fallback_ddl)
    reader = spark.read.format("statestore")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(ckpt)


# ---------------------------------------------------------------------------
# statestore_read_agg_state — streaming aggregation buffers, read back
# ---------------------------------------------------------------------------


@register(
    "statestore_read_agg_state",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       CAST(round(sum(CASE WHEN isfinite(value)
                           THEN CAST(value AS DECIMAL(38,6)) END), 4)
            AS DOUBLE) AS sum_finite
FROM events
GROUP BY user_id
""",
)
def statestore_read_agg_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming groupBy(user_id) count+sum drained over 3 micro-batches,
    then the AGGREGATION STATE read back via format("statestore") and
    flattened: key.user_id, value.count, value.sum — the state IS the
    final aggregate, which is exactly what the batch GROUP BY oracle
    computes. The finite-domain projection (NULL/NaN/±Inf excluded from
    the sum, mirrored by the oracle's isfinite CASE) happens BEFORE the
    stateful operator so the state never carries a non-finite accumulator
    (the nan-tier discipline of stream_tws_list_state,
    state_v2.py:_summable). State size: one buffer row per distinct
    user — dimension-bounded at any corpus scale."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    stream = _read_stream(spark, staging)
    finite = F.col("value").isNotNull() & ~F.isnan("value") & (
        F.abs(F.col("value")) != F.lit(float("inf"))
    )
    # v_fin sums as DECIMAL(38,6) so the STATE BUFFER itself carries the
    # exact order-independent accumulator (the stream_session class,
    # portable.py:stable_rounded_sum — within a micro-batch the shuffle
    # order is nondeterministic, so a double buffer could flip the 4th
    # decimal between draws); non-finites are already excluded by the
    # pre-operator projection, so no raw-double branch is needed.
    agg = (
        stream.withColumn(
            "v_fin", F.when(finite, F.col("value")).cast("decimal(38,6)")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)), F.sum("v_fin"))
    )
    ckpt = _drain_to_checkpoint(spark, agg, "update")
    st = _read_state(
        spark, ckpt,
        "key struct<user_id: bigint>, "
        "value struct<count: bigint, sum: decimal(38,6)>, partition_id int",
    )
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").alias("n_events"),
        F.round(F.col("value.sum"), 4).cast("double").alias("sum_finite"),
    )


# ---------------------------------------------------------------------------
# statestore_read_dedup_state — dropDuplicates key set, read back
# ---------------------------------------------------------------------------


@register(
    "statestore_read_dedup_state",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def statestore_read_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates([user_id, event_type]) drained, then the
    DEDUP STATE read back: the store holds exactly one key row per distinct
    (user_id, event_type) pair (value is an empty marker struct —
    __dummy__), so the read-back key set must equal batch SELECT DISTINCT.
    NULL keys: dropDuplicates groups NULLs like DISTINCT does on both
    engines, so the NULL user_id row survives symmetrically (nulls tier).
    State size = distinct-pair cardinality; in production this is the op
    whose state the audit sizes BEFORE enabling a dedup on a new key set —
    reading the store answers 'how many distinct keys are we carrying' with
    one parallel scan, no replay."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    dd = _read_stream(spark, staging).dropDuplicates(["user_id", "event_type"])
    ckpt = _drain_to_checkpoint(spark, dd, "append")
    st = _read_state(
        spark, ckpt,
        "key struct<user_id: bigint, event_type: string>, "
        "value struct<dummy: int>, partition_id int",
    )
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col("key.event_type").alias("event_type"),
    )


# ---------------------------------------------------------------------------
# statestore_read_liststate_tail — custom stateful operator state, read back
# ---------------------------------------------------------------------------


@register(
    "statestore_read_liststate_tail",
    oracle=f"""
WITH kept AS (
  SELECT user_id, event_id, ts, value FROM events
  WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01'
),
ranked AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_seen
  FROM kept
)
SELECT user_id, n_seen,
       count(*) AS tail_n,
       round(sum(CASE WHEN isfinite(value) THEN value END), 4) AS tail_sum
FROM ranked WHERE rn <= {_TAIL_K}
GROUP BY user_id, n_seen
""",
)
def statestore_read_liststate_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The state-v2 last-K tail (stream_tws_list_state's legacy
    applyInPandasWithState twin, state_v2.py:_tail_legacy) drained against
    a checkpoint, then its CUSTOM OPERATOR STATE read back: the store
    surfaces the user struct under value.groupState — the parallel
    (vals, flags, n) arrays — and this op reconstructs the same
    (n_seen, tail_n, tail_sum) emission PURELY from the persisted state
    with JVM-side higher-order functions (zip_with flag-masks the values,
    filter+aggregate sums the finite ones; no Python in the read path).
    Green here means the state a restart would resume from is
    value-for-value the state the semantics require — the recovery-
    correctness audit, checked against the SAME batch-replay oracle the
    live drain uses. Per-key state is O(K): reading it at 100 TB scans
    bounded rows per user."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    running = (
        _epoch_quarantine(_read_stream(spark, staging))
        .groupBy("user_id")
        .applyInPandasWithState(
            _tail_legacy,
            outputStructType=_TAIL_OUT,
            stateStructType="vals array<double>, flags array<boolean>, n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    ckpt = _drain_to_checkpoint(spark, running, "update")
    st = _read_state(
        spark, ckpt,
        "key struct<user_id: bigint>, "
        "value struct<groupState: struct<vals: array<double>, "
        "flags: array<boolean>, n: bigint>>, partition_id int",
    )
    gs = F.col("value.groupState")
    kept = F.zip_with(gs["vals"], gs["flags"], lambda v, f: F.when(f, v))
    finite_sum = F.aggregate(
        F.filter(kept, lambda x: x.isNotNull()),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    has_finite = F.exists(kept, lambda x: x.isNotNull())
    return st.select(
        F.col("key.user_id").alias("user_id"),
        gs["n"].alias("n_seen"),
        F.size(gs["vals"]).cast("bigint").alias("tail_n"),
        F.when(has_finite, F.round(finite_sum, 4)).alias("tail_sum"),
    )


# ---------------------------------------------------------------------------
# statestore_read_join_buffer — stream-stream join buffered rows, read back
# ---------------------------------------------------------------------------


@register(
    "statestore_read_join_buffer",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_buffered,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_keys,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
""",
)
def statestore_read_join_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream self-join of the event feed on event_id (left projects
    (event_id, user_id), right (event_id, event_type)), then the LEFT join
    buffer read back with option("joinSide", "left"): a symmetric hash
    join buffers every left row keyed by the join key, so the buffer must
    hold exactly the left input — count, distinct keys, and distinct users
    reconcile against the batch source. This is the state-size audit for
    the most state-hungry streaming operator: in production a watermark
    bounds this buffer and the same read measures how far the eviction
    actually lags; here the AvailableNow corpus is finite so the buffer is
    the whole feed. count(DISTINCT user_id) ignores the NULL user group on
    both engines (nulls tier)."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    left = _read_stream(spark, staging).select("event_id", "user_id")
    right = _read_stream(spark, staging).select(
        "event_id", F.col("event_type").alias("r_event_type")
    )
    joined = left.join(right, "event_id")
    ckpt = _drain_to_checkpoint(spark, joined, "append")
    st = _read_state(
        spark, ckpt,
        "key struct<field0: bigint>, "
        "value struct<event_id: bigint, user_id: bigint>, partition_id int",
        joinSide="left",
    )
    return st.agg(
        F.count(F.lit(1)).alias("n_buffered"),
        F.countDistinct(F.col("value.event_id")).alias("n_keys"),
        F.countDistinct(F.col("value.user_id")).alias("n_users"),
    )


# ---------------------------------------------------------------------------
# statestore_read_metadata_inventory — the checkpoint's operator metadata
# ---------------------------------------------------------------------------


@register(
    "statestore_read_metadata_inventory",
    oracle="""
SELECT CAST(0 AS BIGINT) AS operator_id,
       'dedupe' AS operator_name,
       'default' AS state_store_name,
       CAST(3 AS BIGINT) AS n_batches
""",
)
def statestore_read_metadata_inventory(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """format("state-metadata") over a dedup drain's checkpoint: the
    operator inventory (id, name, store name) plus the batch range the
    state spans. The staged harness is 3 files × maxFilesPerTrigger=1, so
    the checkpoint must record exactly batches 0..2 — n_batches pins that
    the AvailableNow drain really executed one micro-batch per staged drop
    (the multi-batch state-evolution property every state_v2 oracle
    depends on), now proven from checkpoint metadata instead of assumed.
    numPartitions is deliberately NOT emitted: it echoes the session's
    bounded shuffle width (an environment knob), not an operator
    property."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    dd = _read_stream(spark, staging).dropDuplicates(["user_id", "event_type"])
    ckpt = _drain_to_checkpoint(spark, dd, "append")
    md = spark.read.format("state-metadata").load(ckpt)
    return md.select(
        F.col("operatorId").cast("bigint").alias("operator_id"),
        F.col("operatorName").alias("operator_name"),
        F.col("stateStoreName").alias("state_store_name"),
        (F.col("maxBatchId") - F.col("minBatchId") + F.lit(1))
        .cast("bigint")
        .alias("n_batches"),
    )
