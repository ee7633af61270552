"""§2.I round-11 block: Spark 4 streaming state-v2 surface (SURVEY.md §7.2b).

transformWithStateInPandas variants stream_stateful (ValueState) left
uncovered — ListState tails, MapState per-key counters, event-time timers,
initial-state seeding — plus a streaming Python data source with offset
resume across restarts (source_python_datasource covers batch only).

Every operator follows the incremental.py pattern: deterministic staged
drops + Trigger.AvailableNow, memory/parquet sink, final state compared to a
batch-replay DuckDB oracle. And every transformWithState operator carries a
legacy applyInPandasWithState twin with identical semantics: the primary
path needs the protobuf state-server runtime (has_tws_runtime), the twin
runs everywhere — the SAME oracle checks whichever executed, exactly the
stream_stateful arrangement.

Determinism contract (shared with the watermark-late replay oracle):
staging is (ts, event_id)-ascending across drops AND each processor sorts
its per-batch rows by (ts, event_id), so per-key arrival order equals
global (ts, event_id) order and cross-batch state transitions replay as
plain SQL. NULL / pre-epoch event times are quarantined explicitly on both
engines wherever event-time drives state (watermarks/timers initialize at
epoch 0 and would eat them silently otherwise).

At 100 TB the same topology holds: per-key state is partitioned by the
grouping key across the cluster (RocksDB-backed, watermark-bounded), and
the poll-source's external cursor becomes the upstream system's changelog
position.
"""

from __future__ import annotations

import contextlib
import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.streaming.incremental import (
    _memory_query_name,
    _read_stream,
    _run_available_now,
    has_tws_runtime,
    rocksdb_state_store,
    stage_event_files,
)
from ai_dataingestion_spark.tmpdirs import op_tmpdir

_TAIL_K = 3
_GAP_MS = 30 * 60 * 1000  # 30-minute session gap, epoch-ms (timer domain)


def _sorted_batch(pdf_iter) -> pd.DataFrame:
    """Concatenate one key's micro-batch chunks and sort (ts, event_id) —
    the within-batch half of the determinism contract (module docstring)."""
    chunks = [pdf for pdf in pdf_iter]
    if not chunks:
        return pd.DataFrame()
    pdf = pd.concat(chunks, ignore_index=True)
    return pdf.sort_values(["ts", "event_id"], na_position="last")


def _epoch_quarantine(df: DataFrame) -> DataFrame:
    """The explicit NULL / pre-epoch event-time gate every event-time-driven
    stateful operator applies (mirrored verbatim in the oracles)."""
    return df.withColumn("ts", F.col("ts").cast("timestamp")).where(
        F.col("ts").isNotNull()
        & (F.col("ts") >= F.lit("1970-01-01").cast("timestamp"))
    )


# ---------------------------------------------------------------------------
# stream_tws_list_state — per-user last-K tail in ListState
# ---------------------------------------------------------------------------


def _summable(v) -> bool:
    """The finite-domain tail contract (nan tier): SQL NULL and NaN are
    INDISTINGUISHABLE after the Arrow->pandas float64 crossing (NULL
    arrives as NaN), and DuckDB SUM propagates a NaN operand while a
    pandas-side accumulator cannot even see one as distinct from NULL —
    so tail_sum sums FINITE values only (NULL, NaN and ±Inf all excluded),
    mirrored in the oracle via isfinite()."""
    import math

    return bool(pd.notna(v)) and math.isfinite(float(v))


class _TailProcessor(StatefulProcessor):
    """ListState carrying each user's last-K (value, summable) pairs across
    micro-batches; a ValueState counts total arrivals. Values are coalesced
    to 0.0 with a flag rather than stored nullable — SQL SUM semantics over
    the finite domain (NULL when no finite value in the tail) are
    reconstructed at emission; see _summable for the domain contract."""

    def init(self, handle) -> None:
        self._tail = handle.getListState("tail", "v double, nn boolean")
        self._n = handle.getValueState("n", "n bigint")

    def handleInputRows(self, key, rows, timer_values):
        tail = list(self._tail.get()) if self._tail.exists() else []
        n = self._n.get()[0] if self._n.exists() else 0
        pdf = _sorted_batch(rows)
        for v in pdf["value"]:
            nn = _summable(v)
            tail.append((float(v) if nn else 0.0, nn))
        n += len(pdf)
        tail = tail[-_TAIL_K:]
        self._tail.put(tail)
        self._n.update((n,))
        yield _tail_emit(key[0], n, tail)

    def close(self) -> None:
        pass


def _tail_emit(user_id, n: int, tail: list) -> pd.DataFrame:
    kept = [v for v, nn in tail if nn]
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_seen": [n],
            "tail_n": [len(tail)],
            "tail_sum": [float(sum(kept)) if kept else None],
        }
    )


def _tail_legacy(key, pdf_iter, state: GroupState):
    """applyInPandasWithState twin of _TailProcessor: the ListState is a
    pair of parallel primitive arrays in the state struct (no nullable
    array elements cross the Arrow state boundary)."""
    vals, flags, n = ([], [], 0)
    if state.exists:
        vals, flags, n = state.get
        vals, flags = list(vals), list(flags)
    pdf = _sorted_batch(pdf_iter)
    for v in pdf["value"]:
        nn = _summable(v)
        vals.append(float(v) if nn else 0.0)
        flags.append(nn)
    n += len(pdf)
    vals, flags = vals[-_TAIL_K:], flags[-_TAIL_K:]
    state.update((vals, flags, n))
    yield _tail_emit(key[0], n, list(zip(vals, flags)))


_TAIL_OUT = "user_id bigint, n_seen bigint, tail_n bigint, tail_sum double"


@register(
    "stream_tws_list_state",
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
       -- finite-domain tail sum (nan tier): NULL/NaN/Inf excluded on both
       -- engines — see _summable; isfinite(NULL) is NULL, so one CASE
       -- covers all three exclusions
       round(sum(CASE WHEN isfinite(value) THEN value END), 4) AS tail_sum
FROM ranked WHERE rn <= {_TAIL_K}
GROUP BY user_id, n_seen
""",
)
def stream_tws_list_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user last-{K} event-value tail carried in a ListState across
    micro-batches (the feature-store 'recent activity' primitive):
    transformWithStateInPandas appendValue/put keeps the list bounded at K
    on every batch — state is O(K) per key no matter how long the stream
    runs. Legacy twin: parallel primitive arrays in applyInPandasWithState
    state. Update-mode emissions carry a monotone n_seen, so the final
    state per user is its max-n_seen row; the batch-replay oracle is the
    last-K window over (ts, event_id) order. Values ride along as
    (0.0, summable) pairs so tail_sum reproduces SQL SUM over the FINITE
    domain — NULL/NaN/±Inf excluded on both engines (see _summable: the
    Arrow float64 crossing makes NULL and NaN indistinguishable in
    pandas), NULL when the whole tail is non-finite."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    name = _memory_query_name()
    grouped = _epoch_quarantine(_read_stream(spark, staging)).groupBy("user_id")
    if has_tws_runtime():
        running = grouped.transformWithStateInPandas(
            statefulProcessor=_TailProcessor(),
            outputStructType=_TAIL_OUT,
            outputMode="Update",
            timeMode="None",
        )
        ctx = rocksdb_state_store(spark)
    else:
        running = grouped.applyInPandasWithState(
            _tail_legacy,
            outputStructType=_TAIL_OUT,
            stateStructType="vals array<double>, flags array<boolean>, n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        ctx = contextlib.nullcontext()
    with ctx:
        _run_available_now(
            running.writeStream.format("memory").queryName(name).outputMode("update")
        )
    out = spark.table(name)
    # final state per user = its max-n_seen emission; row_number (not a
    # self-join: the memory view's attributes conflict when joined to
    # itself) — one window over the few-rows-per-user update log
    w = Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "n_seen",
            "tail_n",
            F.round("tail_sum", 4).alias("tail_sum"),
        )
    )


# ---------------------------------------------------------------------------
# stream_tws_map_state — per-user MapState[event_type -> running count]
# ---------------------------------------------------------------------------


class _TypeCountProcessor(StatefulProcessor):
    """MapState keyed by event_type holding running counts per user;
    each batch emits only the keys it touched (running totals)."""

    def init(self, handle) -> None:
        self._m = handle.getMapState("counts", "t string", "c bigint")

    def handleInputRows(self, key, rows, timer_values):
        pdf = _sorted_batch(rows)
        touched: dict[str, int] = {}
        for t in pdf["event_type"]:
            touched[t] = touched.get(t, 0) + 1
        out_t, out_c = [], []
        for t, delta in touched.items():
            cur = (
                self._m.getValue((t,))[0] if self._m.containsKey((t,)) else 0
            )
            self._m.updateValue((t,), (cur + delta,))
            out_t.append(t)
            out_c.append(cur + delta)
        yield pd.DataFrame(
            {"user_id": [key[0]] * len(out_t), "event_type": out_t, "n": out_c}
        )

    def close(self) -> None:
        pass


def _type_count_legacy(key, pdf_iter, state: GroupState):
    """applyInPandasWithState twin: the map rides as a JSON object in a
    single string state column (string->int maps are JSON-exact)."""
    counts: dict[str, int] = json.loads(state.get[0]) if state.exists else {}
    pdf = _sorted_batch(pdf_iter)
    touched: dict[str, int] = {}
    for t in pdf["event_type"]:
        touched[t] = touched.get(t, 0) + 1
    for t, delta in touched.items():
        counts[t] = counts.get(t, 0) + delta
    state.update((json.dumps(counts, sort_keys=True),))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(touched),
            "event_type": list(touched),
            "n": [counts[t] for t in touched],
        }
    )


@register(
    "stream_tws_map_state",
    oracle="""
SELECT user_id, event_type, count(*) AS n
FROM events
WHERE event_type IS NOT NULL
GROUP BY user_id, event_type
""",
)
def stream_tws_map_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user per-event-type running counters in a MapState (the
    dynamic-key twin of stream_stateful's single ValueState — the shape a
    per-entity feature map takes when the key set isn't known up front):
    getValue/updateValue against the map, one map entry per type the user
    ever produced. Legacy twin: JSON-object state column. Running counts
    are monotone, so max-per-(user,type) over the update-mode emissions is
    the final map content; the oracle is the plain batch GROUP BY. NULL
    event_type is quarantined on both engines (a NULL map key is dirty
    input, not a counter)."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    name = _memory_query_name()
    grouped = (
        _read_stream(spark, staging)
        .where(F.col("event_type").isNotNull())
        .groupBy("user_id")
    )
    if has_tws_runtime():
        running = grouped.transformWithStateInPandas(
            statefulProcessor=_TypeCountProcessor(),
            outputStructType="user_id bigint, event_type string, n bigint",
            outputMode="Update",
            timeMode="None",
        )
        ctx = rocksdb_state_store(spark)
    else:
        running = grouped.applyInPandasWithState(
            _type_count_legacy,
            outputStructType="user_id bigint, event_type string, n bigint",
            stateStructType="m string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        ctx = contextlib.nullcontext()
    with ctx:
        _run_available_now(
            running.writeStream.format("memory").queryName(name).outputMode("update")
        )
    return (
        spark.table(name)
        .groupBy("user_id", "event_type")
        .agg(F.max("n").alias("n"))
    )


# ---------------------------------------------------------------------------
# stream_tws_initial_state — state seeded from a batch relation
# ---------------------------------------------------------------------------


def _seed_expr(col):
    """Deterministic synthetic 'prior count' carried over from a previous
    deployment: (user_id % 7) * 3 — arithmetic both engines reproduce."""
    return (col % 7) * 3


class _SeededCountProcessor(StatefulProcessor):
    """ValueState counter whose initial value comes from the initialState
    relation (handleInitialState) instead of zero — the state-migration
    path a replatformed pipeline uses to carry totals across."""

    def init(self, handle) -> None:
        self._n = handle.getValueState("n", "n bigint")

    def handleInitialState(self, key, initialState, timer_values) -> None:
        self._n.update((int(initialState["seed"]),))

    def handleInputRows(self, key, rows, timer_values):
        n = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._n.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_total": [n]})

    def close(self) -> None:
        pass


def _seeded_count_legacy(key, pdf_iter, state: GroupState):
    """Twin: the legacy API has no initialState parameter, so the seed is
    applied on first touch — same arithmetic, same final state."""
    n = state.get[0] if state.exists else int(_seed_py(key[0]))
    for pdf in pdf_iter:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_total": [n]})


def _seed_py(user_id: int) -> int:
    return (int(user_id) % 7) * 3


@register(
    "stream_tws_initial_state",
    oracle="""
SELECT user_id,
       count(*) + (user_id % 7) * 3 AS n_total
FROM events
-- NULL state keys are dirty input, not a seedable entity (the seed
-- arithmetic is NULL on NULL anyway) — quarantined on both engines
WHERE user_id IS NOT NULL
GROUP BY user_id
""",
)
def stream_tws_initial_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful counting with MIGRATED initial state: the
    transformWithStateInPandas initialState relation seeds each user's
    ValueState with a deterministic prior ((user_id % 7) * 3) before the
    first batch, so final counts are batch-count + prior — the zero-downtime
    replatforming pattern (carry totals from the old system, keep counting).
    Legacy twin applies the same seed on first touch. Only users present in
    the stream emit (a seed with no arrivals stays latent — matching the
    oracle's GROUP BY over events)."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    name = _memory_query_name()
    stream = _read_stream(spark, staging).where(F.col("user_id").isNotNull())
    grouped = stream.groupBy("user_id")
    if has_tws_runtime():
        seeds = (
            spark.read.schema(stream.schema)
            .parquet(staging)
            # mirror the stream's NULL-key quarantine (ADVICE r11 #1): a
            # NULL user_id seed row would reach handleInitialState with a
            # NULL seed and raise at int(initialState["seed"]) — the seed
            # relation must match the entity set the stream can ever key
            .where(F.col("user_id").isNotNull())
            .select("user_id")
            .distinct()
            .withColumn("seed", _seed_expr(F.col("user_id")).cast("bigint"))
            .groupBy("user_id")
        )
        running = grouped.transformWithStateInPandas(
            statefulProcessor=_SeededCountProcessor(),
            outputStructType="user_id bigint, n_total bigint",
            outputMode="Update",
            timeMode="None",
            initialState=seeds,
        )
        ctx = rocksdb_state_store(spark)
    else:
        running = grouped.applyInPandasWithState(
            _seeded_count_legacy,
            outputStructType="user_id bigint, n_total bigint",
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        ctx = contextlib.nullcontext()
    with ctx:
        _run_available_now(
            running.writeStream.format("memory").queryName(name).outputMode("update")
        )
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_total").alias("n_total"))
    )


# ---------------------------------------------------------------------------
# stream_tws_event_timer — session close via event-time timers
# ---------------------------------------------------------------------------


_SESS_OUT = "user_id bigint, sess_start_us bigint, n_events bigint"


def _sess_emit(user_id, start_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {"user_id": [user_id], "sess_start_us": [start_us], "n_events": [n]}
    )


class _SessionTimerProcessor(StatefulProcessor):
    """30-minute-gap sessions closed EITHER by the next event (gap seen in
    the data) OR by an event-time timer at last_ts + 30min once the
    watermark passes it (the tail session of a gone-quiet user — the case
    no amount of incoming data can close). registerTimer/deleteTimer keep
    exactly one live timer per key."""

    def init(self, handle) -> None:
        self._s = handle.getValueState("sess", "start_us bigint, last_us bigint, n bigint")
        self._handle = handle

    def handleInputRows(self, key, rows, timer_values):
        start_us, last_us, n = (
            self._s.get() if self._s.exists() else (None, None, 0)
        )
        pdf = _sorted_batch(rows)
        for ts in pdf["ts"]:
            t_us = int(ts.value // 1000)  # pandas ns -> epoch µs
            if start_us is None:
                start_us, last_us, n = t_us, t_us, 1
            elif t_us - last_us > _GAP_MS * 1000:
                yield _sess_emit(key[0], start_us, n)
                start_us, last_us, n = t_us, t_us, 1
            else:
                last_us, n = t_us, n + 1
        if start_us is not None:
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            self._handle.registerTimer(last_us // 1000 + _GAP_MS)
            self._s.update((start_us, last_us, n))

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        if self._s.exists():
            start_us, last_us, n = self._s.get()
            self._s.clear()
            yield _sess_emit(key[0], start_us, n)

    def close(self) -> None:
        pass


def _session_timer_legacy(key, pdf_iter, state: GroupState):
    """applyInPandasWithState twin: GroupState's single event-time timeout
    IS the one-live-timer-per-key discipline (setTimeoutTimestamp
    overwrites)."""
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield _sess_emit(key[0], start_us, n)
        return
    start_us, last_us, n = state.get if state.exists else (None, None, 0)
    pdf = _sorted_batch(pdf_iter)
    for ts in pdf["ts"]:
        t_us = int(ts.value // 1000)
        if start_us is None:
            start_us, last_us, n = t_us, t_us, 1
        elif t_us - last_us > _GAP_MS * 1000:
            yield _sess_emit(key[0], start_us, n)
            start_us, last_us, n = t_us, t_us, 1
        else:
            last_us, n = t_us, n + 1
    if start_us is not None:
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // 1000 + _GAP_MS)


@register(
    "stream_tws_event_timer",
    oracle="""
WITH kept AS (
  SELECT user_id, event_id, ts FROM events
  WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01'
),
wm AS (
  SELECT epoch_us(max(ts)) - 10 * 60 * 1000000 AS frontier_us FROM kept
),
marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_start
  FROM kept
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  -- event_id tiebreak in the running frame too: a ROWS frame ordered by a
  -- tied key would assign sids nondeterministically
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
agg AS (
  SELECT user_id, sid,
         epoch_us(min(ts)) AS sess_start_us,
         epoch_us(max(ts)) AS sess_last_us,
         count(*) AS n_events,
         max(sid) OVER (PARTITION BY user_id) AS max_sid
  FROM sess GROUP BY user_id, sid
)
SELECT user_id, sess_start_us, n_events
FROM agg, wm
-- closed by the NEXT session's first event (gap observed in-stream), or by
-- the event-time timer at last+30min once the final watermark passes it
-- (strictly-greater expiry, pinned in tests/test_streaming.py)
-- timer comparison is MILLISECOND-domain on both sides (ADVICE r11 #3):
-- the engine registers timers at last_us // 1000 + gap_ms and Spark's
-- watermark is ms-truncated from the max event time, so the oracle
-- truncates both operands to ms too — a sub-ms component sitting exactly
-- on the 30min+10min boundary must resolve identically on both engines
WHERE sid < max_sid
   OR sess_last_us // 1000 + 30 * 60 * 1000
      < wm.frontier_us // 1000
""",
)
def stream_tws_event_timer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time timers closing 30-minute-gap sessions (the canonical
    stateful-timer pattern): a session is emitted when its user's next
    event reveals the gap, or — for the user's LAST session — when the
    event-time timer registered at last_ts + 30min expires under the
    advancing watermark. transformWithStateInPandas registerTimer /
    handleExpiredTimer; legacy twin uses GroupState's EventTimeTimeout.
    The batch-replay oracle sessionizes in SQL and applies the two closure
    rules; the timer-expiry boundary is STRICTLY greater than the final
    watermark (max kept ts - 10min), pinned empirically in
    tests/test_streaming.py. Output timestamps ride as epoch-µs int64
    (the §2.I session convention — engine string formats diverge on
    sub-second timestamps)."""
    staging = stage_event_files(spark, sf_dir, n_files=3)
    name = _memory_query_name()
    grouped = (
        _epoch_quarantine(_read_stream(spark, staging))
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
    )
    if has_tws_runtime():
        running = grouped.transformWithStateInPandas(
            statefulProcessor=_SessionTimerProcessor(),
            outputStructType=_SESS_OUT,
            outputMode="Append",
            timeMode="EventTime",
        )
        ctx = rocksdb_state_store(spark)
    else:
        running = grouped.applyInPandasWithState(
            _session_timer_legacy,
            outputStructType=_SESS_OUT,
            stateStructType="start_us bigint, last_us bigint, n bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        ctx = contextlib.nullcontext()
    with ctx:
        _run_available_now(
            running.writeStream.format("memory").queryName(name).outputMode("append")
        )
    return spark.table(name)


# ---------------------------------------------------------------------------
# source_python_datasource_stream — poll source with offset resume
# ---------------------------------------------------------------------------

_PYDSS_N = 600
_PYDSS_STEP = 200
_PYDSS_PARTS = 8


@register(
    "source_python_datasource_stream",
    oracle=f"""
WITH g AS (SELECT unnest(generate_series(0, {_PYDSS_N - 1})) AS k)
SELECT count(*) AS n,
       CAST(sum(k * 7) AS BIGINT) AS sum_v,
       count(DISTINCT batch_lo) AS n_batches,
       count(DISTINCT k % {_PYDSS_PARTS}) AS n_partitions_touched
FROM (SELECT k, (k // {_PYDSS_STEP}) * {_PYDSS_STEP} AS batch_lo FROM g)
""",
)
def source_python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A custom STREAMING connector through the Python Data Source API
    (SPARK-44076): DataSourceStreamReader with initialOffset /
    latestOffset / partitions / read / commit. The source polls an
    external cursor (a file standing in for an upstream changelog
    position); the op runs THREE AvailableNow drains against ONE
    checkpoint, bumping the cursor between runs — so batch 2 must resume
    from the committed offset of batch 1, not from zero. The parquet sink
    then holds each k exactly once with its batch's start offset stamped
    on the row: n proves no loss, sum_v no corruption, n_batches = 3
    proves the restarts really were incremental, n_partitions_touched = 8
    proves every planned InputPartition produced rows. This is the
    exactly-once resume contract a real connector (Kafka-like cursor,
    vendor changelog) must satisfy; at scale only the cursor poll is
    driver-side — row reads fan out one task per InputPartition."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    avail_path = os.path.join(op_tmpdir("pydss_cursor_"), "available.txt")

    class CounterTicks(DataSource):
        @classmethod
        def name(cls) -> str:
            return "counter_ticks"

        def schema(self) -> str:
            return "k bigint, v bigint, batch_lo bigint"

        def streamReader(self, schema):
            return _TickReader(self.options)

    class _TickReader(DataSourceStreamReader):
        def __init__(self, options):
            self.parts = int(options.get("parts", 4))
            self.avail_file = options["avail_file"]

        def initialOffset(self):
            return {"k": 0}

        def latestOffset(self):
            # the external cursor: how far upstream data exists RIGHT NOW
            with open(self.avail_file) as f:
                return {"k": int(f.read().strip())}

        def partitions(self, start, end):
            return [
                InputPartition((start["k"], end["k"], i))
                for i in range(self.parts)
            ]

        def read(self, part):
            lo, hi, pid = part.value
            for k in range(lo + pid, hi, self.parts):
                yield (k, k * 7, lo)

        def commit(self, end) -> None:
            pass

    spark.dataSource.register(CounterTicks)
    out = op_tmpdir("pydss_out_")
    ckpt = op_tmpdir("pydss_ckpt_")
    for avail in range(_PYDSS_STEP, _PYDSS_N + 1, _PYDSS_STEP):
        with open(avail_path, "w") as f:
            f.write(str(avail))
        _run_available_now(
            spark.readStream.format("counter_ticks")
            .option("parts", str(_PYDSS_PARTS))
            .option("avail_file", avail_path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
        )
    return (
        spark.read.schema("k bigint, v bigint, batch_lo bigint")
        .parquet(out)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("bigint").alias("sum_v"),
            F.count_distinct("batch_lo").alias("n_batches"),
            F.count_distinct(F.col("k") % _PYDSS_PARTS).alias(
                "n_partitions_touched"
            ),
        )
    )
