"""Per-operator cache tracking: fixes the long-session heap leak.

Several operators cache/persist intermediates they reuse within their own
plan (LSH signatures re-banded across configs, edge lists feeding three
triangle sides, range-partitioned relations whose partition assignment must
be consistent across two passes). Those caches are only needed until the
operator's OWN result is collected — but a driver correctness sweep runs 50
operators through ONE SparkSession, and 16 never-released caches accumulate
into real heap pressure (measured: a 24 GB local session OOM'd at the sfx1.0
scale-up after 5 cache-carrying operators, while the same query ran clean in
a fresh session).

``op_cache`` is a drop-in for ``.cache()``/``.persist()`` in method position
via ``.transform(op_cache)``: it persists the DataFrame AND tracks it. The
catalog invokes ``release_op_caches()`` at the START of every operator call,
unpersisting the previous operator's tracked caches — by then its result has
been collected (the driver, bench, and tests all consume sequentially) — and
again (via the catalog's except path) when an operator RAISES, since a
raising operator returns no DataFrame anyone could still consume.

The tracked list is keyed by thread ident (ADVICE r7): a threaded bench or
parallel pytest runs each operator on its own thread, and a process-global
list would let thread A's release_op_caches() unpersist thread B's live
intermediates mid-build — silent recompute at best, and for the two
partition-assignment-consistency operators (fn_global_row_index_scalable,
sample_weighted_systematic) a correctness hazard, because Spark does not
guarantee repartitionByRange resamples identically on recompute. Thread
keying makes cross-thread release impossible; within one thread, the
sequential build-then-consume contract holds for every harness we ship
(driver loop, bench.py min-of-3, pytest parametrize).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LIVE: dict[int, list[DataFrame]] = {}
_LOCK = threading.Lock()


def op_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK default) and track it for release
    when the next operator starts on THIS thread. Use as
    ``.transform(op_cache)``."""
    out = df.persist()
    with _LOCK:
        _LIVE.setdefault(threading.get_ident(), []).append(out)
    return out


def release_op_caches() -> None:
    """Unpersist every cache tracked by previous operator invocations on the
    CALLING thread (other threads' live intermediates are never touched).
    Safe against stopped sessions (best-effort)."""
    with _LOCK:
        mine = _LIVE.pop(threading.get_ident(), [])
    while mine:
        df = mine.pop()
        try:
            df.unpersist(blocking=True)
        except Exception:
            pass


def live_cache_count() -> int:
    """Diagnostic: tracked-but-unreleased caches on the calling thread
    (tests assert 0 after a raising operator)."""
    with _LOCK:
        return len(_LIVE.get(threading.get_ident(), ()))
