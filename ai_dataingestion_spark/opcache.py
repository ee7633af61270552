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

Entries are tagged with the CREATING Thread object (ADVICE r7): a threaded
bench or parallel pytest runs each operator on its own thread, and an
untagged global list would let thread A's release_op_caches() unpersist
thread B's live intermediates mid-build — silent recompute at best, and for
the two partition-assignment-consistency operators
(fn_global_row_index_scalable, sample_weighted_systematic) a correctness
hazard, because Spark does not guarantee repartitionByRange resamples
identically on recompute. A release call frees the CALLING thread's entries
plus any entry whose creating thread has exited (its operator can no longer
be mid-build, and without this drain a thread-per-operator harness would
reintroduce the very leak this module fixes). Thread OBJECTS, not idents,
are the tag: CPython recycles idents after thread exit, which would
misattribute a dead thread's entries to a new worker.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LIVE: list[tuple[threading.Thread, DataFrame]] = []
_LOCK = threading.Lock()


def op_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK default) and track it for release
    when the next operator starts on this thread (or, if this thread exits
    first, at any later release call). Use as ``.transform(op_cache)``."""
    out = df.persist()
    with _LOCK:
        _LIVE.append((threading.current_thread(), out))
    return out


def release_op_caches() -> None:
    """Unpersist every cache tracked by previous operator invocations on the
    CALLING thread, plus entries of threads that have exited (a live other
    thread's intermediates are never touched). Safe against stopped
    sessions (best-effort)."""
    me = threading.current_thread()
    with _LOCK:
        mine = [df for t, df in _LIVE if t is me or not t.is_alive()]
        _LIVE[:] = [(t, df) for t, df in _LIVE if t is not me and t.is_alive()]
    for df in mine:
        try:
            df.unpersist(blocking=True)
        except Exception:
            pass


def live_cache_count() -> int:
    """Diagnostic: tracked-but-unreleased caches attributed to the calling
    thread — including dead-thread entries it would drain (tests assert 0
    after a raising operator)."""
    me = threading.current_thread()
    with _LOCK:
        return sum(1 for t, _ in _LIVE if t is me or not t.is_alive())
