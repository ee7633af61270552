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

Thread contract (ADVICE r7 + ADVICE r8 medium):

- Entries are tagged with the CREATING Thread object: a threaded bench or
  parallel pytest runs each operator on its own thread, and an untagged
  global list would let thread A's release unpersist thread B's live
  intermediates mid-build. Thread OBJECTS, not idents, are the tag — CPython
  recycles idents after thread exit, which would misattribute a dead
  thread's entries to a new worker.
- A release call frees the CALLING thread's own entries immediately.
- A DEAD thread's entries are NOT freed at the first release that sees them
  (ADVICE r8: a pool harness may build on a worker thread and hand the
  result DataFrame to the main thread, which has not collected it yet — an
  eager drain would unpersist under an unconsumed result, and for the two
  partition-assignment-consistency operators, fn_global_row_index_scalable
  and sample_weighted_systematic, recompute after unpersist is a
  correctness hazard, not just wasted work). Instead the release ADOPTS
  them: they are retagged to the calling thread and drain at that thread's
  NEXT release — one full operator cycle later, by which time the
  sequential-consume contract says the handed-over result was collected.
  The leak stays bounded (every dead entry drains within two releases).

Strict mode (VERDICT r8 item 7) — ``SPARK_GRAFT_OPCACHE_STRICT=1``:
a PIPELINING harness (one that starts operator N+1 before collecting
operator N's result) violates the sequential-consume contract silently.
With the env var set, the harness must call ``mark_consumed()`` after
collecting each operator's result; ``release_op_caches()`` then RAISES if
it is about to free an entry that was never marked consumed, so the
interleaving hazard fails loudly instead of recomputing wrong partitions.
Sequential harnesses (driver, bench, pytest) leave the flag unset.
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class _Entry:
    owner: threading.Thread
    df: DataFrame
    consumed: bool = False  # only meaningful under strict mode


_LIVE: list[_Entry] = []
_LOCK = threading.Lock()

_STRICT_ENV = "SPARK_GRAFT_OPCACHE_STRICT"


def _strict() -> bool:
    return os.environ.get(_STRICT_ENV, "") not in ("", "0")


def op_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK default) and track it for release
    when the next operator starts on this thread (or, if this thread exits
    first, one release cycle after another thread adopts the entry). Use as
    ``.transform(op_cache)``."""
    out = df.persist()
    with _LOCK:
        _LIVE.append(_Entry(threading.current_thread(), out))
    return out


def mark_consumed() -> None:
    """Record that the calling thread has collected every result whose
    tracked caches it owns (including adopted dead-thread entries). Only
    required under ``SPARK_GRAFT_OPCACHE_STRICT=1`` pipelining harnesses;
    sequential harnesses never need to call this."""
    me = threading.current_thread()
    with _LOCK:
        for e in _LIVE:
            if e.owner is me:
                e.consumed = True


def release_op_caches(abandoned: bool = False) -> None:
    """Unpersist every cache tracked by previous operator invocations on the
    CALLING thread; ADOPT (retag to the caller, drain at the caller's next
    release) entries whose creating thread has exited. A live other thread's
    intermediates are never touched. Under strict mode, raises if an entry
    about to be freed was never ``mark_consumed()`` — unless ``abandoned``
    is set: a RAISING operator's caches back a result nobody can consume
    (catalog.invoke's error path), so freeing them unconsumed is correct
    cleanup, not a pipelining hazard, and strict-raising there would mask
    the operator's real exception. Safe against stopped sessions
    (best-effort)."""
    me = threading.current_thread()
    with _LOCK:
        mine = [e for e in _LIVE if e.owner is me]
        if _strict() and not abandoned:
            stale = [e for e in mine if not e.consumed]
            if stale:
                raise RuntimeError(
                    f"opcache strict mode ({_STRICT_ENV}): releasing "
                    f"{len(stale)} tracked cache(s) on thread {me.name!r} "
                    "that were never mark_consumed() — a pipelining harness "
                    "is about to unpersist under an unconsumed result "
                    "(partition-assignment correctness hazard; collect the "
                    "operator's result and call opcache.mark_consumed() "
                    "before starting the next operator)"
                )
        rest: list[_Entry] = []
        for e in _LIVE:
            if e.owner is me:
                continue  # drained below
            if not e.owner.is_alive():
                e.owner = me  # adopt: drains at my NEXT release
            rest.append(e)
        _LIVE[:] = rest
    for e in mine:
        try:
            e.df.unpersist(blocking=True)
        except Exception:
            pass


def live_cache_count() -> int:
    """Diagnostic: tracked-but-unreleased caches attributed to the calling
    thread — its own entries plus dead-thread entries it would adopt at the
    next release (tests assert 0 after a raising operator)."""
    me = threading.current_thread()
    with _LOCK:
        return sum(1 for e in _LIVE if e.owner is me or not e.owner.is_alive())
