"""opcache contract tests (ADVICE r7 medium + VERDICT r7 item 7):

- a RAISING operator must not leak its tracked caches until the next
  invocation — the catalog wrapper releases them on the except path;
- release is thread-keyed: one thread's release_op_caches() never touches
  another thread's live intermediates (the threaded-bench interleave that
  would otherwise silently unpersist mid-build).
"""

from __future__ import annotations

import threading

import pytest

from ai_dataingestion_spark import opcache
from ai_dataingestion_spark.catalog import QuerySpec, _REGISTRY, register


@pytest.fixture(autouse=True)
def _drained():
    """Make the absolute live_cache_count asserts order-independent: an
    earlier test file's LAST op_cache-using operator leaves its entries
    tracked on this thread (release happens at the NEXT invocation), so a
    test that asserts == 0/== 1 would otherwise depend on which operator
    some other file happened to invoke last (review r8). Released TWICE:
    the first call adopts any dead-thread leftovers (lazy-drain contract),
    the second drains the adopted ones."""
    opcache.release_op_caches()
    opcache.release_op_caches()
    yield


@pytest.fixture
def _clean_registry():
    """Register throwaway operators under reserved test ids; always remove."""
    added: list[str] = []
    yield added
    for name in added:
        _REGISTRY.pop(name, None)


def test_raising_operator_releases_caches(spark, sf_small, _clean_registry):
    name = "_test_opcache_raiser"
    _clean_registry.append(name)

    @register(name)
    def _raiser(s, sf_dir):
        df = s.range(10).transform(opcache.op_cache)
        df.count()  # materialize so the persist is real, not just planned
        raise RuntimeError("operator failed after persisting")

    assert opcache.live_cache_count() == 0
    spec: QuerySpec = _REGISTRY[name]
    with pytest.raises(RuntimeError, match="after persisting"):
        spec.fn(spark, sf_small)
    # the except path must have released the orphaned cache immediately
    assert opcache.live_cache_count() == 0


def test_successful_operator_caches_release_at_next_call(
    spark, sf_small, _clean_registry
):
    a, b = "_test_opcache_a", "_test_opcache_b"
    _clean_registry.extend([a, b])

    @register(a)
    def _op_a(s, sf_dir):
        return s.range(5).transform(opcache.op_cache)

    @register(b)
    def _op_b(s, sf_dir):
        return s.range(3)

    df = _REGISTRY[a].fn(spark, sf_small)
    assert df.count() == 5
    assert opcache.live_cache_count() == 1  # alive until the result is consumed
    _REGISTRY[b].fn(spark, sf_small).count()
    assert opcache.live_cache_count() == 0  # released at next operator start


def test_dead_thread_caches_adopted_then_drained(spark):
    """A thread-per-operator harness must not leak, but the drain must be
    LAZY (ADVICE r8 medium): a pool worker's result DataFrame may be handed
    to the main thread unconsumed, so the first release that sees the dead
    entry ADOPTS it (retag, cache stays live) and the adopter's NEXT release
    drains it — one full operator cycle of grace. Thread objects, not
    idents, are the tag, so ident reuse cannot misattribute entries."""
    handoff: list = []

    def worker():
        df = spark.range(50).transform(opcache.op_cache)
        df.count()
        handoff.append(df)

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert opcache.live_cache_count() == 1  # dead-thread entry, adoptable
    opcache.release_op_caches()  # first release: adopt, do NOT unpersist
    assert opcache.live_cache_count() == 1
    # the ADVICE hazard: the handed-over result must still be served from
    # the live cache (no recompute under the consumer's feet)
    assert handoff[0].storageLevel.useMemory, "adopted cache was unpersisted"
    assert handoff[0].count() == 50
    opcache.release_op_caches()  # second release: the adopter drains it
    assert opcache.live_cache_count() == 0
    assert not handoff[0].storageLevel.useMemory


def test_strict_mode_raises_on_unconsumed_release(spark, monkeypatch):
    """VERDICT r8 item 7: under SPARK_GRAFT_OPCACHE_STRICT=1 a release that
    would free never-mark_consumed() caches fails loudly (the pipelining-
    harness interleave hazard); after mark_consumed() the same release
    drains cleanly."""
    df = spark.range(20).transform(opcache.op_cache)
    df.count()
    monkeypatch.setenv("SPARK_GRAFT_OPCACHE_STRICT", "1")
    with pytest.raises(RuntimeError, match="strict mode"):
        opcache.release_op_caches()
    assert opcache.live_cache_count() == 1  # nothing freed on the raise
    opcache.mark_consumed()
    opcache.release_op_caches()
    assert opcache.live_cache_count() == 0


def test_strict_mode_abandoned_release_bypasses_check(spark, monkeypatch):
    """Round 10 (VERDICT-r9 item 8): catalog.invoke's error path frees a
    RAISING operator's caches with abandoned=True — freeing unconsumed
    caches there is correct cleanup, and a strict-mode raise would mask
    the operator's real exception."""
    df = spark.range(20).transform(opcache.op_cache)
    df.count()
    monkeypatch.setenv("SPARK_GRAFT_OPCACHE_STRICT", "1")
    opcache.release_op_caches(abandoned=True)  # must NOT raise
    assert opcache.live_cache_count() == 0


def test_release_is_thread_local(spark):
    """Another thread calling release_op_caches() must NOT unpersist this
    thread's tracked caches."""
    df = spark.range(100).transform(opcache.op_cache)
    df.count()
    assert opcache.live_cache_count() == 1
    try:
        t = threading.Thread(target=opcache.release_op_caches)
        t.start()
        t.join()
        assert opcache.live_cache_count() == 1, "cross-thread release happened"
        assert df.storageLevel.useMemory, "cache was unpersisted cross-thread"
    finally:
        opcache.release_op_caches()
    assert opcache.live_cache_count() == 0
