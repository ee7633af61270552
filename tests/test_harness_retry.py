"""The test-harness worker-spawn retry (VERDICT-r16 item 3): bounded retry
ONLY on the Python-worker connect-back timeout class; everything else —
wrong results, genuine operator errors — must raise immediately. This is a
harness-layer guard; no product query path imports it."""

from __future__ import annotations

import pytest

from tests.parity import _is_worker_spawn_flake, run_with_spawn_retry

_SPAWN_MSG = "Timed out while waiting for the Python worker to connect back"


def test_detector_matches_both_factory_messages():
    assert _is_worker_spawn_flake(RuntimeError(_SPAWN_MSG))
    assert _is_worker_spawn_flake(
        RuntimeError("Python worker failed to connect back.")
    )
    assert not _is_worker_spawn_flake(RuntimeError("hash mismatch"))


def test_detector_walks_cause_chain():
    inner = RuntimeError(f"java.net.SocketTimeoutException: {_SPAWN_MSG}")
    outer = RuntimeError("StreamingQueryException: query terminated")
    outer.__cause__ = inner
    assert _is_worker_spawn_flake(outer)
    # cycle-safe: a self-referential context must not loop forever
    loopy = RuntimeError("boring")
    loopy.__context__ = loopy
    assert not _is_worker_spawn_flake(loopy)


def test_retry_retries_flake_then_succeeds(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda _s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(_SPAWN_MSG)
        return "ok"

    assert run_with_spawn_retry(flaky, retries=2) == "ok"
    assert calls["n"] == 3


def test_retry_is_bounded(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda _s: None)

    def always_flaky():
        raise RuntimeError(_SPAWN_MSG)

    with pytest.raises(RuntimeError, match="connect back"):
        run_with_spawn_retry(always_flaky, retries=2)


def test_retry_never_masks_real_failures():
    calls = {"n": 0}

    def real_bug():
        calls["n"] += 1
        raise AssertionError("rows mismatch")

    with pytest.raises(AssertionError, match="rows mismatch"):
        run_with_spawn_retry(real_bug, retries=5)
    assert calls["n"] == 1
