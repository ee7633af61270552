"""Driver-heap sizing contract (ADVICE r7 + ADVICE r8).

_default_driver_mem must bound the 24g bench heap by ~60% of the RAM the
process can actually use: min(host sysconf RAM, cgroup container limit).
Pure unit tests — no SparkSession.
"""

from __future__ import annotations

import pytest

from ai_dataingestion_spark import session as sess


def _patch_host_gb(monkeypatch, gb: float):
    page = 4096
    pages = int(gb * (1024**3) / page)

    def fake_sysconf(name):
        return {"SC_PAGE_SIZE": page, "SC_PHYS_PAGES": pages}[name]

    monkeypatch.setattr(sess.os, "sysconf", fake_sysconf)


@pytest.mark.parametrize(
    ("host_gb", "cg_gb", "expect"),
    [
        (128.0, None, "24g"),  # big quiet box: full bench heap
        (32.0, None, "19g"),  # 60% bound trims mid-size hosts
        (8.0, None, "4g"),  # small host: never exceed physical
        (2.0, None, "2g"),  # broadcast-build floor
        # ADVICE r8: 64 GB host, 8 GB container — sysconf alone would say
        # 24g and swap/OOM; the cgroup limit must win.
        (64.0, 8.0, "4g"),
        (64.0, 48.0, "24g"),  # roomy container: cap still applies
        (16.0, 64.0, "9g"),  # limit above host RAM: host figure wins
    ],
)
def test_default_driver_mem_bounds(monkeypatch, host_gb, cg_gb, expect):
    _patch_host_gb(monkeypatch, host_gb)
    monkeypatch.setattr(sess, "_cgroup_mem_limit_gb", lambda: cg_gb)
    assert sess._default_driver_mem() == expect


def test_cgroup_parser(tmp_path):
    """'max' and the >=2^60 no-limit sentinel mean unlimited; a real byte
    count converts to GiB; a missing or garbled file falls through to the
    next path / None."""
    v2 = tmp_path / "memory.max"
    v1 = tmp_path / "memory.limit_in_bytes"
    probe = sess._cgroup_mem_limit_gb

    v2.write_text("max\n")
    assert probe((str(v2),)) is None
    v2.write_text(str(8 * 1024**3))
    assert probe((str(v2),)) == 8.0
    v2.write_text(str(2**63 - 4096))  # v1 unlimited sentinel value
    assert probe((str(v2),)) is None
    assert probe((str(tmp_path / "missing"),)) is None
    # garbled v2 falls through to a valid v1
    v2.write_text("not-a-number\n")
    v1.write_text(str(4 * 1024**3))
    assert probe((str(v2), str(v1))) == 4.0
    # and the real function never raises on this host, whatever its cgroups
    got = probe()
    assert got is None or got > 0
