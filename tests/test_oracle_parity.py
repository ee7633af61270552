"""Tier-2 oracle parity: every oracle-verified operator must hash-match its
DuckDB oracle at sf0.001 (fast loop) — the same check the driver runs at
sf0.01. Operators without oracle SQL get a rows-runnable smoke test."""

from __future__ import annotations

import pytest

from ai_dataingestion_spark.catalog import all_specs
from tests.parity import compare, duckdb_connect

SPECS = all_specs()
ORACLE_IDS = sorted(k for k, s in SPECS.items() if s.oracle)
ROWS_ONLY_IDS = sorted(k for k, s in SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb_connect(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("qid", ORACLE_IDS)
def test_oracle_parity(qid, spark, sf_small, con):
    spec = SPECS[qid]
    df = spec.fn(spark, sf_small)
    report = compare(df, con, spec.oracle)
    assert report["ok"], f"{qid}: {report}"


@pytest.mark.parametrize("qid", ROWS_ONLY_IDS)
def test_rows_only_runs(qid, spark, sf_small):
    df = SPECS[qid].fn(spark, sf_small)
    assert df.count() >= 0


def test_driver_window_rotation():
    """The driver hash-checks only the FIRST 50 entries of queries() per
    round; registration order is the coverage rotation. The window must be
    spent entirely on operators that (a) were not already driver-verified in
    a previous round and (b) carry oracle SQL (a hash row > a rows-only row).
    """
    from ai_dataingestion_spark.catalog import _DRIVER_CHECKED

    names = list(SPECS)
    assert len(names) == 172  # 128 round-1 + 44 round-2 (§2.N)
    assert len(_DRIVER_CHECKED) == 99  # r1: 50 (incl. 1 rows-only) + r2: 49
    window = names[:50]
    for n in window:
        assert n not in _DRIVER_CHECKED, f"{n} wastes a window slot (already green)"
        assert SPECS[n].oracle is not None, f"{n} rows-only in hash window"
    # rows-only unchecked operators rank after oracle-backed unchecked ones
    ranks = [
        0 if (SPECS[n].oracle and n not in _DRIVER_CHECKED)
        else (1 if n not in _DRIVER_CHECKED else 2)
        for n in names
    ]
    assert ranks == sorted(ranks)
