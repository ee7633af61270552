"""Pin bench.py's emission contract (VERDICT-r9 item 2).

The driver records only the LAST 2,000 chars of bench stdout. Round 9's
single JSON line grew to 2,782 chars, so the line's head (metric, value,
the first ~27 per-query times) was sliced off and BENCH_r09.json stored
"parsed": null. These tests pin:

1. the final summary line stays under bench.SUMMARY_LINE_CAP even with
   pessimistically wide values for every headline query;
2. the field-shedding fallback activates rather than emitting oversize;
3. _prior_round_comparison recovers per-query times from a prior round
   whose "parsed" is null by regex-extracting the truncated "tail" string
   (exercised against the real BENCH_r09.json committed in this repo).
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _wide_inputs(bench):
    """Worst-realistic-width inputs: every query at a 7-char time, full
    loadavg, populated vs_prior/recall/lsh blocks."""
    results = {q: 12.3456 for q in bench.HEADLINE}
    spreads = {q: 2.656 for q in bench.HEADLINE}
    vs_prior = {
        "prior_file": "BENCH_r09.json",
        "common_n": len(bench.HEADLINE),
        "common_sum_now": 123.4567,
        "common_sum_prior": 123.4567,
    }
    recall = {"sim_ann_lsh": 0.98, "sim_ann_ivf": 1.0}
    lsh_stats = {"pairs_per_probe": 123.4, "corpus_fraction": 0.1034}
    lsh_clustered = {
        "recall": 1.0,
        "corpus_fraction": 0.103,
        "pairs_per_probe": 61.9,
    }
    return results, spreads, [12.34, 10.11, 9.87], vs_prior, recall, \
        lsh_stats, lsh_clustered


def test_summary_line_fits_driver_capture(bench):
    args = _wide_inputs(bench)
    line = bench._summary_line(*args, sf="0.1")
    assert len(line) <= bench.SUMMARY_LINE_CAP
    doc = json.loads(line)
    # the driver-contract fields must survive any shedding
    assert doc["metric"] == "suite_warm_seconds"
    assert doc["unit"] == "sec"
    assert set(doc["queries"]) == set(bench.HEADLINE)
    assert doc["sf"] == 0.1
    assert "vs_prior_round" in doc and doc["vs_prior_round"]["common_n"]


def test_summary_line_sheds_fields_when_oversize(bench, monkeypatch):
    # Shrink the cap so shedding must activate; contract fields survive.
    results, spreads, load, vs_prior, recall, lsh, lshc = _wide_inputs(bench)
    monkeypatch.setattr(bench, "SUMMARY_LINE_CAP", 1700)
    line = bench._summary_line(
        results, spreads, load, vs_prior, recall, lsh, lshc, sf="0.1"
    )
    doc = json.loads(line)
    assert len(line) <= 1700
    assert set(doc["queries"]) == set(bench.HEADLINE)
    assert "loadavg_before" not in doc  # first field shed


@pytest.fixture
def bench_in_dir(bench, monkeypatch, tmp_path):
    """Point _prior_round_comparison's BENCH_r*.json glob at a controlled
    directory (the function globs next to the module's __file__), so the
    recovery path is exercised against a FROZEN fixture unconditionally —
    the original test self-skipped forever once BENCH_r10 landed
    (VERDICT-r10 item 6)."""

    def stage(*files: tuple[str, object]) -> None:
        for name, doc in files:
            (tmp_path / name).write_text(json.dumps(doc))
        monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))

    return stage


def test_prior_round_fallback_parses_truncated_tail(bench, bench_in_dir):
    """The frozen r9 artifact has parsed: null; the fallback must recover
    the per-query seconds that survive in its truncated tail — and must
    NOT leak run_spread_maxmin ratios into the comparison."""
    r9 = json.load(
        open(os.path.join(REPO, "tests", "fixtures", "BENCH_r09_truncated.json"))
    )
    assert r9.get("parsed") is None, "fixture drifted: r9 parsed non-null"
    bench_in_dir(("BENCH_r09.json", r9))
    results = {q: 1.0 for q in bench.HEADLINE}
    out = bench._prior_round_comparison(results)
    assert out["prior_file"] == "BENCH_r09.json"
    # r9's tail holds the last ~11 query entries before run_spread_maxmin
    assert out["common_n"] >= 5
    # spread ratios for these queries are ~1-3; recovered times must be the
    # seconds actually present in the tail (spot-check one known value)
    tail = r9["tail"]
    assert '"graph_copurchase_triangles": 0.7853' in tail
    assert out["common_sum_prior"] > 0
    # ratio-leak guard: every recovered prior time must equal the seconds
    # value printed in the tail's queries region, not a spread ratio
    import re as _re

    cut = tail[: tail.find('"run_spread_maxmin"')]
    seconds = dict(
        (m.group(1), float(m.group(2)))
        for m in _re.finditer(r'"([a-z][a-z0-9_]+)":\s*([0-9]+\.[0-9]+)', cut)
    )
    assert out["common_sum_prior"] == round(
        sum(v for q, v in seconds.items() if q in results), 4
    )


def test_prior_round_recovery_refuses_unrecognized_truncation(
    bench, bench_in_dir
):
    """ADVICE r10 #3: a parsed-null artifact whose tail capture starts PAST
    run_spread_maxmin would previously fall through to the 'loadavg_before'
    stop key and parse spread RATIOS as prior-query SECONDS. Without the
    recovery marker the comparison must be skipped entirely ({})."""
    poisoned = {
        "parsed": None,
        "tail": (
            '"graph_pagerank_trade": 1.61, "text_bpe_pair_merge": 2.66}, '
            '"loadavg_before": [1.0, 2.0, 3.0], "recall_at_5": '
            '{"sim_ann_lsh": 0.98}}'
        ),
    }
    bench_in_dir(("BENCH_r09.json", poisoned))
    results = {"graph_pagerank_trade": 1.0, "text_bpe_pair_merge": 1.0}
    assert bench._prior_round_comparison(results) == {}


def test_summary_line_truncates_queries_as_last_resort(bench, monkeypatch):
    """ADVICE r10 #4: when field shedding can't fit the cap, the cheapest
    per-query times are shed one by one with an explicit marker — a
    completed suite is never discarded, and the heavies survive."""
    results, spreads, load, vs_prior, recall, lsh, lshc = _wide_inputs(bench)
    results = dict(results)
    heavy = sorted(results)[0]
    results[heavy] = 99.999  # make one query unambiguously heaviest
    monkeypatch.setattr(bench, "SUMMARY_LINE_CAP", 700)
    line = bench._summary_line(
        results, spreads, load, vs_prior, recall, lsh, lshc, sf="0.1"
    )
    assert len(line) <= 700
    doc = json.loads(line)
    assert doc["queries_truncated"] >= 1
    assert doc["queries_truncated"] == len(results) - len(doc["queries"])
    assert heavy in doc["queries"]  # cheapest shed first, heavies kept
    assert doc["value"] == round(sum(results.values()), 4)  # total intact


def test_summary_line_raises_not_asserts_when_unsheddable(bench, monkeypatch):
    """ADVICE r10 #4: the cap must be enforced with a real exception —
    assert vanishes under python -O, silently re-creating the r9 bug."""
    args = _wide_inputs(bench)
    monkeypatch.setattr(bench, "SUMMARY_LINE_CAP", 50)
    with pytest.raises(RuntimeError, match="outgrew|split the emission"):
        bench._summary_line(*args, sf="0.1")


def test_quiet_box_preflight_waits_bounded_and_marks_contended(bench, monkeypatch):
    """VERDICT r11 item 6: a busy box delays the timed pass (bounded) and —
    if still busy — the draw is marked contended rather than blocked."""
    sleeps: list[float] = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    # stays contended the whole window: preflight exhausts the budget,
    # marks contended, never blocks beyond PREFLIGHT_MAX_WAIT_S
    monkeypatch.setattr(bench, "_loadavg", lambda: [9.9, 9.0, 8.0])
    marker = bench._quiet_box_preflight()
    assert marker["contended"] is True
    assert marker["preflight_wait_s"] >= bench.PREFLIGHT_MAX_WAIT_S
    assert sum(sleeps) <= bench.PREFLIGHT_MAX_WAIT_S + bench.PREFLIGHT_POLL_S

    # quiet box: zero wait, no marker noise
    sleeps.clear()
    monkeypatch.setattr(bench, "_loadavg", lambda: [0.3, 0.2, 0.2])
    marker = bench._quiet_box_preflight()
    assert marker == {
        "loadavg_start": [0.3, 0.2, 0.2],
        "preflight_wait_s": 0.0,
        "contended": False,
    }
    assert sleeps == []

    # load drops mid-wait: waits only as long as needed
    seq = iter([[5.0, 4.0, 3.0], [1.0, 2.0, 2.0]])
    monkeypatch.setattr(bench, "_loadavg", lambda: next(seq))
    marker = bench._quiet_box_preflight()
    assert marker["contended"] is False
    assert marker["preflight_wait_s"] == bench.PREFLIGHT_POLL_S


def test_summary_line_carries_contended_marker(bench):
    """The contended flag must survive into the capped summary line (it is
    the machine-readable discount signal for the cross-round comparison),
    and a quiet draw must not spend chars on it."""
    args = _wide_inputs(bench)
    busy = {"loadavg_start": [5.0, 4.0, 3.0], "preflight_wait_s": 150.0,
            "contended": True}
    doc = json.loads(bench._summary_line(*args, sf="0.1", preflight=busy))
    assert doc["contended"] is True
    assert doc["preflight_wait_s"] == 150.0
    quiet = {"loadavg_start": [0.2, 0.2, 0.1], "preflight_wait_s": 0.0,
             "contended": False}
    doc = json.loads(bench._summary_line(*args, sf="0.1", preflight=quiet))
    assert "contended" not in doc


def test_summary_line_carries_canary_and_degraded(bench):
    """VERDICT-r13 item 2: cpu_canary_s must ride the SUMMARY line (the r13
    driver capture truncated it off the detail line, losing the round's
    drift-adjudication instrument), and a loadavg in the
    (DEGRADED_LOAD, CONTENTION_LOAD] band — below the preflight gate but
    enough to smear sub-second queries — must self-identify as degraded."""
    results, spreads, _, vs_prior, recall, lsh_stats, lsh_clustered = \
        _wide_inputs(bench)
    # quiet box: canary present, no degraded marker
    doc = json.loads(bench._summary_line(
        results, spreads, [0.3, 0.2, 0.2], vs_prior, recall,
        lsh_stats, lsh_clustered, sf="0.1", canary_s=0.4109))
    assert doc["cpu_canary_s"] == 0.4109
    assert "degraded" not in doc
    # the 1-2 loadavg band: degraded, but not contended
    doc = json.loads(bench._summary_line(
        results, spreads, [1.85, 1.2, 0.9], vs_prior, recall,
        lsh_stats, lsh_clustered, sf="0.1",
        preflight={"loadavg_start": [1.85, 1.2, 0.9],
                   "preflight_wait_s": 0.0, "contended": False},
        canary_s=0.47))
    assert doc["degraded"] is True
    assert "contended" not in doc
    assert doc["cpu_canary_s"] == 0.47
    # no canary passed (defensive): field absent, line still valid
    doc = json.loads(bench._summary_line(
        results, spreads, [0.3, 0.2, 0.2], vs_prior, recall,
        lsh_stats, lsh_clustered, sf="0.1"))
    assert "cpu_canary_s" not in doc


def test_bench_query_lists_exist_in_registry(bench):
    """bench.py SKIPS additive ids not in queries() (defensive for partial
    registries), which means a typo in NEW_BLOCKS would silently drop an
    op from the additive capture forever. Pin: every HEADLINE and
    NEW_BLOCKS id is a registered operator."""
    from ai_dataingestion_spark.catalog import all_specs

    names = set(all_specs())
    missing = [q for q in bench.HEADLINE if q not in names]
    assert not missing, f"HEADLINE ids not registered: {missing}"
    missing = [q for q in bench.NEW_BLOCKS if q not in names]
    assert not missing, f"NEW_BLOCKS ids not registered: {missing}"
