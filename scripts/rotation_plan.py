"""Compute (never narrate) the driver-window rotation plan.

Usage: python scripts/rotation_plan.py

The driver hash-checks only the FIRST 50 entries of queries() per round, so
registration order is the coverage rotation knob (catalog._rotation_rank).
catalog.py's prose comments drifted twice (ADVICE-r7 item 4, VERDICT-r8
"What's wrong" 1) when these numbers were hand-maintained; this script is the
single source of truth. It derives the plan from the live registry plus the
CORRECTNESS_r*.json evidence files and prints:

  - total registered operators and evidence attested so far,
  - the pending backlog (IDs with no driver row yet), split by rotation rank,
  - the exact 50-ID window the driver will sweep next round,
  - how many further windows the remaining tail needs,
  - any DISAGREEMENT between _DRIVER_CHECKED and the CORRECTNESS files
    (an ID green in a file but not folded, or folded without a green row).

Exit code 0 iff bookkeeping is consistent (no disagreement lines).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def correctness_greens() -> dict[str, str]:
    """ID -> latest round file that attested it (rows+schema match, no err).

    Hash-green and rows-only-by-design rows both count: a rows-only driver
    row IS the driver's evidence for oracle-less operators (hash_match is
    null there, never false).
    """
    greens: dict[str, str] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for qid, row in rows.items():
            hash_green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and row.get("err") is None
            )
            # rows-only-by-design driver row: no oracle, but the driver ran
            # the Spark query and recorded a non-null row count.
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and row.get("spark_rows") >= 0
            )
            if hash_green or rows_only:
                greens[qid] = path.name
    return greens


def main() -> int:
    from ai_dataingestion_spark.catalog import (
        _DRIVER_CHECKED,
        _rotation_rank,
        all_specs,
    )

    specs = all_specs()
    names = list(specs)
    greens = correctness_greens()
    # Pending = no green file evidence (VERDICT-r9 item 4) — NOT "not yet
    # folded into _DRIVER_CHECKED"; folding lag is reported separately by
    # the consistency audit below.
    pending = [n for n in names if n not in greens]
    window = names[:50]
    windows_left = -(-len(pending) // 50)  # ceil

    print(f"registered operators : {len(names)}")
    print(f"attested green (files): {len(set(greens) & set(names))}")
    print(f"_DRIVER_CHECKED size : {len(_DRIVER_CHECKED)}")
    print(f"pending backlog      : {len(pending)}  (~{windows_left} window(s) at 50/round)")
    by_rank: dict[int, int] = {}
    for n in pending:
        by_rank[_rotation_rank(specs[n])] = by_rank.get(_rotation_rank(specs[n]), 0) + 1
    print(f"pending by rank      : {dict(sorted(by_rank.items()))}")
    print("\nnext driver window (first 50 of queries()):")
    for i, n in enumerate(window):
        # "pending" means NO green file evidence exists (VERDICT-r9 item 4):
        # an ID whose green row landed but isn't folded into _DRIVER_CHECKED
        # yet is labeled distinctly so the plan never contradicts evidence.
        if n in greens:
            tag = "re-sweep(green)" if _rotation_rank(specs[n]) >= 4 else "green-unfolded"
        else:
            tag = "pending"
        print(f"  {i + 1:2d}. {n}  [{tag}]")
    if len(pending) > 50:
        print(f"\ntail after this window ({len(pending) - 50} IDs):")
        for n in pending[50:] if pending[:50] == window else [p for p in pending if p not in window]:
            print(f"  - {n}")

    # Consistency audit: the two evidence ledgers must agree.
    problems = []
    for qid, src in sorted(greens.items()):
        if qid in specs and qid not in _DRIVER_CHECKED:
            problems.append(f"UNFOLDED: {qid} green in {src} but not in _DRIVER_CHECKED")
    for qid in sorted(_DRIVER_CHECKED):
        if qid not in greens:
            problems.append(f"UNATTESTED: {qid} in _DRIVER_CHECKED but no green CORRECTNESS row")
        if qid not in specs:
            problems.append(f"UNREGISTERED: {qid} in _DRIVER_CHECKED but not in the registry")
    if problems:
        print("\nBOOKKEEPING DISAGREEMENTS:")
        for p in problems:
            print(f"  {p}")
        return 1
    print("\nbookkeeping consistent: _DRIVER_CHECKED == CORRECTNESS greens")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
