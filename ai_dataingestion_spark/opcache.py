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
been collected (the driver, bench, and tests all consume sequentially).

Contract: an operator's returned DataFrame must be consumed before the next
operator is invoked on the same session (all harness loops do); releasing
merely triggers recomputation otherwise, except for operators whose
correctness depends on cache-backed partition-assignment consistency
(fn_global_row_index_scalable, sample_weighted_systematic) — which is
exactly why release happens at next-operator start and never mid-build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def op_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK default) and track it for release
    when the next operator starts. Use as ``.transform(op_cache)``."""
    out = df.persist()
    _LIVE.append(out)
    return out


def release_op_caches() -> None:
    """Unpersist every tracked cache from previous operator invocations.
    Safe against stopped sessions (best-effort)."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=True)
        except Exception:
            pass
