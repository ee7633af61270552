"""Build a NaN/Inf corpus tier at /tmp/spark_graft_nan (round 9).

The extremes tier (round 8) deliberately excluded NaN and +/-Inf; this tier
injects them where production AI pipelines actually grow them — METRIC
streams and EMBEDDING vectors — and nowhere else:

- events.value: ~1% NaN, ~0.5% +Inf, ~0.5% -Inf (a metrics pipeline's
  divide-by-zero rates, overflowed counters, corrupt agent payloads).
- embeddings.embedding: ~1% of vectors get one NaN component, ~0.5% get one
  +Inf component (fp16 training overflow, bad normalization upstream —
  the single most common real-world embedding-corpus defect).

Money/quantity columns stay finite ON PURPOSE: Spark 4 runs ANSI mode, so
CAST(NaN AS DECIMAL) — the r8 DECIMAL(38) money spine — is a runtime error,
and a ledger schema carrying NaN prices is not a corpus any engine should
accept silently; quality_constraints/quality_profile are the defense there,
not per-operator NaN contracts.

Cross-engine semantics this tier puts on trial (SURVEY §5.4 addendum):
- Spark SQL orders NaN GREATEST and groups NaN==NaN; DuckDB sorts NaN
  greatest too but aggregate kernels differ (e.g. min/max/quantile NaN
  handling).
- sum/avg propagate NaN in both engines; Inf + -Inf = NaN in both.
- stddev/var/corr over any Inf produce NaN in both engines — but only if
  neither engine's kernel short-circuits differently.
- Arrow float32 NaN crosses to pandas as NaN (not None) on the Spark side;
  DuckDB FLOAT[] list extraction must agree.

Usage: python scripts/nan_fixture.py  (idempotent; rm -rf to rebuild)
Sweep: python scripts/driver_sim.py --sf-dir /tmp/spark_graft_nan
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_NAN_SRC", "/root/testdata/sf0.01")
OUT = os.environ.get("SPARK_GRAFT_NAN_DIR", "/tmp/spark_graft_nan")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _h(s: str) -> int:
    h = 14695981039346656037
    for b in s.encode():
        h = ((h ^ b) * 1099511628211) % (2**64)
    return h


def _mask(tag: str, n: int, rate: float) -> np.ndarray:
    rng = np.random.default_rng(_h(tag) % (2**32))
    return rng.random(n) < rate


def inject(table: str, tbl: pa.Table) -> pa.Table:
    n = tbl.num_rows
    cols = {c: tbl.column(c).combine_chunks() for c in tbl.column_names}

    if table == "events":
        vals = cols["value"].to_pylist()
        m_nan = _mask("events.value#nan", n, 0.01)
        m_pinf = _mask("events.value#pinf", n, 0.005) & ~m_nan
        m_ninf = _mask("events.value#ninf", n, 0.005) & ~m_nan & ~m_pinf
        for i in np.flatnonzero(m_nan):
            if vals[i] is not None:
                vals[i] = math.nan
        for i in np.flatnonzero(m_pinf):
            if vals[i] is not None:
                vals[i] = math.inf
        for i in np.flatnonzero(m_ninf):
            if vals[i] is not None:
                vals[i] = -math.inf
        cols["value"] = pa.array(vals, type=tbl.schema.field("value").type)
    elif table == "embeddings":
        vecs = cols["embedding"].to_pylist()
        m_nan = _mask("embeddings.vec#nan", n, 0.01)
        m_inf = _mask("embeddings.vec#inf", n, 0.005) & ~m_nan
        # NULL components (ADVICE r9): a vector like [1.0, NULL, 2.0] is the
        # exact shape where Spark's exists() 3VL and DuckDB's list_filter
        # NULL-dropping diverge — inject it so the finite_vec/VEC_FINITE_SQL
        # twins are exercised, not just whole-vector NULLs (null tier).
        m_null = _mask("embeddings.vec#nullcomp", n, 0.005) & ~m_nan & ~m_inf
        for i in np.flatnonzero(m_nan):
            v = vecs[i]
            if v:
                v[int(i) % len(v)] = math.nan
        for i in np.flatnonzero(m_inf):
            v = vecs[i]
            if v:
                v[int(i) % len(v)] = math.inf
        for i in np.flatnonzero(m_null):
            v = vecs[i]
            if v:
                v[int(i) % len(v)] = None
        cols["embedding"] = pa.array(
            vecs, type=tbl.schema.field("embedding").type
        )
    return pa.table(cols)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(dst):
            print(f"[skip] {t} (exists)")
            continue
        tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(inject(t, tbl), dst)
        print(f"[ok] {t}")


if __name__ == "__main__":
    sys.exit(main())
