"""Local replica of the driver's oracle comparison (SURVEY.md §5.2 tier 2).

Runs a registered QuerySpec on Spark and its oracle SQL on DuckDB over the
same parquet directory, then compares row count, column names, and the
order-insensitive multiset of values — strictly (exact equality), because the
driver hashes values rather than applying tolerances.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import numpy as np
import pandas as pd

from ai_dataingestion_spark.registry import SCHEMAS, TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        # directory-layout tables (layout/drift tiers, Spark-written dirs)
        # need the part-file glob AND the schema-evolution read posture,
        # exactly as scripts/driver_sim.py does: union_by_name absorbs
        # per-file drift; projecting the declared columns mirrors the
        # engine's declared-schema pruning of drift-added columns
        if os.path.isdir(path):
            cols = ", ".join(f.name for f in SCHEMAS[name].fields)
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT {cols} "
                f"FROM read_parquet('{path}/*.parquet', union_by_name=true)"
            )
        else:
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison.

    Type-strict on the int-vs-float axis: the driver's value hash is
    type-sensitive, so ``1234`` (Spark int64) vs ``1234.0`` (DuckDB HUGEINT
    materialized as float64) must FAIL here the way it fails there — Python's
    ``1234 == 1234.0`` being True is exactly how the round-2
    ``text_lang_stats`` oracle bug slipped past this harness (VERDICT r2 §2).
    Floats are tagged ``("f", value)`` so they never compare equal to ints.
    """
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime):
        return v
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    out = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in out.itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


def _is_worker_spawn_flake(exc: BaseException) -> bool:
    """True for the Python-worker startup timeout class (VERDICT-r16 item 3,
    an environment flake, not a logic failure): the JVM's
    PythonWorkerFactory gives a spawned worker a fixed (non-configurable)
    10 s to connect back, and under host stalls or contended boxes the
    handshake can miss it — observed twice in r16 on
    source_python_datasource_stream, green on re-run both times. Matched on
    the two messages the factory raises; wrong results or genuine operator
    errors never produce them. Walks the cause/context chain because the
    timeout surfaces wrapped (StreamingQueryException / Py4JJavaError)."""
    seen: set[int] = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        text = str(e)
        if (
            "Timed out while waiting for the Python worker to connect back"
            in text
            or "Python worker failed to connect back" in text
        ):
            return True
        e = e.__cause__ or e.__context__
    return False


def run_with_spawn_retry(fn, retries: int = 2):
    """Run ``fn()``; retry (bounded, with a short backoff) ONLY when it dies
    on the worker-spawn timeout flake class above. Test-harness layer only —
    product query paths stay retry-free so real failures surface."""
    import time

    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:
            if attempt >= retries or not _is_worker_spawn_flake(e):
                raise
            time.sleep(2.0 * (attempt + 1))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a comparison report; report['ok'] is the overall verdict."""
    sp = spark_df.toPandas()
    dd = con.execute(sql).fetchdf()
    sp_cols, sp_rows = _canon(sp)
    dd_cols, dd_rows = _canon(dd)
    report = {
        "ok": False,
        "spark_rows": len(sp_rows),
        "oracle_rows": len(dd_rows),
        "cols_match": sp_cols == dd_cols,
        "spark_cols": sp_cols,
        "oracle_cols": dd_cols,
        "mismatch": None,
    }
    if not report["cols_match"] or len(sp_rows) != len(dd_rows):
        return report
    for i, (a, b) in enumerate(zip(sp_rows, dd_rows)):
        if a != b:
            report["mismatch"] = {"row": i, "spark": a, "oracle": b}
            return report
    report["ok"] = True
    return report
