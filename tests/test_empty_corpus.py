"""Robustness sweep: every registered operator must run (not crash) on an
EMPTY corpus — zero-row tables with the production schemas. At 100 TB,
empty inputs are routine (a partition-pruned read, a filter matching
nothing, a quiet ingestion window); an operator that throws on zero rows is
a real bug, not an edge case."""

from __future__ import annotations

import os

import pytest

from ai_dataingestion_spark.catalog import all_specs
from ai_dataingestion_spark.registry import SCHEMAS, TABLE_NAMES

SPECS = all_specs()


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """A corpus directory whose 10 tables all exist with 0 rows, in the
    current on-disk form (events.ts as timestamp[us] NTZ, as the
    regenerated corpus stores it)."""
    root = tmp_path_factory.mktemp("sf_empty")
    for name in TABLE_NAMES:
        df = spark.createDataFrame([], SCHEMAS[name])
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(str(root), f"{name}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("qid", sorted(SPECS))
def test_runs_on_empty_corpus(spark, empty_sf, qid):
    # bounded retry on the Python-worker connect-back timeout ONLY (the
    # r16 environment-flake class; see tests/parity.py)
    from tests.parity import run_with_spawn_retry

    n = run_with_spawn_retry(lambda: SPECS[qid].fn(spark, empty_sf).count())
    assert n >= 0


def test_tz_aware_events_rejected(spark, tmp_path):
    """A regenerated corpus writing events.ts as tz-aware (isAdjustedToUTC)
    must FAIL LOUDLY at the sniffer, not silently reinterpret instants as
    wall-clock NTZ values — the silent-wrong-answer class the footer sniff
    exists to prevent."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from ai_dataingestion_spark.registry import _sniff_events_ts_unit

    path = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("2024-01-01", tz="UTC")],
                type=pa.timestamp("us", tz="UTC"),
            ),
        }
    )
    pq.write_table(table, path)
    with _pytest.raises(TypeError, match="tz-naive"):
        _sniff_events_ts_unit(path)
