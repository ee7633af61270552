"""DST/timezone-boundary tier parity tests (round 11, VERDICT-r10 item 7).

Every other tier keeps event times in fixed-offset territory, so the
daylight-saving transition code paths — Java zone rules on the engine side,
ICU on the oracle side — were never load-bearing. This module rebuilds a
small DST-adversarial corpus from sf0.001 (same deterministic re-timing as
scripts/dst_fixture.py: events swept minute-by-minute across the four 2024
NY/Berlin transitions) and:

1. re-runs oracle parity for the time-bearing operator families, with
   fn_timezone_convert — the one UTC->local conversion site — as the
   centerpiece;
2. pins the MEASURED dialect divergence on local->UTC conversions:
   * ambiguous fall-back local times resolve to the EARLIER instant in
     Spark (`to_utc_timestamp` keeps the pre-transition DST offset) and
     the LATER instant in DuckDB (`AT TIME ZONE` keeps standard time) —
     any future local->UTC operator must gate or normalize the ambiguous
     hour, exactly like the levenshtein byte/UTF-16 contract;
   * nonexistent spring-forward local times shift forward IDENTICALLY on
     both engines (no gate needed);
   * UTC->local agrees on every probed transition instant (which is why
     fn_timezone_convert needs no gate).
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from ai_dataingestion_spark.catalog import all_specs
from tests.parity import compare, duckdb_connect

_SPEC = importlib.util.spec_from_file_location(
    "dst_fixture",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "dst_fixture.py"),
)
_dst = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_dst)

SPECS = all_specs()

# the time-bearing surface: the conversion op + every family whose
# semantics read the clock (windows, sessions, watermarks, timers,
# calendars, intervals, circular-time stats)
DST_TIER_IDS = [
    "fn_timezone_convert",
    "fn_timestamp", "fn_date", "fn_interval_arith", "fn_iso_week_parity",
    "fn_business_days_diff", "fn_multiformat_timestamp_parse",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_watermark_late", "stream_tws_event_timer",
    "events_hourly_matrix", "events_circular_time_stats",
    "events_timeseries_rollup", "win_range_interval_frame",
]


@pytest.fixture(scope="module")
def dst_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("dst_sf0001"))
    src = "/root/testdata/sf0.001"
    for t in _dst.TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(_dst.inject(t, tbl), os.path.join(out, f"{t}.parquet"))
    return out


@pytest.fixture(scope="module")
def dst_con(dst_dir):
    c = duckdb_connect(dst_dir)
    yield c
    c.close()


def test_fixture_actually_crosses_transitions(dst_dir):
    import datetime as dt

    import pyarrow.parquet as pq

    ts = [
        t for t in pq.read_table(os.path.join(dst_dir, "events.parquet"))
        .column("ts").to_pylist() if t is not None
    ]
    for base in _dst.WINDOWS:
        lo, hi = base, base + dt.timedelta(minutes=_dst.WINDOW_MINUTES)
        hits = [t for t in ts if lo <= t < hi]
        assert len(hits) >= 3, f"no events swept into window {base}"
        # the transition instant itself sits mid-window: rows on both sides
        mid = base + dt.timedelta(minutes=60)
        assert any(t < mid for t in hits) and any(t >= mid for t in hits)


@pytest.mark.parametrize("qid", DST_TIER_IDS)
def test_dst_tier_parity(qid, spark, dst_dir, dst_con):
    spec = SPECS[qid]
    df = spec.fn(spark, dst_dir)
    report = compare(df, dst_con, spec.oracle)
    assert report["ok"], f"{qid}: {report}"


def test_local_to_utc_dialect_contract(spark):
    """The measured local->UTC divergence (probed 2026-08, Spark 4.1.2 vs
    DuckDB ICU): ambiguous fall-back local times resolve EARLIER (DST
    offset) in Spark and LATER (standard offset) in DuckDB; nonexistent
    spring-forward local times and all unambiguous times agree. If a
    tzdata or engine upgrade shifts any of these, this fails loudly and
    the dialect contract must be re-derived."""
    import duckdb
    from pyspark.sql import functions as F

    cases = [
        # (local literal, zone, spark_utc, duck_utc)
        ("2024-11-03 01:30:00", "America/New_York",
         "2024-11-03 05:30:00", "2024-11-03 06:30:00"),  # ambiguous: differs
        ("2024-10-27 02:30:00", "Europe/Berlin",
         "2024-10-27 00:30:00", "2024-10-27 01:30:00"),  # ambiguous: differs
        ("2024-03-10 02:30:00", "America/New_York",
         "2024-03-10 07:30:00", "2024-03-10 07:30:00"),  # nonexistent: agrees
        ("2024-03-31 02:30:00", "Europe/Berlin",
         "2024-03-31 01:30:00", "2024-03-31 01:30:00"),  # nonexistent: agrees
        ("2024-06-01 12:00:00", "America/New_York",
         "2024-06-01 16:00:00", "2024-06-01 16:00:00"),  # plain: agrees
    ]
    df = spark.createDataFrame(
        [(lt, z) for lt, z, _, _ in cases], "lt string, z string"
    )
    got = {
        (r.lt, r.z): r.utc
        for r in df.select(
            "lt", "z",
            F.to_utc_timestamp(F.col("lt").cast("timestamp"), F.col("z"))
            .cast("string").alias("utc"),
        ).collect()
    }
    con = duckdb.connect()
    try:
        for lt, z, want_spark, want_duck in cases:
            assert got[(lt, z)] == want_spark, (lt, z, got[(lt, z)])
            duck = con.execute(
                f"SELECT CAST((TIMESTAMP '{lt}' AT TIME ZONE '{z}') "
                "AT TIME ZONE 'UTC' AS VARCHAR)"
            ).fetchone()[0]
            assert duck == want_duck, (lt, z, duck)
    finally:
        con.close()


def test_utc_to_local_agrees_at_transitions(spark):
    """UTC->local (the direction fn_timezone_convert uses) has no
    ambiguity; pin engine agreement at the exact transition instants so
    the tier's parity sweep rests on a checked foundation."""
    import duckdb
    from pyspark.sql import functions as F

    instants = [
        ("2024-03-10 06:59:59", "America/New_York"),
        ("2024-03-10 07:00:00", "America/New_York"),
        ("2024-11-03 05:59:59", "America/New_York"),
        ("2024-11-03 06:00:00", "America/New_York"),
        ("2024-03-31 00:59:59", "Europe/Berlin"),
        ("2024-03-31 01:00:00", "Europe/Berlin"),
        ("2024-10-27 00:59:59", "Europe/Berlin"),
        ("2024-10-27 01:00:00", "Europe/Berlin"),
    ]
    df = spark.createDataFrame(instants, "ut string, z string")
    got = {
        (r.ut, r.z): r.local
        for r in df.select(
            "ut", "z",
            F.from_utc_timestamp(F.col("ut").cast("timestamp"), F.col("z"))
            .cast("string").alias("local"),
        ).collect()
    }
    con = duckdb.connect()
    try:
        for ut, z in instants:
            duck = con.execute(
                f"SELECT CAST((TIMESTAMP '{ut}' AT TIME ZONE 'UTC') "
                f"AT TIME ZONE '{z}' AS VARCHAR)"
            ).fetchone()[0]
            assert got[(ut, z)] == duck, (ut, z, got[(ut, z)], duck)
    finally:
        con.close()
