"""Tier-3 property-based parity (SURVEY.md §5.3): generated inputs through
BOTH engines' implementations of the dialect surfaces most likely to drift —
regex character classes, aggregate rounding, ISO day-of-week normalization,
and timestamp truncation.

One Spark batch per property (all hypothesis examples collected, run once)
keeps runtime sane — per-example Spark jobs would take minutes.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

TEXTS = st.text(
    alphabet=st.sampled_from("abc XYZ09._-#"), min_size=0, max_size=24
)
DOUBLES = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
DATES = st.dates()


def _spark_one_col(spark, rows, ddl):
    return spark.createDataFrame([(r,) for r in rows], ddl)


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_regex_replace_and_extract_parity(spark, data):
    """regexp_replace (global) and regexp_extract over the same generated
    strings: Java regex vs DuckDB RE2 must agree on these class patterns."""
    strings = data.draw(st.lists(TEXTS, min_size=30, max_size=30))
    df = _spark_one_col(spark, strings, "s string")
    from pyspark.sql import functions as F

    got = [
        (r.repl, r.ext)
        for r in df.select(
            F.regexp_replace("s", r"[0-9]+", "#").alias("repl"),
            F.regexp_extract("s", r"([A-Z]+)", 1).alias("ext"),
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        tuple(row)
        for row in con.execute(
            "SELECT regexp_replace(s, '[0-9]+', '#', 'g'),"
            "       regexp_extract(s, '([A-Z]+)', 1) "
            "FROM (SELECT unnest(?) AS s)",
            [strings],
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_rounded_aggregate_parity(spark, data):
    """round(sum(x), 4) / round(avg(x), 6) over generated doubles must agree
    despite different summation orders — the engine's aggregate-rounding
    discipline in miniature."""
    xs = data.draw(st.lists(DOUBLES, min_size=50, max_size=50))
    df = _spark_one_col(spark, xs, "x double")
    from pyspark.sql import functions as F

    row = df.agg(
        F.round(F.sum("x"), 4).alias("s"), F.round(F.avg("x"), 6).alias("a")
    ).collect()[0]
    con = duckdb.connect()
    want = con.execute(
        "SELECT round(sum(x), 4), round(avg(x), 6) FROM (SELECT unnest(?) AS x)",
        [xs],
    ).fetchone()
    assert (row.s, row.a) == want


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_iso_dow_normalization_parity(spark, data):
    """The engine's dayofweek→ISO mapping ((dow + 5) % 7 + 1) must equal
    DuckDB's isodow for arbitrary dates (fn_date's §5.4 normalization)."""
    dates = data.draw(st.lists(DATES, min_size=40, max_size=40))
    df = _spark_one_col(spark, dates, "d date")
    from pyspark.sql import functions as F

    got = [
        r.iso
        for r in df.select(
            (((F.dayofweek("d") + 5) % 7) + 1).cast("bigint").alias("iso")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        row[0]
        for row in con.execute(
            "SELECT isodow(d) FROM (SELECT unnest(?) AS d)", [dates]
        ).fetchall()
    ]
    assert got == want


def test_nanos_truncation_matches_duckdb(spark, sf_small):
    """The registry's `timestamp_micros(ts DIV 1000)` shim must reproduce
    DuckDB's silent ns→µs truncation row-for-row on the real events table —
    the single most load-bearing parity decision in the engine (§7.4)."""
    from pyspark.sql import functions as F

    from ai_dataingestion_spark.registry import load_table

    got = {
        r.event_id: r.us
        for r in load_table(spark, sf_small, "events")
        .select("event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT event_id, epoch_us(ts) FROM "
            f"read_parquet('{sf_small}/events.parquet')"
        ).fetchall()
    )
    assert got == want
