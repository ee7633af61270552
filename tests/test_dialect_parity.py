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


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_levenshtein_parity(spark, data):
    """Spark's levenshtein vs DuckDB's over generated string pairs — both
    must implement the same unweighted edit distance."""
    pairs = data.draw(
        st.lists(st.tuples(TEXTS, TEXTS), min_size=25, max_size=25)
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r.d for r in df.select(F.levenshtein("a", "b").alias("d")).collect()]
    con = duckdb.connect()
    want = [
        row[0]
        for row in con.execute(
            "SELECT levenshtein(a, b) FROM (SELECT unnest(?) AS a, unnest(?) AS b)",
            [[p[0] for p in pairs], [p[1] for p in pairs]],
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_median_interpolation_parity(spark, data):
    """median over generated doubles: both engines interpolate even-count
    midpoints as (a+b)/2 on identical inputs — the assumption agg_median's
    oracle rests on."""
    xs = data.draw(st.lists(DOUBLES, min_size=1, max_size=41))
    from pyspark.sql import functions as F

    df = _spark_one_col(spark, xs, "x double")
    got = df.agg(F.round(F.median("x"), 6).alias("m")).collect()[0].m
    con = duckdb.connect()
    want = con.execute(
        "SELECT round(median(x), 6) FROM (SELECT unnest(?) AS x)", [xs]
    ).fetchone()[0]
    assert got == want


def test_connected_components_vs_union_find(spark):
    """Property check of the reusable min-label-propagation kernel against
    a Python union-find on pseudo-random graphs, including a long path
    (multi-hop propagation well beyond the operator fixture's diameter-2
    chains)."""
    import random

    from ai_dataingestion_spark.operators.advanced import connected_components

    rng = random.Random(20260813)
    cases = []
    for _ in range(3):  # random sparse graphs
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40)
        ]
        cases.append((n, edges))
    cases.append((30, [(i, i + 1) for i in range(29)]))  # one long path

    for n, edges in cases:
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in range(n)}

        nodes = spark.createDataFrame([(i,) for i in range(n)], "node bigint")
        edf = spark.createDataFrame(
            edges or [(0, 0)], "src bigint, dst bigint"
        )
        got = {
            r.node: r.comp
            for r in connected_components(nodes, edf, max_iters=64).collect()
        }
        assert got == want, (n, edges)


UNICODE_TEXTS = st.text(min_size=0, max_size=40)  # full unicode plane


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_portable_hash_parity(spark, data):
    """The md5-derived 60-bit hash every portable-signature operator rests
    on (minhash, simhash, fingerprints, CMS, bloom) must agree between
    Spark's conv(...,16,10) and DuckDB's '0x...' cast for ARBITRARY
    unicode strings — a drift here silently skews every signature."""
    texts = data.draw(st.lists(UNICODE_TEXTS, min_size=20, max_size=20))
    from pyspark.sql import functions as F

    df = _spark_one_col(spark, texts, "s string")
    got = [
        r.h
        for r in df.select(
            F.expr(
                "CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT)"
            ).alias("h")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        row[0]
        for row in con.execute(
            "SELECT CAST('0x'||substring(md5(s),1,15) AS BIGINT) "
            "FROM (SELECT unnest(?) AS s)",
            [texts],
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_carter_wegman_transform_parity(spark, data):
    """The affine minhash transforms (a*h + b) % (2^31-1) must be
    overflow-identical in both engines across the full base-hash range."""
    P = (1 << 31) - 1
    hs = data.draw(
        st.lists(st.integers(min_value=0, max_value=P - 1),
                 min_size=20, max_size=20)
    )
    a, b = 2654435761 % P, 104729
    from pyspark.sql import functions as F

    df = _spark_one_col(spark, hs, "h bigint")
    got = [
        r.v
        for r in df.select(
            ((F.lit(a) * F.col("h") + F.lit(b)) % P).alias("v")
        ).collect()
    ]
    con = duckdb.connect()
    # CAST to BIGINT as the real oracle does (its base hash is already a
    # BIGINT expression) — raw unnest infers INT32 and overflows.
    want = [
        row[0]
        for row in con.execute(
            f"SELECT ({a} * CAST(h AS BIGINT) + {b}) % {P} "
            "FROM (SELECT unnest(?) AS h)",
            [hs],
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_portable_floor_rounding_parity(spark, data):
    """The portable rounding formula floor(x·1e6 + 0.5)/1e6 must agree
    bit-for-bit between Spark and DuckDB — including on exact decimal
    ties where built-in round() provably DIVERGES (sf0.1 regression:
    8290.71/32 = 259.0846875 → Spark round HALF_UP …688, DuckDB binary
    …687). Quotients of small exact decimals are the hot class, so
    generate exactly those."""
    nums = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=10**7),  # cents numerator
                st.integers(min_value=1, max_value=64),     # small denominator
            ),
            min_size=1,
            max_size=50,
        )
    )
    quotients = [n / 100 / d for n, d in nums] + [8290.71 / 32]
    sdf = _spark_one_col(spark, quotients, "x double").selectExpr(
        "floor(x * 1000000 + 0.5) / 1000000 AS r"
    )
    got = [r["r"] for r in sdf.collect()]
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT floor(x * 1000000 + 0.5) / 1000000 FROM (SELECT "
            "unnest(?) AS x)",
            params=[quotients],
        ).fetchall()
    ]
    assert got == want
