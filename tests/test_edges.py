"""Tier-1 degenerate-input tests: the engine's building blocks on empty
relations, single rows, and all-null columns — the edges the corpus (dense,
null-free, well-populated) never exercises."""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _empty_events(spark):
    return spark.createDataFrame(
        [], "event_id bigint, user_id bigint, value double, event_type string"
    )


def test_groupby_on_empty_input_returns_no_groups(spark):
    out = _empty_events(spark).groupBy("event_type").agg(F.sum("value")).collect()
    assert out == []


def test_global_agg_on_empty_input_is_one_row_of_nulls(spark):
    row = (
        _empty_events(spark)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.avg("value").alias("a"),
        )
        .collect()[0]
    )
    assert (row.n, row.s, row.a) == (0, None, None)


def test_window_on_single_row(spark):
    df = spark.createDataFrame([(1, 10.0)], "k bigint, v double")
    w = Window.partitionBy("k").orderBy("v")
    row = df.select(
        F.row_number().over(w).alias("rn"),
        F.lag("v").over(w).alias("prev"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run"),
    ).collect()[0]
    assert (row.rn, row.prev, row.run) == (1, None, 10.0)


def test_all_null_column_aggregates(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    row = df.agg(
        F.sum("v").alias("s"),
        F.avg("v").alias("a"),
        F.min("v").alias("mn"),
        F.count("v").alias("c"),
    ).collect()[0]
    assert (row.s, row.a, row.mn, row.c) == (None, None, None, 0)


def test_join_empty_side_behaviors(spark):
    left = spark.createDataFrame([(1, "a")], "k bigint, s string")
    empty = spark.createDataFrame([], "k bigint, t string")
    assert left.join(empty, "k").count() == 0
    out = left.join(empty, "k", "left").collect()
    assert len(out) == 1 and out[0].t is None
    assert left.join(empty, "k", "left_anti").count() == 1


def test_explode_of_empty_array_drops_row_but_outer_keeps_it(spark):
    df = spark.createDataFrame([(1, []), (2, ["x"])], "k bigint, a array<string>")
    assert df.select("k", F.explode("a")).count() == 1
    outer = df.select("k", F.explode_outer("a").alias("e")).collect()
    assert len(outer) == 2
    assert {r.k: r.e for r in outer} == {1: None, 2: "x"}


def test_minhash_shingle_guard_short_docs(spark, sf_small):
    """Docs shorter than the shingle width must not crash shingling (the
    greatest(size-2, 1) guard) — exercised with a synthetic 1-token doc."""
    from ai_dataingestion_spark.ai.dedup import _SHINGLES_EXPR

    df = spark.createDataFrame([("x",), ("a b",)], "text string").withColumn(
        "toks", F.split("text", " ")
    )
    rows = df.select(F.expr(_SHINGLES_EXPR).alias("sh")).collect()
    assert rows[0].sh == ["x"]       # degenerate: the whole doc is the shingle
    assert rows[1].sh == ["a b"]


def test_last_touch_attribution_semantics(spark):
    """Pin the ignore-nulls last_value frame: a purchase with NO prior
    non-purchase touch attributes to nothing (dropped); back-to-back
    purchases both attribute to the same last touch; later touches
    override earlier ones."""
    rows = [
        (1, 1, "purchase"),   # no prior touch -> dropped
        (2, 1, "click"),
        (3, 1, "purchase"),   # -> click
        (4, 1, "purchase"),   # still -> click (purchases don't re-touch)
        (5, 1, "view"),
        (6, 1, "purchase"),   # -> view
        (1, 2, "signup"),
        (2, 2, "purchase"),   # -> signup
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = df.select(
        "event_type",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w).alias("attributed"),
    )
    out = {
        (r["attributed"]): r["n"]
        for r in touched.filter(
            (F.col("event_type") == "purchase") & F.col("attributed").isNotNull()
        )
        .groupBy("attributed")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {"click": 2, "view": 1, "signup": 1}


def test_hll_merge_matches_whole_corpus_sketch(spark):
    """Merge-consistency of the HLL path: unioning per-day sketches must
    estimate the same cardinality as one sketch over the whole corpus
    (the property that makes incremental ingestion sound), and both must
    land within 2% of exact on this cardinality range."""
    from ai_dataingestion_spark.catalog import all_specs

    row = (
        all_specs()["agg_hll_sketch_merge"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()[0]
    )
    assert row["rel_err"] < 0.02, row
    whole = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("e"))
        .collect()[0]["e"]
    )
    assert row["estimated_users"] == whole
