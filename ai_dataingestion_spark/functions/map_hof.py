"""§2.AF round-14 block: map higher-order functions (transform_values /
map_filter / map_zip_with / str_to_map / map_concat / map_entries).

The array HOF family (fn_array_hof) and the props-map parse (fn_map) left
the MAP-lambda surface uncovered: the functions that rewrite, filter, and
merge map columns JVM-side. In an ingest pipeline these are the
feature-bag operators — per-row key→value bags (metrics, config strings,
sketch registers) transformed without exploding to rows first.

Oracle strategy: maps never cross the comparison boundary (DuckDB's MAP is
a different animal); every op reduces its map work back to scalars, and
the oracle recomputes the same scalars straight from the base columns —
green means the map round made no difference, which is exactly the
semantic claim. Quarantines are mirrored verbatim where the synthesis has
undefined corners (delimiter collisions for str_to_map, NULL keys for
map_from_entries — Spark maps cannot hold a NULL key).

Scale posture: all lambdas are Catalyst expressions inside the row's
codegen stage — per-row cost, no shuffle beyond the aggregations that
would exist anyway, no Python. Map cardinality here is per-row bounded
(3–6 keys), the 100 TB shape for feature bags (a per-row map the size of
the corpus would be the anti-pattern)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables


@register(
    "fn_map_transform_family",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(sum((CASE WHEN l_quantity > 1 THEN 1 ELSE 0 END)
              + (CASE WHEN l_extendedprice > 1 THEN 1 ELSE 0 END)
              + (CASE WHEN l_discount > 1 THEN 1 ELSE 0 END)) AS BIGINT)
         AS n_over_one,
       CAST(round(sum(CAST(round(l_quantity * 100)
                         + round(l_extendedprice * 100)
                         + round(l_discount * 100) AS DECIMAL(38,6))), 2)
            AS DOUBLE) AS sum_cents
FROM lineitem
GROUP BY l_returnflag
""",
)
def fn_map_transform_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row feature bag {qty, price, disc} built with create_map, then
    the lambda family applied in one expression chain: map_filter counts
    the entries whose RAW value exceeds 1 (same predicate as the oracle's
    CASEs — no derived-unit equivalence to break on the extremes tier's
    many-decimal money), transform_values scales to cents, and
    aggregate(map_values(...)) folds the scaled bag to a row scalar —
    zero explodes, zero Python. The per-row double arithmetic is
    IEEE-identical across engines; the cross-row sum goes through
    DECIMAL(38,6) on both sides (the registry's standing money-sum
    discipline) so partial-aggregation order can't wiggle a double sum."""
    t = Tables(spark, sf_dir)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("price"), F.col("l_extendedprice"),
        F.lit("disc"), F.col("l_discount"),
    )
    over_one = F.map_filter(m, lambda k, v: v > 1)
    cents = F.transform_values(m, lambda k, v: F.round(v * 100))
    row_cents = F.aggregate(
        F.map_values(cents), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        t.lineitem.select(
            "l_returnflag",
            F.size(over_one).alias("n_over"),
            row_cents.cast("decimal(38,6)").alias("row_cents"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_over").cast("bigint").alias("n_over_one"),
            F.round(F.sum("row_cents"), 2).cast("double").alias("sum_cents"),
        )
    )


@register(
    "fn_map_zip_merge",
    oracle="""
SELECT user_id,
       coalesce(event_type, '(none)') AS event_type,
       count(*) AS n_events,
       CAST(round(sum(CASE WHEN isfinite(value)
                           THEN CAST(value AS DECIMAL(38,6)) END), 4)
            AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id, coalesce(event_type, '(none)')
""",
)
def fn_map_zip_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two per-user maps over event_type — counts and finite-value sums,
    assembled with map_from_entries(collect_list(struct(...))) — merged by
    map_zip_with into STRUCT values and exploded back to rows. This is the
    sketch-merge shape: per-key partial aggregates carried as maps,
    combined key-wise without a second shuffle (the zip runs inside the
    row). NULL event_type is coalesced to a sentinel BEFORE map assembly
    (Spark maps cannot hold a NULL key — the nulls tier would throw, not
    mis-answer) and the oracle mirrors it; NULL/NaN/±Inf values are
    excluded from the sum but counted in n_events, mirroring the oracle's
    isfinite CASE over count(*). The zip emits (count, round(sum, 4))
    rather than a mean: dividing before rounding puts the output on a
    half-ulp boundary the two engines' accumulation orders can disagree
    about (found by driver_sim on the clean corpus at sf0.01 — one user's
    mean flipped 70.4762/70.4763), while the 4-decimal sum is the
    registry's standing green contract."""
    t = Tables(spark, sf_dir)
    finite = F.col("value").isNotNull() & ~F.isnan("value") & (
        F.abs(F.col("value")) != F.lit(float("inf"))
    )
    per = (
        t.events.withColumn(
            "et", F.coalesce("event_type", F.lit("(none)"))
        )
        .withColumn(
            # decimal, not double (the stream_session class,
            # portable.py:stable_rounded_sum): v_fin already excludes
            # non-finites, so the exact order-independent sum needs no
            # raw-double branch — just the per-row cast
            "v_fin",
            F.when(finite, F.col("value")).cast("decimal(38,6)"),
        )
        .groupBy("user_id", "et")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v_fin").alias("s"),
        )
    )
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("et", "cnt"))
        ).alias("counts"),
        F.map_from_entries(F.collect_list(F.struct("et", "s"))).alias("sums"),
    )
    merged = maps.select(
        "user_id",
        F.map_zip_with(
            "counts", "sums",
            lambda k, c, s: F.struct(
                c.alias("n"), F.round(s, 4).cast("double").alias("sv")
            ),
        ).alias("merged_map"),
    )
    return merged.select(
        "user_id", F.explode("merged_map").alias("event_type", "m")
    ).select(
        "user_id", "event_type",
        F.col("m.n").alias("n_events"),
        F.col("m.sv").alias("sum_value"),
    )


@register(
    "fn_str_to_map_parse",
    oracle="""
SELECT o_orderstatus AS status,
       split_part(o_orderpriority, '-', 1) AS prio_rank,
       count(*) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
FROM orders
WHERE o_orderstatus NOT LIKE '%,%' AND o_orderstatus NOT LIKE '%:%'
  AND o_orderpriority NOT LIKE '%,%' AND o_orderpriority NOT LIKE '%:%'
GROUP BY o_orderstatus, split_part(o_orderpriority, '-', 1)
""",
)
def fn_str_to_map_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The config-string shape: per-row 'status:X,key:N,prio:P' assembled
    from orders columns, parsed back with str_to_map, fields extracted via
    element_at and re-aggregated. Rows whose components contain the
    delimiters are quarantined symmetrically first (the parse is undefined
    there — the unicode tier mutates enum strings and must hit the same
    wall on both engines). Green means the parse is lossless on the
    admissible domain; prio_rank additionally passes the parsed value
    through a second string op (split_part) to pin composition."""
    t = Tables(spark, sf_dir)
    clean = t.orders.filter(
        ~F.col("o_orderstatus").rlike("[,:]")
        & ~F.col("o_orderpriority").rlike("[,:]")
    )
    # key coalesced to '' (NOT left nullable): one NULL arg nulls the
    # whole concat, which would mint a phantom all-NULL parse row where
    # the oracle keeps the (status, prio) group — the same field-shift
    # class the combined tier caught in fn_from_csv_delimiter_options.
    # An empty value parses to NULL bigint, which the null-skipping sums
    # treat exactly as the oracle's raw column.
    cfg = F.concat(
        F.lit("status:"), F.col("o_orderstatus"),
        F.lit(",key:"),
        F.coalesce(F.col("o_orderkey").cast("string"), F.lit("")),
        F.lit(",prio:"), F.col("o_orderpriority"),
    )
    parsed = clean.select(
        F.str_to_map(cfg, F.lit(","), F.lit(":")).alias("m")
    )
    return (
        parsed.select(
            F.element_at("m", "status").alias("status"),
            F.split_part(
                F.element_at("m", "prio"), F.lit("-"), F.lit(1)
            ).alias("prio_rank"),
            F.element_at("m", "key").cast("bigint").alias("key"),
        )
        .groupBy("status", "prio_rank")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("key").cast("bigint").alias("sum_keys"),
        )
    )


@register(
    "fn_map_concat_entries",
    oracle="""
SELECT p_type,
       count(*) AS n,
       CAST(count(*) * 3 AS BIGINT) AS n_entries,
       CAST(sum(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_big_size
FROM part
GROUP BY p_type
""",
)
def fn_map_concat_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_concat over DISJOINT key spaces (string attributes + a numeric
    attribute stringified) then map_entries/map_contains_key reductions:
    the bag-union shape for merging feature namespaces. n_entries pins
    that concat kept every entry of both maps (3 per row); n_big_size
    extracts a value back OUT of the merged bag via element_at and
    compares it against the raw column's predicate — a key collision or a
    dropped namespace breaks either count."""
    t = Tables(spark, sf_dir)
    m1 = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    m2 = F.create_map(F.lit("size"), F.col("p_size").cast("string"))
    merged = F.map_concat(m1, m2)
    return (
        t.part.select(
            F.element_at(merged, "type").alias("p_type"),
            F.size(F.map_entries(merged)).alias("n_entries_row"),
            # coalesce: a NULL p_size (nulls tier) makes the predicate
            # NULL, and an all-NULL group would sum to NULL where the
            # oracle's CASE yields 0
            F.coalesce(
                (
                    F.map_contains_key(merged, "size")
                    & (F.element_at(merged, "size").cast("int") > 25)
                ).cast("int"),
                F.lit(0),
            ).alias("is_big"),
        )
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_entries_row").cast("bigint").alias("n_entries"),
            F.sum("is_big").cast("bigint").alias("n_big_size"),
        )
    )
