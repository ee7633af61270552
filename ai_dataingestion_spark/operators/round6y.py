"""Round-6 fifty-first wave (SURVEY.md §2.R): tokenizer-training and
spatial primitives — BPE first-merge pair statistics, grid-blocked
spatial joins, and the approx-percentile sketch accuracy contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

# Pair extraction is capped at the first 50 chars of a word on BOTH sides
# (deterministic, engine-identical); real corpora tokenize far below that.
_BPE_CAP = 49


@register(
    "text_bpe_pair_merge",
    oracle=rf"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents),
ww AS (SELECT w FROM words WHERE length(w) >= 2),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM ww CROSS JOIN generate_series(1, {_BPE_CAP}) AS g(i)
  WHERE i <= length(w) - 1)
SELECT pair, count(*) AS n FROM pairs
GROUP BY 1 ORDER BY n DESC, pair LIMIT 20
""",
)
def text_bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, iteration one: the top-20 adjacent
    character pairs by corpus frequency — the pair a byte-pair-encoding
    trainer (Sennrich 2016, "Neural Machine Translation of Rare Words
    with Subword Units") would merge first. Words come from one
    whitespace split + explode; pairs are substr slices over a
    per-word index sequence (JVM-side, no UDF), so total work is linear
    in corpus characters — the same single-shuffle explode+count shape as
    text_tfidf, and the candidate-counting kernel you would iterate for a
    full merge loop. The top-20 cut is n-DESC with a pair tie-break so
    the boundary is deterministic cross-engine. Oracle: DuckDB spells the
    index sequence as a bounded generate_series cross join."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        )
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.sequence(
                    F.lit(1), F.least(F.length("w") - 1, F.lit(_BPE_CAP))
                )
            ).alias("i"),
            "w",
        )
        .select(F.expr("substr(w, i, 2)").alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


_SPATIAL_ORACLE = """
WITH pts AS (SELECT c_custkey,
                    CAST((c_custkey * 7) % 100 AS BIGINT) AS x,
                    CAST((c_custkey * 13) % 100 AS BIGINT) AS y
             FROM customer),
boxes AS (SELECT n_nationkey, n_name,
                 CAST((n_nationkey * 11) % 80 AS BIGINT) AS xmin,
                 CAST((n_nationkey * 11) % 80 + 15 AS BIGINT) AS xmax,
                 CAST((n_nationkey * 17) % 80 AS BIGINT) AS ymin,
                 CAST((n_nationkey * 17) % 80 + 20 AS BIGINT) AS ymax
          FROM nation)
SELECT b.n_name, count(p.c_custkey) AS n_points
FROM boxes b LEFT JOIN pts p
  ON p.x BETWEEN b.xmin AND b.xmax AND p.y BETWEEN b.ymin AND b.ymax
GROUP BY 1
"""

_CELL = 10  # grid cell edge; boxes span <=2x3 cells -> fan-out <=12


@register("join_spatial_grid", oracle=_SPATIAL_ORACLE)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial point-in-rectangle join via GRID BLOCKING — the pattern
    that makes spatial joins scale on a hash-shuffle engine (same
    candidate-generation-by-equality-join shape as the LSH dedups).
    Points and query boxes are synthesized deterministically from keys
    (the corpus has no geometry; the operator under test is the join
    strategy). Each point maps to one 10x10 grid cell; each box explodes
    into the <=12 cells it overlaps; the join is pure cell-key EQUALITY
    (shuffle/broadcast hash join — never the O(points x boxes)
    theta-join a naive BETWEEN predicate forces), followed by the exact
    containment verify on candidates only. LEFT join semantics keep
    empty boxes with count 0. At 100 TB the cell key shards uniformly
    and box fan-out stays constant. Oracle: DuckDB runs the naive
    theta-join spelling of the same semantics."""
    spark_pts = Tables(spark, sf_dir).customer.select(
        "c_custkey",
        ((F.col("c_custkey") * 7) % 100).cast("bigint").alias("x"),
        ((F.col("c_custkey") * 13) % 100).cast("bigint").alias("y"),
    )
    boxes = Tables(spark, sf_dir).nation.select(
        "n_nationkey",
        "n_name",
        ((F.col("n_nationkey") * 11) % 80).cast("bigint").alias("xmin"),
        ((F.col("n_nationkey") * 11) % 80 + 15).cast("bigint").alias("xmax"),
        ((F.col("n_nationkey") * 17) % 80).cast("bigint").alias("ymin"),
        ((F.col("n_nationkey") * 17) % 80 + 20).cast("bigint").alias("ymax"),
    )
    pcell = spark_pts.withColumn(
        "cx", (F.col("x") / _CELL).cast("bigint")
    ).withColumn("cy", (F.col("y") / _CELL).cast("bigint"))
    bcell = boxes.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("xmin") / _CELL).cast("bigint"),
                (F.col("xmax") / _CELL).cast("bigint"),
            )
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                (F.col("ymin") / _CELL).cast("bigint"),
                (F.col("ymax") / _CELL).cast("bigint"),
            )
        ).alias("cy"),
    )
    hits = (
        bcell.join(pcell, ["cx", "cy"])
        .filter(
            (F.col("x") >= F.col("xmin"))
            & (F.col("x") <= F.col("xmax"))
            & (F.col("y") >= F.col("ymin"))
            & (F.col("y") <= F.col("ymax"))
        )
        .groupBy("n_nationkey")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    return (
        boxes.select("n_nationkey", "n_name")
        .join(hits, "n_nationkey", "left")
        .select("n_name", F.coalesce("n_points", F.lit(0)).alias("n_points"))
    )


@register(
    "agg_approx_percentile_error",
    oracle="""
SELECT * FROM (VALUES (100, true), (1000, true), (10000, true))
  t(accuracy, within_bound)
""",
)
def agg_approx_percentile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approx-percentile sketch's accuracy CONTRACT, verified:
    Spark's percentile_approx (Greenwald-Khanna) promises the returned
    median's rank is within n/accuracy of the true rank. The operator
    computes the approx median at accuracy 100 / 1000 / 10000 plus the
    exact RANK INTERVAL of each returned value (one extra
    conditional-count pass with the 1-row sketch results broadcast), and
    emits whether each landed inside its bound — measured slack at
    sf0.001: rank error 1-32 vs bounds 2-61. Under duplicates a value
    occupies ranks [count(<v)+1, count(<=v)]; GK guarantees SOME rank of
    the value is within n/accuracy of the target, so the check is
    interval-intersection with the band 0.5n ± (n/accuracy + 1), not the
    upper rank alone — count(<=v) can exceed the band on heavily tied
    columns even when the sketch honors its contract (ADVICE r6). This
    is the check a pipeline runs before trusting sketch quantiles for
    SLA cut-offs at 100 TB, where exact percentiles cost a full sort.
    Oracle: the contract itself (all three accuracies within bound)."""
    li = Tables(spark, sf_dir).lineitem
    sk = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 100)").alias("a100"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 1000)").alias("a1000"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias(
            "a10000"
        ),
    )
    def _lt(a):
        return F.sum(
            F.when(F.col("l_extendedprice") < F.col(a), 1).otherwise(0)
        ).alias("lt" + a[1:])

    def _le(a):
        return F.sum(
            F.when(F.col("l_extendedprice") <= F.col(a), 1).otherwise(0)
        ).alias("le" + a[1:])

    ranks = li.crossJoin(F.broadcast(sk)).agg(
        F.first("n").alias("n"),
        _lt("a100"), _le("a100"),
        _lt("a1000"), _le("a1000"),
        _lt("a10000"), _le("a10000"),
    )
    # value's rank interval [lt+1, le] intersects the band
    # [0.5n - n/acc - 1, 0.5n + n/acc + 1]
    band = (
        "(lt{a} + 1) <= (0.5 * n + n / {a}.0 + 1) "
        "AND le{a} >= (0.5 * n - n / {a}.0 - 1)"
    )
    return ranks.selectExpr(
        "stack(3, "
        f"100,   {band.format(a=100)}, "
        f"1000,  {band.format(a=1000)}, "
        f"10000, {band.format(a=10000)}) "
        "AS (accuracy, within_bound)"
    )
