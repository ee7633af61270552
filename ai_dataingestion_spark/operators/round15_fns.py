"""§2.AK round-15 second block: sketch set-algebra, bitwise/conditional
aggregates, and masking redaction (SURVEY.md §2.AK).

Three function families a training-data pipeline reaches for that the
surface did not yet cover:

- **Theta sketches** (Apache DataSketches via Spark 4's
  `theta_sketch_agg` / `theta_union` / `theta_intersection` /
  `theta_difference` / `theta_sketch_estimate`): the mergeable
  distinct-count sketch WITH set algebra — "how much does corpus A
  overlap corpus B" without materializing either key set, the
  contamination/overlap estimator at 100 TB. The op pins the EXACT
  regime (the fn_approx_top_k_types discipline): below the sketch's
  nominal-entries threshold (4096) theta keeps every hash, so estimate,
  union, intersection, and difference are all exactly the true set
  cardinalities — which is what makes a value-exact oracle possible. The
  cohort key is bounded (user_id % 2048) so the contract holds at ANY
  corpus scale, and the sketch stays deterministic (hash-based, fixed
  default seed, order-independent by construction).
- **Bitwise + conditional aggregates** (`bit_and`/`bit_or`/`bit_xor`,
  `count_if`, `every`/`some`): integer-exact and order-independent
  (AND/OR/XOR are commutative monoids), so the oracle is DuckDB's
  identically-named aggregate family, no rounding discipline needed.
- **mask() redaction** (Spark 4 `mask`, plus `overlay`): the built-in
  PII-shape scrubber — class-preserving character masking (uppercase→X,
  lowercase→x, digit→n, custom or keep per class) and positional splice
  redaction. Inputs are ASCII-sanitized IDENTICALLY on both sides first
  (strip non-0x20–0x7E) because Java's isUpperCase and RE2's \\p{Lu}
  disagree on exotic categories (titlecase) — the unicode-tier contract
  is explicit, not accidental.

Scale posture: all three are single-pass partial-aggregable expressions
(sketches merge map-side; bit/bool aggregates are monoids; mask is a
per-row expression inside codegen) — no shuffles beyond the final
bounded-cardinality groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

# ---------------------------------------------------------------------------
# agg_theta_sketch_sets — distinct + set algebra in the exact regime
# ---------------------------------------------------------------------------


@register(
    "agg_theta_sketch_sets",
    oracle="""
WITH coh AS (
  SELECT event_type, user_id % 2048 AS c FROM events
  WHERE user_id IS NOT NULL
),
clicks AS (SELECT DISTINCT c FROM coh WHERE event_type = 'click'),
views  AS (SELECT DISTINCT c FROM coh WHERE event_type = 'view')
SELECT 'type:' || event_type AS scope,
       CAST(count(DISTINCT c) AS BIGINT) AS n_distinct
FROM coh GROUP BY event_type
UNION ALL
SELECT 'click_union_view',
       CAST((SELECT count(*) FROM (SELECT c FROM clicks
                                   UNION SELECT c FROM views)) AS BIGINT)
UNION ALL
SELECT 'click_intersect_view',
       CAST((SELECT count(*) FROM (SELECT c FROM clicks
                                   INTERSECT SELECT c FROM views)) AS BIGINT)
UNION ALL
SELECT 'click_minus_view',
       CAST((SELECT count(*) FROM (SELECT c FROM clicks
                                   EXCEPT SELECT c FROM views)) AS BIGINT)
""",
)
def agg_theta_sketch_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch distinct counting WITH set algebra, pinned in the
    exact regime: per-event-type cohort cardinalities from
    theta_sketch_agg, then union/intersection/difference between the
    'click' and 'view' cohorts via the sketch operators — every estimate
    must equal the true set cardinality because the bounded cohort key
    (user_id % 2048, NULLs excluded on both sides — the sketch skips
    NULL inputs) keeps every group under the 4096-entry exact threshold
    at any corpus scale. This is the corpus-overlap estimator shape: at
    100 TB the sketches merge map-side (bytes, not key sets, cross the
    shuffle) and the set algebra runs on kilobyte summaries. Beyond the
    threshold theta enters ~1.6%-RSE estimation — that regime is the
    sketch's documented contract, not this oracle's."""
    e = Tables(spark, sf_dir).events
    coh = e.where(F.col("user_id").isNotNull()).select(
        "event_type", (F.col("user_id") % 2048).alias("c")
    )
    per_type = coh.groupBy("event_type").agg(
        F.theta_sketch_agg("c").alias("sk")
    )
    by_type = per_type.select(
        F.concat(F.lit("type:"), F.col("event_type")).alias("scope"),
        F.theta_sketch_estimate("sk").cast("bigint").alias("n_distinct"),
    )
    # one conditional-aggregate row, not two filtered aggregates + a
    # crossJoin: always exactly one row (even on a degenerate corpus),
    # and the two sketches build in the SAME partial-aggregation pass
    pair = coh.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("c"))
        ).alias("s_click"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("c"))
        ).alias("s_view"),
    )
    algebra = pair.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("click_union_view").alias("scope"),
                    F.theta_sketch_estimate(
                        F.theta_union("s_click", "s_view")
                    ).cast("bigint").alias("n_distinct"),
                ),
                F.struct(
                    F.lit("click_intersect_view").alias("scope"),
                    F.theta_sketch_estimate(
                        F.theta_intersection("s_click", "s_view")
                    ).cast("bigint").alias("n_distinct"),
                ),
                F.struct(
                    F.lit("click_minus_view").alias("scope"),
                    F.theta_sketch_estimate(
                        F.theta_difference("s_click", "s_view")
                    ).cast("bigint").alias("n_distinct"),
                ),
            )
        ).alias("r")
    ).select("r.scope", "r.n_distinct")
    return by_type.unionByName(algebra)


# ---------------------------------------------------------------------------
# agg_bitwise_conditional — bit monoids + conditional/boolean aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_bitwise_conditional",
    oracle="""
SELECT l_returnflag,
       bit_and(l_linenumber) AS and_lines,
       bit_or(l_linenumber)  AS or_lines,
       bit_xor(l_linenumber) AS xor_lines,
       CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
       bool_and(l_quantity > 0)   AS all_positive,
       bool_or(l_discount > 0.09) AS any_deep_discount
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_bitwise_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate monoids (AND/OR/XOR over line numbers — the
    flag-accumulation shape: which bits are always/ever/odd-count set)
    plus the conditional-count and boolean-quantifier aggregates
    (count_if, every/some ≙ SQL bool_and/bool_or). All integer- or
    boolean-exact and order-independent, so the oracle is DuckDB's
    identically-named family with zero rounding discipline. Single
    partial-aggregable pass, 3 groups out at any scale."""
    li = Tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("and_lines"),
        F.bit_or("l_linenumber").alias("or_lines"),
        F.bit_xor("l_linenumber").alias("xor_lines"),
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        F.every(F.col("l_quantity") > 0).alias("all_positive"),
        F.some(F.col("l_discount") > 0.09).alias("any_deep_discount"),
    )


# ---------------------------------------------------------------------------
# fn_mask_redaction_family — class-preserving masking + positional splice
# ---------------------------------------------------------------------------

# ASCII sanitation applied IDENTICALLY on both sides: Java isUpperCase vs
# RE2 \p{Lu} disagree on exotic categories, so the masking contract is
# pinned on the printable-ASCII domain (the unicode tier mutates c_name).
_ASCII_SPARK = r"[^\x20-\x7E]"
_ASCII_DUCK = "[^ -~]"


@register(
    "fn_mask_redaction_family",
    oracle=f"""
WITH s AS (
  SELECT c_custkey,
         regexp_replace(c_name, '{_ASCII_DUCK}', '', 'g') AS nm
  FROM customer
)
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(nm,
         '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS masked_default,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(nm,
         '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '9', 'g'),
         '[^Ul9]', '*', 'g')
         AS masked_custom,
       regexp_replace(nm, '[0-9]', '#', 'g') AS digits_redacted,
       CASE WHEN length(nm) >= 10
            THEN substr(nm, 1, 9) || '[REDACTED]' || substr(nm, 14)
            ELSE nm END AS spliced
FROM s
""",
)
def fn_mask_redaction_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in PII-redaction surface: mask() with default classes
    (upper→X, lower→x, digit→n, other kept), fully-custom replacement
    chars (other→'*'), and the keep-classes form (NULL per-class char ⇒
    unchanged — digits-only redaction), plus overlay() as the positional
    splice (fixed-width token replacement). Everything is a per-row
    codegen expression — the scrub rides the ingest scan at 100 TB, no
    UDF. The oracle rebuilds each mask as an explicit regexp_replace
    chain, which doubles as an executable spec of mask()'s class
    semantics. overlay() at pos 10/len 4 only applies to names long
    enough — the CASE mirrors overlay's shorter-string passthrough."""
    c = Tables(spark, sf_dir).customer
    nm = F.regexp_replace(F.col("c_name"), _ASCII_SPARK, "")
    return c.select(
        "c_custkey",
        F.mask(nm).alias("masked_default"),
        F.mask(
            nm, F.lit("U"), F.lit("l"), F.lit("9"), F.lit("*")
        ).alias("masked_custom"),
        F.mask(
            nm, F.lit(None), F.lit(None), F.lit("#"), F.lit(None)
        ).alias("digits_redacted"),
        F.when(
            F.length(nm) >= 10,
            F.overlay(nm, F.lit("[REDACTED]"), F.lit(10), F.lit(4)),
        ).otherwise(nm).alias("spliced"),
    )
