"""Operator catalog: the registry behind ``__spark_entry__.queries()``.

Every operator from SURVEY.md §2 registers itself here as a QuerySpec:
a name (the literal §2 ID), a callable ``(spark, sf_dir) -> DataFrame``, and —
for oracle-verified operators — the equivalent DuckDB SQL. The driver runs
both sides at sf0.01 and hash-compares (row count + schema + order-insensitive
value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded to a fixed number of decimals on both sides
  (double summation order differs between engines — SURVEY.md §5.4);
- rankings/top-k always carry a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame operator query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate operator id: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Operators earlier driver sweeps already verified green (CORRECTNESS_r01:
# 49 hash-green + agg_approx_distinct rows-only; CORRECTNESS_r02: 49
# hash-green — text_lang_stats is deliberately NOT here: its r2 hash-FAIL was
# an oracle HUGEINT cast bug, fixed in ai/text.py, and it must re-enter the
# window for its green row). The driver caps its oracle sweep at the FIRST 50
# entries of queries() per round, so registration order is the coverage
# rotation knob: not-yet-driver-checked operators must come first to earn
# their green rows. Oracle-backed ones outrank rows-only ones (a hash row is
# stronger evidence than a rows-only row). Rotate this set forward each round
# as CORRECTNESS_r{N}.json accumulates coverage.
_DRIVER_CHECKED: frozenset[str] = frozenset(
    {
        # --- round 1 green ---
        "agg_groupby", "agg_global", "agg_distinct", "agg_approx_distinct",
        "agg_having", "agg_rollup", "agg_cube", "agg_grouping_sets",
        "agg_percentile", "agg_stats", "agg_collect", "agg_conditional",
        "agg_top_groups", "agg_salted_skew", "agg_arg_minmax",
        "agg_rollup_grouping", "agg_bool", "tpch_q3_shipping_priority",
        "tpch_q5_local_volume", "tpch_q10_returned_items", "events_funnel",
        "events_cohort_retention", "pivot_wide", "unpivot_melt",
        "win_nth_value", "join_bucketed", "quality_observe", "join_inner",
        "join_broadcast", "join_left", "join_right", "join_full",
        "join_semi", "join_anti", "join_cross", "join_range", "join_asof",
        "join_multiway", "join_null_safe", "project_select", "project_cast",
        "filter_pred", "filter_like_regex", "distinct_rows", "set_union_all",
        "set_union_distinct", "set_intersect", "set_except", "sort_multi",
        "topk_global",
        # --- round 2 green ---
        "dedup_exact", "dedup_ngram_jaccard", "embed_normalize", "fn_array",
        "fn_array_hof", "fn_bitwise", "fn_cond", "fn_date", "fn_hash",
        "fn_json", "fn_map", "fn_math", "fn_null_semantics", "fn_regex",
        "fn_string", "fn_string_parts", "fn_struct_array", "fn_timestamp",
        "fn_trig", "limit_offset", "multimodal_binary_features",
        "multimodal_join", "sentiment_lexicon", "sim_cosine_topk",
        "sim_knn_label", "sim_pair_dedup", "text_clean", "text_langid",
        "text_ngrams", "text_quality_filter", "text_quality_score",
        "text_stopwords", "text_tfidf", "text_token_count", "text_tokenize",
        "udf_grouped_map", "udf_map_in_pandas", "udf_pandas_agg",
        "udf_pandas_scalar", "udf_python", "win_first_last",
        "win_lag_default", "win_lag_lead", "win_moving", "win_moving_range",
        "win_ntile_dist", "win_rank", "win_running", "win_topk_group",
    }
)


def _rotation_rank(spec: QuerySpec) -> int:
    """0 = unchecked with oracle (front of the driver window), 1 = unchecked
    rows-only, 2 = already driver-green (back of the line)."""
    if spec.name in _DRIVER_CHECKED:
        return 2
    return 0 if spec.oracle is not None else 1


def all_specs() -> dict[str, QuerySpec]:
    """All registered operators, ordered for the driver's 50-query sweep
    window (imports the operator packages on demand)."""
    import ai_dataingestion_spark.operators  # noqa: F401  (self-registers)

    ordered = sorted(
        enumerate(_REGISTRY.values()), key=lambda t: (_rotation_rank(t[1]), t[0])
    )
    return {spec.name: spec for _, spec in ordered}


def queries() -> dict[str, QueryFn]:
    return {k: v.fn for k, v in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: v.oracle for k, v in all_specs().items() if v.oracle is not None}
