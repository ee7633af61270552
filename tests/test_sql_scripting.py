"""Semantic tests for the round-13 SQL scripting block
(operators/sql_scripting.py) — the procedural properties the oracle-parity
hash can't see: loop trip counts, post-test REPEAT semantics, branch
selection, handler specificity, and the scripts' set-based equivalence at
a second scale factor."""

from __future__ import annotations

import pytest

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()


def _run(spark, name, sf):
    return SPECS[name].fn(spark, sf).collect()


def test_while_accumulate_equals_set_based(spark, sf_small):
    """The WHILE-loop accumulation must equal the one-shot GROUP BY at a
    scale factor the driver never sweeps (sf0.001): same totals, and the
    loop's year partition is exhaustive over the in-range orders."""
    [row] = _run(spark, "sql_script_while_accumulate", sf_small)
    from ai_dataingestion_spark.registry import register_views

    register_views(spark, sf_small)
    [exp] = spark.sql(
        """SELECT count(*) AS n,
                  coalesce(CAST(round(sum(o_totalprice) * 100) AS BIGINT), 0)
                    AS cents
           FROM orders
           WHERE year(o_orderdate) BETWEEN 1992 AND 1998"""
    ).collect()
    assert row["n_orders"] == exp["n"]
    # per-year rounding: loop sums round(per-year), one-shot rounds the
    # whole sum — they may differ by at most 1 cent per year boundary
    assert abs(row["sum_price_cents"] - exp["cents"]) <= 7
    assert 0 <= row["years_nonempty"] <= 7


def test_for_cursor_summary_is_cursor_ordered(spark, sf_small):
    """The FOR cursor iterates ORDER BY r_regionkey, so the accumulated
    summary must list regions in key order — a property the
    order-insensitive driver hash cannot pin."""
    [row] = _run(spark, "sql_script_for_cursor_rollup", sf_small)
    assert row["n_regions"] == 5
    assert row["nations_total"] == 25
    from ai_dataingestion_spark.registry import register_views

    register_views(spark, sf_small)
    names = [r["r_name"] for r in spark.sql(
        "SELECT r_name FROM region ORDER BY r_regionkey").collect()]
    got_names = [part.rsplit(":", 1)[0]
                 for part in row["region_summary"].split(",")]
    assert got_names == names


def test_if_branch_dispatch_matches_probe(spark, sf_small, sf_oracle):
    """The taken branch must match the probe count's band at BOTH test
    scale factors: sf0.001 has 66 high-balance customers (mid band, the
    full-relation rollup), sf0.01 has 657 (high band, the segment-only
    rollup) — so this exercises two of the three branches for real."""
    from ai_dataingestion_spark.registry import register_views

    for sf, want in ((sf_small, "mid"), (sf_oracle, "high")):
        [row] = _run(spark, "sql_script_if_elseif_branch", sf)
        assert row["branch"] == want, (sf, row)
        register_views(spark, sf)
        if want == "high":
            [exp] = spark.sql(
                "SELECT count(*) AS n FROM customer WHERE c_acctbal > 5000"
            ).collect()
            assert row["n_cust"] == exp["n"] and row["avg_bal"] > 5000
        else:
            [exp] = spark.sql("SELECT count(*) AS n FROM customer").collect()
            assert row["n_cust"] == exp["n"]


def test_repeat_until_post_test_semantics(spark, sf_small):
    """REPEAT executes the body BEFORE the test: iters >= 1 always, the
    final count satisfies the UNTIL condition, and halving the final
    cutoff must NOT satisfy it (minimality of the doubling search) unless
    the loop stopped on its very first probe."""
    [row] = _run(spark, "sql_script_repeat_until_search", sf_small)
    assert row["iters"] >= 1
    assert row["n_above"] <= 100 or row["iters"] == 20
    if row["iters"] > 1 and row["iters"] < 20:
        from ai_dataingestion_spark.registry import register_views

        register_views(spark, sf_small)
        [prev] = spark.sql(
            f"SELECT count(*) AS n FROM orders "
            f"WHERE o_totalprice > {row['cutoff'] / 2}"
        ).collect()
        assert prev["n"] > 100  # the previous cutoff did not satisfy UNTIL


def test_exit_handler_is_condition_specific(spark, sf_small):
    """The handler catches TABLE_OR_VIEW_NOT_FOUND and falls back; a
    DIFFERENT error class (division by zero) must still surface — the
    handler must not have been widened to SQLEXCEPTION."""
    [row] = _run(spark, "sql_script_exit_handler_fallback", sf_small)
    assert row["status"] == "fallback"
    assert row["n_docs"] >= 0
    spark.conf.set("spark.sql.scripting.enabled", "true")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|not found"):
        spark.sql(
            """BEGIN
                 DECLARE status STRING DEFAULT 'primary';
                 scoped: BEGIN
                   DECLARE EXIT HANDLER FOR TABLE_OR_VIEW_NOT_FOUND
                     SET status = 'fallback';
                   SELECT 1 / 0;
                 END;
                 SELECT status AS status;
               END"""
        ).collect()


def test_execute_immediate_identifier_binding(spark, sf_small):
    """IDENTIFIER(?) binds the relation at plan time: the grouped result
    over the bound lineitem view equals the statically-spelled statement,
    column-for-column."""
    got = sorted(
        [tuple(r) for r in _run(
            spark, "sql_script_execute_immediate_params", sf_small)]
    )
    from ai_dataingestion_spark.registry import register_views

    register_views(spark, sf_small)
    exp = sorted(
        [tuple(r) for r in spark.sql(
            """SELECT l_returnflag AS flag, count(*) AS n,
                      coalesce(CAST(round(sum(l_extendedprice) * 100)
                                    AS BIGINT), 0) AS rev_cents
               FROM lineitem WHERE l_discount BETWEEN 0.02 AND 0.07
               GROUP BY l_returnflag"""
        ).collect()]
    )
    assert got == exp


def test_scripting_loop_statement_plans_push_down(spark, sf_small):
    """The scale contract: a loop-body probe statement must compile like a
    standalone query — the year predicate reaches the parquet scan as a
    pushed filter, the aggregate runs partial/final. Spot-checked on the
    WHILE op's body statement (scripts add no execution surface, so the
    body plan IS the operator's plan)."""
    from ai_dataingestion_spark.registry import register_views

    register_views(spark, sf_small)
    plan = spark.sql(
        "SELECT count(*) FROM orders WHERE year(o_orderdate) = 1995"
    )._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "PushedFilters" in plan or "Filter" in plan
