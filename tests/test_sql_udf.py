"""Semantic/plan tests for the round-13 SQL-UDF block
(operators/sql_udf.py) — the inlining contract: a SQL UDF must cost
NOTHING at runtime (no Python eval, predicates still pushed, laterals
de-correlated to joins)."""

from __future__ import annotations

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()


def _plan(spark, name, sf):
    df = SPECS[name].fn(spark, sf)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scalar_sql_udf_is_not_python(spark, sf_small):
    """The scalar SQL UDF must inline to an expression — no EvalPython /
    ArrowEvalPython node (the defining contrast with §2.J udf_python),
    and the aggregate still runs as a partial/final HashAggregate pair."""
    plan = _plan(spark, "sql_udf_scalar_inline", sf_small)
    assert "EvalPython" not in plan, plan
    assert "HashAggregate" in plan


def test_tvf_threshold_filter_reaches_scan(spark, sf_small):
    """The TVF wrapper must be pushdown-transparent: the threshold
    predicate appears as a pushed filter on the orders scan, not as a
    post-materialization Filter over the whole table."""
    plan = _plan(spark, "sql_udf_table_parameterized", sf_small)
    assert "PushedFilters" in plan
    assert "GreaterThan(o_totalprice,300000.0)" in plan.replace(" ", ""), plan


def test_lateral_tvf_decorrelates_to_a_join(spark, sf_small):
    """LATERAL graft_nations_of(r.r_regionkey) must compile to an equi-join
    (broadcast at this dimension size) — never a per-row nested loop and
    never a Python UDTF node."""
    plan = _plan(spark, "sql_udf_lateral_correlated", sf_small)
    assert "BatchEvalPythonUDTF" not in plan
    assert "Join" in plan, plan


def test_default_param_and_override_agree_with_closed_form(spark, sf_small):
    """The DEFAULT call site (pct=0.05) and the positional override (0.5)
    must both band like the closed-form arithmetic."""
    from ai_dataingestion_spark.registry import register_views

    rows = SPECS["sql_udf_default_composed"].fn(spark, sf_small).collect()
    register_views(spark, sf_small)
    exp = spark.sql(
        """SELECT CASE WHEN o_totalprice IS NULL THEN 'unknown'
                       WHEN o_totalprice * 1.05 < 50000 THEN 'lo'
                       WHEN o_totalprice * 1.05 < 200000 THEN 'mid'
                       ELSE 'hi' END AS band_default,
                  CASE WHEN o_totalprice IS NULL THEN 'unknown'
                       WHEN o_totalprice * 1.5 < 50000 THEN 'lo'
                       WHEN o_totalprice * 1.5 < 200000 THEN 'mid'
                       ELSE 'hi' END AS band_boosted,
                  count(*) AS n
           FROM orders GROUP BY 1, 2"""
    ).collect()
    key = lambda r: (r["band_default"], r["band_boosted"])  # noqa: E731
    assert {key(r): r["n"] for r in rows} == {key(r): r["n"] for r in exp}
