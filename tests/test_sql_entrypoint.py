"""EP2 (SURVEY.md §3.2): every relation is reachable through the SQL text
entry point — registry.register_views exposes the post-shim tables as temp
views, so SQL strings and DataFrame pipelines hit identical Catalyst plans."""

from __future__ import annotations

import pytest

from ai_dataingestion_spark.registry import TABLE_NAMES, register_views


@pytest.fixture(scope="module")
def views(spark, sf_small):
    register_views(spark, sf_small)
    return spark


def test_all_tables_visible_as_views(views, sf_small):
    for name in TABLE_NAMES:
        assert views.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n > 0


def test_sql_and_dataframe_agree(views, sf_small):
    """The same Q1-shaped aggregate through SQL text and through the
    DataFrame API must return identical rows (same analyzer, same plans)."""
    from ai_dataingestion_spark.catalog import queries

    sql_rows = sorted(
        views.sql(
            """
            SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP_NTZ '2000-12-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            """
        ).collect()
    )
    df_rows = sorted(
        queries()["agg_groupby"](views, sf_small)
        .selectExpr("l_returnflag", "l_linestatus", "count_order AS n")
        .collect()
    )
    assert sql_rows == df_rows


def test_events_view_carries_shim(views):
    """The events view must expose the post-shim TIMESTAMP_NTZ ts — SQL
    users never see the raw nanos long."""
    row = views.sql("SELECT typeof(ts) AS t FROM events LIMIT 1").collect()[0]
    assert row.t == "timestamp_ntz"
