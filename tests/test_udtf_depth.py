"""Semantic tests for the round-12 UDTF-depth block (udf/udtf_depth.py) —
the properties the oracle-parity hash can't see: schema POLYMORPHISM across
call sites, the per-partition instance-lifecycle contract, and NULL-key
partition behavior."""

from __future__ import annotations

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()


def test_analyze_schema_is_polymorphic_in_k(spark, sf_small):
    """The same word_cols UDTF called with k=2 and k=5 must plan two
    DIFFERENT output schemas — the whole point of analyze(); a static
    returnType cannot do this."""
    # registering the op also registers the SQL function word_cols_udtf
    SPECS["udtf_analyze_word_cols"].fn(spark, sf_small)
    two = spark.sql(
        "SELECT t.* FROM documents d, LATERAL word_cols_udtf(d.text, 2) t "
        "WHERE d.doc_id = 0"
    )
    five = spark.sql(
        "SELECT t.* FROM documents d, LATERAL word_cols_udtf(d.text, 5) t "
        "WHERE d.doc_id = 0"
    )
    assert two.columns == ["w1", "w2"]
    assert five.columns == ["w1", "w2", "w3", "w4", "w5"]
    row = five.collect()[0]
    assert row["w1"] is not None  # doc 0 has text; first token exists


def test_analyze_passthrough_mirrors_any_table(spark, sf_small):
    """analyze() over a TABLE argument reads the input's StructType, so the
    SAME function works unchanged on a table it has never seen — here
    region (2 cols) after registering against nation (3 cols)."""
    SPECS["udtf_analyze_passthrough"].fn(spark, sf_small)
    out = spark.sql("SELECT * FROM with_non_null_count_udtf(TABLE(region))")
    assert out.columns == ["r_regionkey", "r_name", "n_set"]
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["n_set"] == 2 for r in rows)  # region has no NULLs


def test_partition_stats_one_row_per_user(spark, sf_small):
    """PARTITION BY user_id => terminate() fires exactly once per distinct
    key: output keys are unique and cover every non-null user."""
    out = SPECS["udtf_table_partition_stats"].fn(spark, sf_small).collect()
    uids = [r["user_id"] for r in out]
    assert len(uids) == len(set(uids))
    expected = (
        spark.sql("SELECT count(DISTINCT user_id) AS n FROM events "
                  "WHERE user_id IS NOT NULL AND ts IS NOT NULL")
        .collect()[0]["n"]
    )
    assert len(uids) == expected
    assert all(r["n_events"] >= 1 and r["first_type"] is not None for r in out)


def test_self_partition_counts_match_groupby(spark, sf_small):
    """The analyze()-requested partitionBy must produce exactly the groupBy
    relation — count per event_type, including totals that sum to the
    table's row count."""
    out = {r["event_type"]: r["n_events"]
           for r in SPECS["udtf_self_partition_counts"].fn(spark, sf_small).collect()}
    ref = {r["event_type"]: r["n"]
           for r in spark.sql("SELECT event_type, count(*) AS n FROM events "
                              "GROUP BY event_type").collect()}
    assert out == ref
