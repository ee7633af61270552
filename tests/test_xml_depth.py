"""Semantic tests for the round-14 XML column-function block
(functions/xml_depth.py) and the §2.X DESCRIBE/SHOW completion — the
properties the oracle hash doesn't isolate: entity escaping round-trips
byte-exactly, the parse path stays JVM-side, and the DESCRIBE shred
excludes the volatile document fields by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()


def test_xml_roundtrip_escapes_hostile_strings(spark):
    """The characters XML must escape (&, <, >, quotes) plus multi-script
    text round-trip to_xml -> from_xml byte-exactly — the property the
    clean corpus exercises weakly and the unicode tier only samples."""
    hostile = [
        (1, 'a&b<c>d"e'), (2, "&amp; already-escaped"), (3, "<tag></tag>"),
        (4, "müller-北京-Ωμέγα"), (5, ""), (6, None),
        # whitespace-only / padded content: the parser default TRIMS these
        # (the nulls-tier defect this block's sweep caught); the op's
        # ignoreSurroundingSpaces=false contract must preserve them
        (7, "  \t \n "), (8, "  padded  "),
    ]
    df = spark.createDataFrame(hostile, "id bigint, s string")
    back = df.select(
        "id", "s",
        F.from_xml(
            F.to_xml(F.struct("id", "s")), "id bigint, s string",
            {"ignoreSurroundingSpaces": "false"},
        ).alias("p"),
    )
    bad = back.filter(~F.col("p.s").eqNullSafe(F.col("s"))).collect()
    assert bad == [], bad


def test_xml_ops_stay_jvm_side(spark, sf_small):
    """from_xml/to_xml are JVM expressions: no EvalPython node may appear
    in either XML op's plan (the parse rides the scan's codegen stage)."""
    for qid in ("fn_xml_roundtrip_struct", "fn_from_xml_attributes"):
        df = SPECS[qid].fn(spark, sf_small)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, (qid, plan)


def test_describe_shred_excludes_volatile_fields(spark, sf_small):
    """The DESCRIBE-AS-JSON shred must project ONLY the stable contract
    columns — a created_time/owner leak would make the op
    nondeterministic across sessions (the defect class the projection
    exists to prevent)."""
    df = SPECS["catalog_describe_json_columns"].fn(spark, sf_small)
    assert df.columns == [
        "table_name", "ordinal", "column_name", "type_name", "nullable"
    ]
    # determinism across two builds in one session (created_time moves
    # between view re-registrations; the shred must not see it)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, SPECS["catalog_describe_json_columns"].fn(
        spark, sf_small).collect()))
    assert a == b
