"""§2.AH round-14 block: column-level CSV functions (from_csv /
schema_of_csv / to_csv) — the delimited twin of the §2.AE XML block.

CSV-as-a-column is the other embedded wire format a 100 TB ingest meets
(a delimited payload field inside a Kafka value or log line). Same test
architecture as xml_depth.py: byte-exact round-trip with an intactness
count, an options-exercising parse of hand-assembled lines, and literal
inference pins.

The round-trip contract needed three option fixes, each found by probing
hostile strings BEFORE registering (the XML block's nulls-tier lesson,
applied proactively):

- to_csv TRIMS field whitespace by default (write-side
  ignoreLeading/TrailingWhiteSpace default TRUE — unlike the read side),
  collapsing padded and whitespace-only payloads → both set false;
- the default wire conflates '' and NULL (both write as the empty field)
  → nullValue '\\N' sentinel on both sides keeps them distinct;
- a LITERAL '\\N' payload is then indistinguishable from the sentinel on
  the wire (fundamental CSV ambiguity, not an option bug) → quarantined
  symmetrically on both engines.

Scale posture: JVM expressions in the scan's codegen stage; zero extra
passes, zero Python — identical to the XML block's posture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables

_WRITE_OPTS = {
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "nullValue": "\\N",
}
_READ_OPTS = {"nullValue": "\\N"}


@register(
    "fn_csv_roundtrip_struct",
    oracle=r"""
SELECT lang,
       count(*) AS n_docs,
       count(*) AS n_text_intact,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
WHERE text IS DISTINCT FROM '\N'
GROUP BY lang
""",
)
def fn_csv_roundtrip_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_csv(struct(...)) then from_csv back over documents, aggregated
    by the PARSED fields with an intactness count the oracle pins to
    n_docs — quoting (embedded commas, quotes, newlines), padding, empty
    strings, and NULLs must all survive the delimited wire. Rows whose
    text EQUALS the null sentinel are quarantined symmetrically (see
    module docstring: on-wire ambiguity by construction)."""
    t = Tables(spark, sf_dir)
    ddl = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    parsed = (
        t.documents.filter(
            ~F.col("text").eqNullSafe(F.lit("\\N"))
        )
        .withColumn(
            "csv",
            F.to_csv(
                F.struct("doc_id", "text", "lang", "source", "n_chars"),
                _WRITE_OPTS,
            ),
        )
        .withColumn("back", F.from_csv("csv", F.lit(ddl), _READ_OPTS))
    )
    return parsed.groupBy(F.col("back.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("back.text").eqNullSafe(F.col("text")), 1).otherwise(0)
        ).cast("bigint").alias("n_text_intact"),
        F.sum("back.n_chars").cast("bigint").alias("sum_chars"),
        F.countDistinct("back.source").alias("n_sources"),
    )


@register(
    "fn_from_csv_delimiter_options",
    oracle="""
SELECT o_orderstatus AS status,
       count(*) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
FROM orders
WHERE o_orderstatus NOT LIKE '%|%' AND o_orderstatus NOT LIKE '%''%'
GROUP BY o_orderstatus
""",
)
def fn_from_csv_delimiter_options(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pipe-delimited, single-quote-quoted lines assembled per orders row
    and parsed with from_csv's sep/quote options — the legacy-feed dialect
    case (real delimited feeds are rarely vanilla CSV). Rows whose status
    contains the dialect's delimiter or quote are quarantined
    symmetrically; the parse then re-derives the aggregate the oracle
    computes from the raw columns. Assembly uses concat over
    coalesce-to-'' components, NOT concat_ws: concat_ws SKIPS null
    components, silently shifting every later field one position left
    (found by the combined tier — a NULL o_custkey pushed status into the
    ckey slot and minted a phantom NULL-status group); an empty field
    keeps the position and parses back to NULL for the numeric columns,
    which the null-excluding aggregates treat exactly as the oracle
    does."""
    t = Tables(spark, sf_dir)
    clean = t.orders.filter(
        ~F.col("o_orderstatus").rlike("[|']")
    )
    line = F.concat(
        F.coalesce(F.col("o_orderkey").cast("string"), F.lit("")),
        F.lit("|"),
        F.coalesce(F.col("o_custkey").cast("string"), F.lit("")),
        F.lit("|"),
        F.col("o_orderstatus"),
    )
    ddl = "okey bigint, ckey bigint, status string"
    parsed = clean.select(
        F.from_csv(line, F.lit(ddl), {"sep": "|", "quote": "'"}).alias("p")
    )
    return parsed.groupBy(F.col("p.status").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p.okey").cast("bigint").alias("sum_keys"),
        F.countDistinct("p.ckey").alias("n_custs"),
    )


_CSV_SAMPLES = (
    ("scalars", "1,a,1.5"),
    ("quoted_comma", '1,"a,b",2'),
    ("empty_fields", "1,,3"),
)


@register(
    "fn_schema_of_csv_inventory",
    oracle="""
SELECT * FROM (VALUES
  ('scalars', 'STRUCT<_c0: INT, _c1: STRING, _c2: DOUBLE>'),
  ('quoted_comma', 'STRUCT<_c0: INT, _c1: STRING, _c2: INT>'),
  ('empty_fields', 'STRUCT<_c0: INT, _c1: STRING, _c2: INT>')
) AS v(shape, inferred_ddl)
""",
)
def fn_schema_of_csv_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema_of_csv inference pins on the shapes that decide a feed
    onboarding: scalar typing (INT/STRING/DOUBLE), quoted-delimiter fields
    (the quote must not split the column count), and empty fields
    (positional STRING, not dropped). Literal oracle — an inference shift
    across Spark versions fails loudly. Foldable input by API contract, so
    a 3-row driver-side relation."""
    out = None
    for shape, sample in _CSV_SAMPLES:
        one = spark.range(1).select(
            F.lit(shape).alias("shape"),
            F.schema_of_csv(F.lit(sample)).alias("inferred_ddl"),
        )
        out = one if out is None else out.unionByName(one)
    return out
