"""Semantic tests for the round-13 catalog-metadata block
(operators/catalog_meta.py): live-catalog vs declared-schema pins the
oracle hash already covers value-wise; here we pin the properties around
it — shim visibility, metadata-only cost shape, and census arithmetic."""

from __future__ import annotations

from ai_dataingestion_spark.catalog import all_specs
from ai_dataingestion_spark.registry import SCHEMAS, TABLE_NAMES

SPECS = all_specs()


def test_inventory_surfaces_the_ts_shim(spark, sf_small):
    """The events loader's nanos→timestamp shim must surface in the LIVE
    catalog as timestamp_ntz — the inventory is the place a silently
    dropped shim (raw bigint ts) would show first."""
    rows = SPECS["catalog_meta_columns_inventory"].fn(spark, sf_small).collect()
    ts = [r for r in rows
          if r["table_name"] == "events" and r["column_name"] == "ts"]
    assert len(ts) == 1 and ts[0]["data_type"] == "timestamp_ntz"
    emb = [r for r in rows if r["table_name"] == "embeddings"
           and r["column_name"] == "embedding"]
    assert emb[0]["data_type"] == "array<float>"


def test_inventory_covers_every_declared_column_once(spark, sf_small):
    rows = SPECS["catalog_meta_columns_inventory"].fn(spark, sf_small).collect()
    got = {(r["table_name"], r["column_name"], r["ordinal"]) for r in rows}
    want = {(t, f.name, i)
            for t in TABLE_NAMES for i, f in enumerate(SCHEMAS[t].fields)}
    assert got == want
    assert len(rows) == len(want)  # no duplicates


def test_profile_row_counts_match_direct_counts(spark, sf_small):
    from ai_dataingestion_spark.registry import load_table

    rows = {r["table_name"]: r for r in
            SPECS["catalog_meta_table_profile"].fn(spark, sf_small).collect()}
    assert set(rows) == set(TABLE_NAMES)
    for t in ("region", "events"):
        assert rows[t]["n_rows"] == load_table(spark, sf_small, t).count()
        assert rows[t]["n_columns"] == len(SCHEMAS[t].fields)


def test_census_sums_to_total_columns(spark, sf_small):
    rows = SPECS["catalog_meta_type_census"].fn(spark, sf_small).collect()
    total = sum(r["n_columns"] for r in rows)
    assert total == sum(len(SCHEMAS[t].fields) for t in TABLE_NAMES)
    by_type = {r["data_type"]: r for r in rows}
    # every table carries at least one string column and one bigint column
    assert by_type["string"]["n_tables"] >= 9
    assert by_type["bigint"]["n_tables"] >= 7
