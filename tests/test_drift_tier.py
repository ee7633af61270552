"""Schema-drift/evolution tier regression tests (round 10, VERDICT-r9 item 7).

A real lake table directory accumulates files written by different producer
versions: columns added, dropped, retyped. The engine's declared-schema read
(registry.load_table) must absorb all three — missing columns as NULL
blocks, extra columns pruned, narrowed physical types widened — and the
DuckDB oracle mirrors it with union_by_name + declared-column projection
(tests/parity.py, scripts/driver_sim.py).

This module rebuilds the drift corpus from sf0.001 via the SAME _parts()
transforms as scripts/drift_fixture.py and re-runs parity for operators
whose inputs are drifted plus direct read-semantics probes.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from ai_dataingestion_spark.catalog import all_specs
from ai_dataingestion_spark.registry import load_table
from tests.parity import compare, duckdb_connect

_SPEC = importlib.util.spec_from_file_location(
    "drift_fixture",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "drift_fixture.py"),
)
_drift = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_drift)

SPECS = all_specs()

# Operators over each drifted table family: the customer NULL block
# (missing c_mktsegment file), the orders/lineitem/part retyped columns,
# the documents extra/permuted file, the events missing-props file.
DRIFT_TIER_IDS = [
    "agg_groupby",              # lineitem l_quantity int32 file widens
    "tpch_q3_shipping_priority",  # customer.c_mktsegment NULL block
    "agg_top_groups",           # orders grouping over the retyped custkey
    "join_multiway",            # customer-orders-lineitem spine
    "part_brand_share",         # part p_retailprice float32 widening
    "fn_map",                   # events props NULL for half the rows
    "text_token_count",         # documents with permuted/extra-column file
    "quality_profile",          # per-column null/blank profile sees the block
    "scan_parquet",             # plain scan representative
]


@pytest.fixture(scope="module")
def drift_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("drift_sf0001"))
    src = "/root/testdata/sf0.001"
    for t in _drift.TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        parts = _drift._parts(t, tbl)
        dst = os.path.join(out, f"{t}.parquet")
        if parts is None:
            pq.write_table(tbl, dst)
        else:
            os.makedirs(dst)
            for i, p in enumerate(parts):
                pq.write_table(p, os.path.join(dst, f"part-{i:02d}.parquet"))
    return out


@pytest.fixture(scope="module")
def drift_con(drift_dir):
    c = duckdb_connect(drift_dir)
    yield c
    c.close()


def test_fixture_actually_drifted(drift_dir):
    import pyarrow.parquet as pq

    d = os.path.join(drift_dir, "customer.parquet")
    schemas = [
        set(pq.read_schema(os.path.join(d, f)).names)
        for f in sorted(os.listdir(d))
    ]
    assert len({frozenset(s) for s in schemas}) >= 3  # full / missing / extra


def test_declared_read_absorbs_drift(spark, drift_dir):
    """The engine-side read semantics the tier certifies, directly:
    row counts preserved, missing column NULL-blocked, extra column
    pruned, retyped columns widened to the declared type."""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    cust = load_table(spark, drift_dir, "customer")
    n_src = pq.read_metadata(os.path.join(src, "customer.parquet")).num_rows
    assert cust.count() == n_src
    assert "c_phone" not in cust.columns  # extra column pruned
    n_null = cust.filter(cust.c_mktsegment.isNull()).count()
    assert n_null >= int(n_src * 0.25)  # the dropped-column file block
    li = load_table(spark, drift_dir, "lineitem")
    assert dict(li.dtypes)["l_quantity"] == "double"  # int32 file widened


def test_narrowing_drift_fails_loud(spark, tmp_path):
    """The drift classes the tier ships are all WIDENING (file narrower
    than the declared schema). The opposite — a file carrying values a
    narrower declared type can't hold — must fail LOUDLY on both engines,
    never silently truncate (probed round 10: Spark raises on the read,
    DuckDB raises ConversionException on the cast)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import IntegerType, StructField, StructType

    d = str(tmp_path / "t.parquet")
    os.makedirs(d)
    pq.write_table(
        pa.table({"a": pa.array([1, 2], pa.int32())}), d + "/f0.parquet"
    )
    pq.write_table(
        pa.table({"a": pa.array([2**40, 5], pa.int64())}), d + "/f1.parquet"
    )
    schema = StructType([StructField("a", IntegerType())])
    with pytest.raises(Exception):
        spark.read.schema(schema).parquet(d).collect()


@pytest.mark.parametrize("qid", DRIFT_TIER_IDS)
def test_drift_tier_parity(qid, spark, drift_dir, drift_con):
    spec = SPECS[qid]
    df = spec.fn(spark, drift_dir)
    report = compare(df, drift_con, spec.oracle)
    assert report["ok"], f"{qid}: {report}"
