"""Multi-file directory-layout tier regression tests (round 9).

The driver corpus is one single-row-group parquet FILE per table; a real
lake is a DIRECTORY of part files. The full layout-tier sweep
(scripts/layout_fixture.py: every table rewritten as 4 row-split part
files) passed 444+4/0 on first run — the surface is layout-agnostic —
and this module keeps it that way by re-running parity for the operators
whose implementations actually touch the physical layout (footer audits,
file-count reports, compaction planning, partition-invariance proofs)
plus a plain scan representative, against a directory-layout corpus
rebuilt from sf0.001.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from ai_dataingestion_spark.catalog import all_specs
from tests.parity import compare, duckdb_connect

_SPEC = importlib.util.spec_from_file_location(
    "layout_fixture",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "layout_fixture.py"),
)
_lay = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_lay)

SPECS = all_specs()

LAYOUT_TIER_IDS = [
    "scan_parquet", "scan_parquet_footer_audit", "sink_file_layout_audit",
    "catalog_table_stats", "pipeline_compaction_planner",
    "dedup_partition_invariance", "agg_partial_merge_proof",
    "quality_table_fingerprint",
]


@pytest.fixture(scope="module")
def layout_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("layout_sf0001"))
    src = "/root/testdata/sf0.001"
    for t in _lay.TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        dst = os.path.join(out, f"{t}.parquet")
        os.makedirs(dst, exist_ok=True)
        n = tbl.num_rows
        step = max(1, -(-n // _lay.N_FILES))
        for i, lo in enumerate(range(0, max(n, 1), step)):
            part = tbl.slice(lo, step)
            if part.num_rows == 0 and n > 0:
                break
            pq.write_table(part, os.path.join(dst, f"part-{i:05d}.parquet"))
    return out


@pytest.fixture(scope="module")
def layout_con(layout_dir):
    c = duckdb_connect(layout_dir)
    yield c
    c.close()


def test_fixture_actually_multifile(layout_dir):
    parts = os.listdir(os.path.join(layout_dir, "orders.parquet"))
    assert len([p for p in parts if p.endswith(".parquet")]) >= 2


@pytest.mark.parametrize("qid", LAYOUT_TIER_IDS)
def test_layout_tier_parity(qid, spark, layout_dir, layout_con):
    spec = SPECS[qid]
    df = spec.fn(spark, layout_dir)
    report = compare(df, layout_con, spec.oracle)
    assert report["ok"], f"{qid}: {report}"
