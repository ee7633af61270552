"""Focused tests for the round-16 optimization restructures (the round's
rule: an optimization that changes an operator's internals adds a test
pinning the equivalence or the new plan property).

Covers:
- scale.basket_pair_explode == the naive distinct+self-join pair multiset
  (incl. NULL keys/items, duplicate items, singleton baskets, mega basket);
- embed_kmeans_iterations' min_by argmin == the row_number window argmin
  it replaced (incl. whole-NULL vectors and the cid tie-break);
- the vectorized multimodal pool kernel == a row-at-a-time reference
  (incl. 0/1-byte payloads and n < cells);
- cache pins: agg_count_min_topk's sketch and graph_pagerank_trade's edge
  aggregate are InMemoryTableScan-backed (the single-corpus-pass property).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window, functions as F

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()


def test_basket_pair_explode_matches_naive_self_join(spark):
    from ai_dataingestion_spark.scale import basket_pair_explode

    rows = [
        # basket 1: plain 3-item basket (with a duplicate item row)
        (1, 10), (1, 20), (1, 30), (1, 20),
        # basket 2: singleton -> no pairs
        (2, 99),
        # basket 3: NULL item must be ignored; NULL basket key dropped
        (3, 7), (3, None), (3, 9),
        (None, 1), (None, 2),
        # basket 4: mega basket (64 items -> 2016 pairs in one task)
        *[(4, i) for i in range(64)],
    ]
    df = spark.createDataFrame(rows, "bk bigint, item bigint")

    got = sorted(
        (r["id1"], r["id2"])
        for r in basket_pair_explode(df, "bk", "item").collect()
    )

    dedup = df.select("bk", "item").distinct()
    a = dedup.select(F.col("bk").alias("k"), F.col("item").alias("id1"))
    b = dedup.select(F.col("bk").alias("k"), F.col("item").alias("id2"))
    naive = sorted(
        (r["id1"], r["id2"])
        for r in a.join(b, "k")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .collect()
    )
    assert got == naive
    assert len(got) == 3 + 1 + (64 * 63) // 2  # C(3,2) + C(2,2->1) + C(64,2)


def test_bounded_self_join_carry_projects_key_columns(spark):
    """r16: the `carry` param must project the named join-key columns into
    the pair output without changing the pair set — the fused band-tuning
    shape recovers its configuration id this way."""
    from ai_dataingestion_spark.scale import bounded_self_join

    df = spark.createDataFrame(
        [(1, 7, 10), (1, 7, 20), (2, 7, 30), (2, 7, 40), (1, 8, 10)],
        "cfg bigint, bkt bigint, id bigint",
    )
    got = sorted(
        (r["cfg"], r["id1"], r["id2"])
        for r in bounded_self_join(
            df, ["cfg", "bkt"], "id", "/nonexistent", "none", carry=["cfg"]
        ).collect()
    )
    assert got == [(1, 10, 20), (2, 30, 40)]
    # without carry: identical pair set, no extra columns
    plain = bounded_self_join(df, ["cfg", "bkt"], "id", "/nonexistent", "none")
    assert plain.columns == ["id1", "id2"]
    assert sorted((r["id1"], r["id2"]) for r in plain.collect()) == [
        (10, 20), (30, 40)
    ]


def test_kmeans_minby_argmin_matches_window_argmin(spark):
    """Semantic pin for the r16 kmeans argmin analysis: the (dist, cid)
    lexicographic min_by picks the same (vec, cid) assignment as the
    row_number window — including whole-NULL vectors (every candidate dist
    NULL -> cid tie-break) and exact dist ties. The min_by formulation was
    prototyped and REVERTED on measurement (SortAggregate fallback — see
    OPTIMIZATION_r16.md §3); this test records why the prototype was
    value-safe, and guards the tie/NULL ordering claim the operator's
    docstring relies on."""
    rows = [
        # vec 1: distinct dists
        (1, 0, 5.0), (1, 1, 2.0), (1, 2, 9.0),
        # vec 2: tie on dist -> cid tie-break
        (2, 0, 3.0), (2, 1, 3.0), (2, 2, 7.0),
        # vec 3: whole-NULL vector -> every dist NULL -> cid 0
        (3, 0, None), (3, 1, None), (3, 2, None),
    ]
    d = spark.createDataFrame(rows, "vec_id bigint, cid bigint, dist double")

    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    via_window = {
        r["vec_id"]: r["cid"]
        for r in d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    via_min_by = {
        r["vec_id"]: r["b"]["cid"]
        for r in d.groupBy("vec_id")
        .agg(F.min_by(F.struct("cid"), F.struct("dist", "cid")).alias("b"))
        .collect()
    }
    assert via_min_by == via_window == {1: 1, 2: 0, 3: 0}


def test_pool_kernel_vectorized_matches_reference():
    """_pool_batches (vectorized r16) must emit byte-identical rows to the
    row-at-a-time reference it replaced, across edge payload sizes."""
    import numpy as np

    from ai_dataingestion_spark.ai.multimodal import _RESIZE_CELLS, _pool_batches

    rng = np.random.default_rng(7)
    payloads = [
        rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        for n in (0, 1, 5, 15, 16, 17, 4096, 333)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(payloads)), "payload": payloads})

    got = pd.concat(list(_pool_batches(iter([pdf])))).reset_index(drop=True)

    ref_rows = []
    for d, buf in zip(pdf["doc_id"], pdf["payload"]):
        b = np.frombuffer(buf, dtype=np.uint8).astype(np.int64)
        n = len(b)
        bounds = [(c * n) // _RESIZE_CELLS for c in range(_RESIZE_CELLS + 1)]
        for c in range(_RESIZE_CELLS):
            lo, hi = bounds[c], bounds[c + 1]
            ref_rows.append((int(d), c, hi - lo, int(b[lo:hi].sum())))
    ref = pd.DataFrame(
        ref_rows, columns=["doc_id", "cell", "cell_n", "byte_sum"]
    )
    assert got.astype("int64").values.tolist() == ref.values.tolist()


@pytest.mark.parametrize(
    "qid", ["agg_count_min_topk", "graph_pagerank_trade"]
)
def test_r16_single_corpus_pass_caches(spark, sf_small, qid):
    """The r16 restructures pin their single-corpus-pass property on the
    op_cache'd intermediate: the executed plan must read the sketch / edge
    aggregate from an InMemoryTableScan instead of re-deriving it from the
    corpus per reference."""
    df = SPECS[qid].fn(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, qid
