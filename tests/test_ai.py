"""Semantic checks for rows-only AI operators — the properties the DuckDB
oracle can't express (SURVEY.md §5.3 tier 1/3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_dataingestion_spark.catalog import all_specs

SPECS = all_specs()


def test_minhash_finds_injected_near_dups(spark, sf_small):
    """Every injected near-dup pair (id, id+1e6 for id%5==0) has Jaccard
    ≈ (n-3)/n ≥ 0.9 for docs ≥ 30 tokens; MinHash-LSH with 8 bands x 4 rows
    catches J≥0.9 pairs with prob ≥ 1-(1-0.9^4)^8 ≈ 0.96 each. Require ≥90%
    recall of the exact-Jaccard result (which is oracle-verified)."""
    mh = {
        (r.id1, r.id2)
        for r in SPECS["dedup_near_minhash"].fn(spark, sf_small).collect()
    }
    exact = {
        (r.id1, r.id2)
        for r in SPECS["dedup_ngram_jaccard"]
        .fn(spark, sf_small)
        .filter(F.col("jaccard") >= 0.6)
        .collect()
    }
    assert exact, "exact near-dup baseline unexpectedly empty"
    recall = len(mh & exact) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall:.2f} vs exact baseline"


def test_simhash_finds_exact_dups(spark, sf_small):
    """Injected exact copies have hamming distance 0 — all must be found."""
    rows = SPECS["dedup_simhash"].fn(spark, sf_small).collect()
    found = {(r.id1, r.id2) for r in rows if r.hamming == 0}
    injected = {
        (i, i + 1_000_000)
        for i in range(0, 500, 2)
    }
    missing = injected - found
    assert not missing, f"simhash missed {len(missing)} exact-dup pairs"


def test_ann_lsh_recall_vs_brute_force(spark, sf_small):
    """LSH ANN with 6 hyperplanes keeps each probe in one of 64 buckets;
    recall vs brute-force top-5 is imperfect by design but must be
    meaningfully better than random (>= 20% overlap overall), and every
    reported neighbor must share the probe's bucket semantics (cos in
    [-1, 1], k <= 5)."""
    ann = SPECS["sim_ann_lsh"].fn(spark, sf_small).collect()
    brute = SPECS["sim_cosine_topk"].fn(spark, sf_small).collect()
    ann_pairs = {(r.probe_id, r.neighbor_id) for r in ann}
    brute_pairs = {(r.probe_id, r.neighbor_id) for r in brute}
    assert all(-1.0 <= r.cos <= 1.0 for r in ann)
    per_probe = {}
    for p, _ in ann_pairs:
        per_probe[p] = per_probe.get(p, 0) + 1
    assert all(v <= 5 for v in per_probe.values())
    recall = len(ann_pairs & brute_pairs) / len(brute_pairs)
    assert recall >= 0.2, f"ANN recall {recall:.2f} suspiciously low"


def test_approx_distinct_error_bound(spark, sf_small):
    """approx_count_distinct(rsd=0.02) must be within 5% of exact — the
    query now asserts this itself via the hll_within_tol column, and the
    exact_users column must equal an independent exact recount."""
    rows = {
        r.event_type: r
        for r in SPECS["agg_approx_distinct"].fn(spark, sf_small).collect()
    }
    from ai_dataingestion_spark.registry import load_table

    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, ex in exact.items():
        assert rows[et].exact_users == ex, (et, rows[et].exact_users, ex)
        assert rows[et].hll_within_tol, (et, ex)


def test_fingerprint_matches_for_exact_dup_docs(spark, sf_small):
    """Identical texts must produce identical fingerprints (determinism)."""
    df = SPECS["text_fingerprint"].fn(spark, sf_small)
    one = df.limit(1).collect()[0]
    again = df.filter(F.col("doc_id") == one.doc_id).collect()[0]
    assert one.fingerprint == again.fingerprint
    # comma-joined scalar (the agg_collect rule): 4 sorted 60-bit hashes
    hashes = [int(h) for h in one.fingerprint.split(",")]
    assert len(hashes) == 4
    assert hashes == sorted(hashes)


def test_ivf_recall_vs_brute_force(spark, sf_small):
    """IVF with nprobe=4 of 16 centroids searches 1/4 of the corpus per
    probe; recall vs brute-force top-5 must beat random scanning (>= 30%)
    and respect k<=5 per probe."""
    ivf = SPECS["sim_ann_ivf"].fn(spark, sf_small).collect()
    brute = SPECS["sim_cosine_topk"].fn(spark, sf_small).collect()
    ivf_pairs = {(r.probe_id, r.neighbor_id) for r in ivf}
    brute_pairs = {(r.probe_id, r.neighbor_id) for r in brute}
    per_probe = {}
    for p, _ in ivf_pairs:
        per_probe[p] = per_probe.get(p, 0) + 1
    assert all(v <= 5 for v in per_probe.values())
    recall = len(ivf_pairs & brute_pairs) / len(brute_pairs)
    assert recall >= 0.3, f"IVF recall {recall:.2f}"


def test_probe_cache_invalidated_on_regenerated_parquet(spark, sf_small, tmp_path):
    """_probe_matrix memoizes per (sf_dir, mtime): rewriting the embeddings
    parquet under the same path must drop the memo and return the new
    probes, not the stale matrix."""
    import shutil
    import time

    import numpy as np

    from ai_dataingestion_spark.ai.similarity import _probe_matrix

    sf = str(tmp_path)
    shutil.copy(f"{sf_small.rstrip('/')}/embeddings.parquet",
                f"{sf}/embeddings.parquet")
    pids1, P1 = _probe_matrix(spark, sf)

    # regenerate: same path, negated vectors (mtime strictly newer)
    from ai_dataingestion_spark.registry import load_table
    from pyspark.sql import functions as F

    flipped = load_table(spark, sf_small, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        "label",
    ).toPandas()
    time.sleep(0.05)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(flipped), f"{sf}/embeddings.parquet")

    pids2, P2 = _probe_matrix(spark, sf)
    assert (pids1 == pids2).all()
    assert np.allclose(P1, -P2)  # stale memo would return P1 again


def test_pair_dedup_lsh_recall_at_bench_scale(spark):
    """VERDICT r4 item 7: the LSH-bucket-blocked SemDeDup variant must
    reproduce the label-blocked ground truth at sf0.1 — the scale where the
    bench runs. Exact copies share every bucket, so recall must be 1.0 and
    (on this corpus, where every >= 0.99 pair IS an exact copy) the pair
    sets must coincide exactly."""
    sf_bench = "/root/testdata/sf0.1"
    truth = {
        (r.id1, r.id2)
        for r in SPECS["sim_pair_dedup"].fn(spark, sf_bench).collect()
    }
    got = {
        (r.id1, r.id2)
        for r in SPECS["sim_pair_dedup_lsh"].fn(spark, sf_bench).collect()
    }
    assert truth, "label-blocked ground truth unexpectedly empty"
    recall = len(got & truth) / len(truth)
    assert recall == 1.0, f"bucket-blocked recall {recall:.3f} < 1.0"
    assert got == truth, f"extra pairs beyond ground truth: {got - truth}"


def test_ann_lsh_selective_on_clustered_corpus(spark, tmp_path):
    """VERDICT r7 item 5: the uniform corpus cannot demonstrate sublinear
    candidate generation (recall stays high even if bucketing silently
    admits most of the corpus). On the deterministic 10-Gaussian-cluster
    fixture the adaptive multiprobe must drop to exact buckets: recall@5
    >= 0.95 at candidate fraction <= 0.15 — a selectivity regression (or a
    depth-adaptation regression) fails here, not in production."""
    from ai_dataingestion_spark.ai.ann_calibration import (
        measure_lsh_on_clustered,
    )

    m = measure_lsh_on_clustered(spark, str(tmp_path / "clustered"))
    assert m["recall_at_5"] >= 0.95, m
    assert m["corpus_fraction"] <= 0.15, m


def test_adaptive_multiprobe_keeps_depth_2_on_uniform_corpus(spark, sf_small):
    """The uniform synthetic corpus (top-5 cos ~ 0.33-0.45) genuinely needs
    Hamming-<=2 probing for the recall target — the adaptive depth must NOT
    regress it (recall@5 would fall from ~0.9 to ~0.1 at depth 0)."""
    from ai_dataingestion_spark.ai.similarity import _adaptive_multiprobe_dist

    assert _adaptive_multiprobe_dist(spark, sf_small) == 2
