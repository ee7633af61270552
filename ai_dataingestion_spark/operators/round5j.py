"""Round-5 tenth wave (SURVEY.md §2.Q, continued): LSH band/row tuning
sweep over the portable minhash signatures, bigram-PMI collocation
extraction, chunk-granularity inter-document duplication ratio
(MassiveText-style filter), a schema-evolution mergeSchema scan, and a
parquet compression-codec round-trip sink.

Deferred to the r6 driver window (catalog._DEFER_TO_NEXT_ROUND);
locally oracle-verified at sf0.01 + sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.registry import Tables
from ai_dataingestion_spark.tmpdirs import op_tmpdir
from ai_dataingestion_spark.ai.dedup import (
    _CW_A,
    _CW_B,
    _DUP_OFFSET,
    _MERSENNE_P,
    _SHINGLES_EXPR,
    _corpus_with_near_dups,
    _duck_h,
    _spark_h,
    N_HASHES,
    SHINGLE_K,
)


def _pround(col, dp: int = 6):
    """Portable IEEE rounding floor(x*10^dp + 0.5)/10^dp (see
    tpch_q2_min_cost_supplier for why built-in round() is not)."""
    scale = 10**dp
    return F.floor(col * scale + 0.5) / scale


# (bands, rows_per_band) sweep configs — all consume the same 32-value
# signature. r >= 2 keeps single-hash buckets (threshold 0.03, quadratic
# hot buckets) out of the sweep.
_TUNE_CONFIGS = [(16, 2), (8, 4), (4, 8), (2, 16)]


def _bucket_poly(prefix: str, band: int, r: int) -> str:
    """Polynomial band-bucket roll over r signature values (both SQL
    dialects): every intermediate stays < 2^62, overflow-free in both
    engines (the _minhash_band_bucket idiom, generalized over r)."""
    expr = str(band)
    for k in range(r):
        expr = f"(({expr}) * 31 + {prefix}{band * r + k}) % {_MERSENNE_P}"
    return f"CAST({expr} AS BIGINT)"


_SIG_CTES = f"""
corpus AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET},
         list_slice(string_split(text, ' '), 1, len(string_split(text, ' ')) - 1)
  FROM documents WHERE doc_id % 5 = 0
),
shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - {SHINGLE_K - 2}, 2)),
           i -> array_to_string(list_slice(toks, i, i + {SHINGLE_K - 1}), ' ')
         )) AS shingles
  FROM corpus
),
sp AS (SELECT doc_id, {_duck_h("shingle")} % {_MERSENNE_P} AS hm
       FROM (SELECT doc_id, unnest(shingles) AS shingle FROM shingled)),
sig AS (
  SELECT doc_id,
         {", ".join("min((%d * hm + %d) %% %d) AS h%d" % (_CW_A[i], _CW_B[i], _MERSENNE_P, i) for i in range(N_HASHES))}
  FROM sp GROUP BY doc_id
)
"""


def _tune_config_sql(b: int, r: int) -> str:
    banded = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, {_bucket_poly('h', j, r)} AS bucket FROM sig"
        for j in range(b)
    )
    return f"""
SELECT {b} AS bands, {r} AS rows_per_band,
       floor(pow(1.0 / {b}, 1.0 / {r}) * 1000000 + 0.5) / 1000000
         AS threshold_50,
       (SELECT count(*) FROM (
          SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
          FROM ({banded}) a JOIN ({banded}) b2
            ON a.band = b2.band AND a.bucket = b2.bucket
               AND a.doc_id < b2.doc_id
       )) AS n_candidate_pairs
"""


@register(
    "dedup_lsh_band_tuning",
    oracle="WITH "
    + _SIG_CTES
    + "\n"
    + "\nUNION ALL\n".join(_tune_config_sql(b, r) for b, r in _TUNE_CONFIGS),
)
def dedup_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band/row tuning sweep (the S-curve knob of Broder-style
    near-dup detection): ONE 32-value Carter-Wegman signature relation,
    re-banded four ways — (16 bands × 2 rows) … (2 × 16) — reporting the
    theoretical 50%-collision threshold (1/b)^(1/r) next to the MEASURED
    distinct candidate-pair count per configuration. This is the
    introspection that turns the 0.6-threshold default of
    dedup_near_minhash into an informed choice: more bands → lower
    threshold → more candidates to verify. The signature build (the
    expensive shuffle) is shared and cached across all four configs;
    each config adds only a (band, bucket) equality self-join on
    signature-width rows. Single-hash bands (r=1) are excluded — their
    0.03 threshold makes hot buckets quadratic."""
    corpus = _corpus_with_near_dups(spark, sf_dir).withColumn(
        "toks", F.split("text", " ")
    )
    pairs = (
        corpus.select("doc_id", F.expr(_SHINGLES_EXPR).alias("shingles"))
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .select(
            "doc_id",
            F.expr(f"{_spark_h('shingle')} % {_MERSENNE_P}").alias("hm"),
        )
    )
    sig = pairs.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(_CW_A[i]) * F.col("hm") + F.lit(_CW_B[i]))
                % _MERSENNE_P
            ).alias(f"h{i}")
            for i in range(N_HASHES)
        ]
    ).cache()

    out = None
    for b, r in _TUNE_CONFIGS:
        band_cols = [
            F.struct(
                F.lit(j).alias("band"),
                F.expr(_bucket_poly("h", j, r)).alias("bucket"),
            )
            for j in range(b)
        ]
        banded = sig.select(
            "doc_id", F.explode(F.array(*band_cols)).alias("bb")
        ).select(
            "doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
        n_cand = (
            banded.alias("a")
            .join(banded.alias("b"), ["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id1"),
                F.col("b.doc_id").alias("id2"),
            )
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_candidate_pairs"))
            .select(
                F.lit(b).alias("bands"),
                F.lit(r).alias("rows_per_band"),
                _pround(F.lit((1.0 / b) ** (1.0 / r))).alias("threshold_50"),
                "n_candidate_pairs",
            )
        )
        out = n_cand if out is None else out.unionByName(n_cand)
    return out


@register(
    "text_collocation_pmi",
    oracle="""
WITH toks AS (
  SELECT t[i] AS w FROM
    (SELECT string_split(text, ' ') AS t FROM documents),
    unnest(generate_series(1, len(t))) g(i)
),
uni AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
n_uni AS (SELECT CAST(sum(c) AS DOUBLE) AS nu FROM uni),
big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c
  FROM (SELECT string_split(text, ' ') AS t FROM documents),
       unnest(generate_series(1, len(t) - 1)) g(i)
  GROUP BY t[i], t[i + 1]
),
n_big AS (SELECT CAST(sum(c) AS DOUBLE) AS nb FROM big),
scored AS (
  SELECT w1, w2, b.c AS n_pair,
         floor(ln((CAST(b.c AS DOUBLE) / nb)
                  / ((CAST(u1.c AS DOUBLE) / nu)
                     * (CAST(u2.c AS DOUBLE) / nu)))
               * 1000000 + 0.5) / 1000000 AS pmi
  FROM big b
  JOIN uni u1 ON b.w1 = u1.w
  JOIN uni u2 ON b.w2 = u2.w
  CROSS JOIN n_uni CROSS JOIN n_big
  WHERE b.c >= 5
)
SELECT w1, w2, n_pair, pmi
FROM (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn
      FROM scored)
WHERE rn <= 50
""",
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-50 adjacent-token pairs by pointwise
    mutual information ln(p(ab)/(p(a)p(b))) with a ≥5 occurrence floor —
    the classic multiword-expression detector (Church & Hanks 1990) that
    feeds tokenizer-vocabulary and stop-phrase decisions. Bigrams come
    from zip_with (map-side); unigram marginals join on token (vocab-
    sized, partial-aggregated before the shuffle); the two corpus
    totals are single-row broadcasts. PMI is portable-6dp-rounded
    BEFORE ranking with a (w1, w2) tiebreak, so the top-50 cut is
    deterministic cross-engine (the Q2 argmin-stability rule)."""
    d = Tables(spark, sf_dir).documents
    toks = F.split("text", " ")
    uni = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pair = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    big = (
        d.select(F.explode(pair).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 5)
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("nu"))
    n_big_all = (
        d.select(F.explode(pair).alias("p"))
        .agg(F.count(F.lit(1)).cast("double").alias("nb"))
    )
    pmi = F.log(
        (F.col("c").cast("double") / F.col("nb"))
        / (
            (F.col("u1c").cast("double") / F.col("nu"))
            * (F.col("u2c").cast("double") / F.col("nu"))
        )
    )
    scored = (
        big.join(
            uni.select(F.col("w").alias("w1"), F.col("c").alias("u1c")), "w1"
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("u2c")), "w2"
        )
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big_all))
        .select("w1", "w2", F.col("c").alias("n_pair"), _pround(pmi).alias("pmi"))
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("w1", "w2", "n_pair", "pmi")
    )


_CHUNK_W = 20


@register(
    "text_chunk_dup_ratio",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  UNION ALL
  SELECT doc_id + {_DUP_OFFSET}, string_split(text, ' ')
  FROM documents WHERE doc_id % 2 = 0
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(
           list_slice(toks, (i - 1) * {_CHUNK_W} + 1, i * {_CHUNK_W}), ' '
         )) AS chash
  FROM corpus,
       unnest(generate_series(
         1, CAST(ceil(len(toks) / {_CHUNK_W}.0) AS BIGINT))) g(i)
),
freq AS (
  SELECT chash, count(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY chash
),
per_doc AS (
  SELECT c.doc_id,
         count(*) AS n_chunks,
         CAST(sum(CASE WHEN f.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dup_chunks
  FROM chunks c JOIN freq f ON c.chash = f.chash
  GROUP BY c.doc_id
)
SELECT doc_id, n_chunks, dup_chunks,
       floor(CAST(dup_chunks AS DOUBLE) / n_chunks * 1000000 + 0.5)
         / 1000000 AS dup_ratio,
       CAST(CASE WHEN CAST(dup_chunks AS DOUBLE) / n_chunks >= 0.5
                 THEN 1 ELSE 0 END AS INT) AS is_mostly_duplicate
FROM per_doc
""",
)
def text_chunk_dup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity inter-document duplication (the MassiveText /
    Gopher "duplicate content fraction" filter, Rae 2021 §A1.2): split
    each doc into non-overlapping {W}-token chunks, hash each chunk, and
    score every doc by the fraction of its chunks that also appear in
    ANOTHER doc — catching partial-copy docs that document-level exact
    dedup misses and near-dup shingling prices quadratically. Exact
    copies of even-id docs are injected (the _corpus_with_exact_dups
    idiom) so recall is verifiable: injected copies score 1.0. Chunks
    shuffle as md5 hashes (never text); the chunk-frequency relation is
    hash-keyed and partial-aggregable — two shuffles total at any
    corpus size.""".replace("{W}", str(_CHUNK_W))
    d = Tables(spark, sf_dir).documents.select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"), "text"
    )
    corpus = d.unionByName(dups).withColumn("toks", F.split("text", " "))
    chunk_arr = F.expr(
        f"""transform(
              sequence(1, cast(ceil(size(toks) / {_CHUNK_W}.0) as bigint)),
              i -> md5(concat_ws(' ',
                     slice(toks, (i - 1) * {_CHUNK_W} + 1, {_CHUNK_W})))
            )"""
    )
    # chunks feeds both the frequency aggregate and the per-doc join.
    # Deliberately NOT cached: the relation is corpus-linear, and the 10x
    # sweep measured caching SLOWER (2.5 s vs 1.8 s) — materialization
    # costs more than re-running the cheap columnar scan+hash, and pinning
    # a corpus-sized relation is the wrong memory posture at lake scale.
    chunks = corpus.select(
        "doc_id", F.explode(chunk_arr).alias("chash")
    )
    freq = chunks.groupBy("chash").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    per_doc = (
        chunks.join(freq, "chash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_chunks"),
        )
    )
    ratio = F.col("dup_chunks").cast("double") / F.col("n_chunks")
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "dup_chunks",
        _pround(ratio).alias("dup_ratio"),
        F.when(ratio >= 0.5, 1).otherwise(0).cast("int").alias(
            "is_mostly_duplicate"
        ),
    )


@register(
    "scan_parquet_schema_merge",
    oracle="""
SELECT 'v1' AS src, count(*) AS n,
       CAST(count(*) AS BIGINT) AS n_null_acctbal,
       CAST(NULL AS DOUBLE) AS acctbal_sum
FROM customer WHERE c_custkey % 2 = 0
UNION ALL
SELECT 'v2', count(*), 0,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(20, 2))), 2) AS DOUBLE)
FROM customer WHERE c_custkey % 2 = 1
""",
)
def scan_parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution lake read: a v1 writer emitted (custkey, name)
    and a v2 writer later added acctbal — written to src=v1/ and src=v2/
    under one root. One mergeSchema parquet read reconstructs the union
    schema (src resolves as a partition column from the directory
    names); v1 rows surface NULL acctbal, exactly as a schema-evolved
    lake should, and the aggregate proves both the merged schema and the
    per-version null semantics. The acctbal sum runs in DECIMAL so the
    v2 checksum is order-independent. Complements schema_evolve (which
    evolves the DataFrame); this evolves the FILES."""
    c = Tables(spark, sf_dir).customer
    root = op_tmpdir("schema_merge_")
    v1 = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name")
    v2 = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    v1.write.mode("overwrite").parquet(f"{root}/src=v1")
    v2.write.mode("overwrite").parquet(f"{root}/src=v2")
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return merged.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_acctbal"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(20,2)")), 2
        )
        .cast("double")
        .alias("acctbal_sum"),
    )


@register(
    "sink_parquet_codecs",
    oracle="""
SELECT 'gzip' AS codec, count(*) AS n,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum FROM orders
UNION ALL
SELECT 'snappy', count(*), CAST(sum(o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'zstd', count(*), CAST(sum(o_orderkey) AS BIGINT) FROM orders
""",
)
def sink_parquet_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet compression-codec round-trip: the same relation written
    under snappy (the splittable default), gzip (cold storage), and zstd
    (the modern ratio/speed frontier — the lake default at 100 TB), each
    re-read and checksummed. Proves codec interop end to end; codec
    choice is a table-level storage policy an ingestion engine must
    support per sink."""
    o = Tables(spark, sf_dir).orders.select("o_orderkey", "o_orderstatus")
    out = None
    for codec in ["gzip", "snappy", "zstd"]:
        path = op_tmpdir(f"sink_codec_{codec}_")
        o.write.mode("overwrite").option("compression", codec).parquet(path)
        back = (
            spark.read.schema("o_orderkey bigint, o_orderstatus string")
            .parquet(path)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            )
            .select(F.lit(codec).alias("codec"), "n", "key_sum")
        )
        out = back if out is None else out.unionByName(back)
    return out
