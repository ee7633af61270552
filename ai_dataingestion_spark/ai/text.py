"""Text-analysis operators for LLM training-data pipelines (§2.K + extras):
cleaning, tokenization, stopword removal, quality gates/scores, language
stats, heuristic language ID, regex token counting.

Everything is built-in string/array expressions (JVM-side, inside codegen) —
text never crosses into Python, which is what makes these viable over 100 TB
of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ai_dataingestion_spark.catalog import register
from ai_dataingestion_spark.lexicons import STOPWORDS
from ai_dataingestion_spark.opcache import op_cache

_STOP_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
from ai_dataingestion_spark.registry import Tables


@register(
    "text_clean",
    oracle="""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g')) AS clean_text
FROM documents
""",
)
def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize docs: lowercase → strip non-alphanumerics → collapse
    whitespace → trim (C4-style normalization step)."""
    d = Tables(spark, sf_dir).documents
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select("doc_id", cleaned.alias("clean_text"))


@register(
    "text_tokenize",
    oracle="""
SELECT token, count(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 20
""",
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies: split → explode → count → top-20.
    At scale the explode is map-side and the aggregate is one shuffle of
    (token, partial-count) pairs — vocabulary-sized, not corpus-sized."""
    d = Tables(spark, sf_dir).documents
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


@register(
    "text_stopwords",
    oracle=f"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '),
           t -> NOT list_contains({_STOP_LIST_SQL}, t)))   AS n_kept,
       array_to_string(
         list_filter(string_split(text, ' '),
           t -> NOT list_contains({_STOP_LIST_SQL}, t)), ' ') AS kept_text
FROM documents
""",
)
def text_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword removal preserving duplicates/order (array filter against a
    literal lexicon — array_except would dedup, so filter is used)."""
    d = Tables(spark, sf_dir).documents
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    kept = F.filter(
        F.split("text", " "), lambda t: ~F.array_contains(stop, t)
    )
    return d.select(
        "doc_id",
        F.size(kept).cast("bigint").alias("n_kept"),
        F.array_join(kept, " ").alias("kept_text"),
    )


@register(
    "text_quality_filter",
    oracle="""
SELECT doc_id, lang, n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
         / len(string_split(text, ' ')) AS mean_tok_len
FROM documents
WHERE n_chars BETWEEN 100 AND 4000
  AND len(string_split(text, ' ')) BETWEEN 20 AND 800
  AND CAST(n_chars - len(string_split(text, ' ')) + 1 AS DOUBLE)
        / len(string_split(text, ' ')) BETWEEN 3.0 AND 12.0
  AND lang IN ('en', 'es', 'fr', 'de')
""",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality gates (Rae et al. 2021; Raffel et al. 2020):
    char-length bounds, token-count bounds, mean-word-length band, language
    whitelist. Mean word length uses the exact single-space identity
    (n_chars - n_tokens + 1) / n_tokens so both engines divide the same ints.
    """
    d = Tables(spark, sf_dir).documents
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    mean_len = (F.col("n_chars") - n_tokens + 1).cast("double") / n_tokens
    return (
        d.withColumn("n_tokens", n_tokens)
        .withColumn("mean_tok_len", mean_len)
        .filter(
            F.col("n_chars").between(100, 4000)
            & F.col("n_tokens").between(20, 800)
            & F.col("mean_tok_len").between(3.0, 12.0)
            & F.col("lang").isin("en", "es", "fr", "de")
        )
        .select("doc_id", "lang", "n_chars", "n_tokens", "mean_tok_len")
    )


@register(
    "text_quality_score",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             t -> list_contains({_STOP_LIST_SQL}, t))) AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(n_stop AS DOUBLE) / n_tokens                       AS stopword_ratio,
       CASE WHEN n_tokens BETWEEN 50 AND 500 THEN 1.0 ELSE 0.0 END AS length_score,
       CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.5
            THEN 1.0 ELSE 0.0 END                              AS stopword_score
FROM scored
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality component scores (length band, stopword-ratio
    band) — the scoring counterpart of text_quality_filter, for pipelines
    that rank rather than drop."""
    d = Tables(spark, sf_dir).documents
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("bigint")
    ratio = n_stop.cast("double") / n_tokens
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        ratio.alias("stopword_ratio"),
        F.when(n_tokens.between(50, 500), 1.0).otherwise(0.0).alias("length_score"),
        F.when(ratio.between(0.01, 0.5), 1.0).otherwise(0.0).alias("stopword_score"),
    )


@register(
    "text_lang_stats",
    oracle="""
SELECT lang, source,
       count(*)                                   AS n_docs,
       CAST(sum(n_chars) AS BIGINT)               AS total_chars,
       round(avg(n_chars), 4)                     AS avg_chars,
       round(quantile_cont(n_chars, 0.5), 4)      AS median_chars
FROM documents
GROUP BY lang, source
""",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus profile: doc counts, char totals, length
    median."""
    d = Tables(spark, sf_dir).documents
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.percentile("n_chars", 0.5), 4).alias("median_chars"),
    )


@register(
    "text_langid",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')      THEN 'zh'
            WHEN regexp_matches(text, '[àâçéèêëîïôùûüÿœ]')          THEN 'fr'
            WHEN regexp_matches(text, '[áéíóúñ¿¡]')                 THEN 'es'
            WHEN regexp_matches(text, '[äöüß]')                     THEN 'de'
            ELSE 'en' END AS lang_pred
FROM documents
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic character-class language ID (script/diacritic n-gram
    heuristic). The synthetic corpus is ASCII word salad, so everything
    predicts 'en' — the operator's value is the plumbing: the same CASE
    cascade over real multilingual text routes on the first matching script.
    """
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id",
        "lang",
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(F.col("text").rlike("[àâçéèêëîïôùûüÿœ]"), "fr")
        .when(F.col("text").rlike("[áéíóúñ¿¡]"), "es")
        .when(F.col("text").rlike("[äöüß]"), "de")
        .otherwise("en")
        .alias("lang_pred"),
    )


@register(
    "text_token_count",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')) AS n_bpe_ish,
       len(string_split(text, ' '))                            AS n_ws
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (word-runs or single non-space symbols) — the pretokenization used to
    estimate LLM token budgets."""
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_ish"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws"),
    )


@register(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       array_to_string(list_transform(
         list_slice(list_sort(list_transform(
           range(1, greatest(len(toks) - 2, 2)),
           i -> CAST('0x'||substring(
                  md5(array_to_string(list_slice(toks, i, i + 3), ' ')),
                  1, 15) AS BIGINT)
         )), 1, 4),
         h -> CAST(h AS VARCHAR)
       ), ',') AS fingerprint
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: rolling 4-token window hashes, keep the 4
    smallest (winnowing-style selection, Schleimer et al. 2003). Two docs
    sharing fingerprint hashes are near-dup candidates. Pure expression work
    (sequence + transform + a portable md5-derived 60-bit hash —
    bit-identical in DuckDB, so the fingerprints are oracle-verified
    end-to-end), no Python. The sorted hash array is emitted comma-joined as
    a single string: arrays stay out of oracle-compared output schemas (the
    agg_collect rule, operators/aggregates.py) because the driver's pandas
    canonicalizer cannot hash ndarray cells — the raw-array shape was the
    one driver ERR of round 4."""
    d = Tables(spark, sf_dir).documents.withColumn("toks", F.split("text", " "))
    # NULL branch is load-bearing: size(NULL) is -1 and concat_ws(' ', NULL)
    # is '', so a NULL document would otherwise fingerprint as md5('') — a
    # shared fake identity for every null doc (the _SHINGLES_EXPR rule)
    window_hashes = F.expr(
        """
        CASE WHEN toks IS NULL THEN NULL
             ELSE transform(
               sequence(1, greatest(size(toks) - 3, 1)),
               i -> CAST(conv(substring(md5(concat_ws(' ', slice(toks, i, 4))),1,15),16,10) AS BIGINT)
             )
        END
        """
    )
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.slice(F.array_sort(window_hashes), 1, 4),
                lambda h: h.cast("string"),
            ),
            ",",
        ).alias("fingerprint"),
    )


@register(
    "text_tfidf",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token,
       round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
FROM tf JOIN df USING (token) CROSS JOIN n
""",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, token): smoothed idf = ln((N+1)/(df+1)) + 1
    (scikit-learn's smoothing). The exploded token relation is aggregated
    ONCE to per-(doc, token) counts; document frequency is then a count over
    that tf relation (its rows ARE the distinct (doc, token) pairs), so the
    expensive explode + (doc_id, token) shuffle happens once and Catalyst
    reuses the exchange for both branches — no countDistinct expand over the
    raw token stream. df and n_docs are broadcast-sized (vocabulary-bound).
    Rounded to 6 dp (ln is libm-dependent)."""
    d = Tables(spark, sf_dir).documents
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )


@register(
    "text_ngrams",
    oracle="""
SELECT bigram, count(*) AS freq
FROM (
  -- split hoisted OUT of the lambda: inlined, DuckDB re-splits the text
  -- per bigram — O(tokens x chars), 49 s on 100k-char docs (round 10)
  SELECT unnest(list_transform(
    range(1, greatest(len(toks), 2)),
    i -> toks[i] || ' ' || toks[i + 1]
  )) AS bigram
  FROM (SELECT string_split(text, ' ') AS toks FROM documents)
)
WHERE bigram IS NOT NULL
GROUP BY bigram
ORDER BY freq DESC, bigram ASC
LIMIT 20
""",
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams: windowed token pairs via a sequence transform
    (expression-only; at scale this is the n-gram language-model counting
    kernel — explode is map-side, the aggregate shuffles only (bigram,
    partial count) pairs)."""
    d = Tables(spark, sf_dir).documents.withColumn("toks", F.split("text", " "))
    # The >= 2 gate replaces the old greatest(size-1, 1) floor: a
    # single-token document (empty or whitespace-only text) would index
    # toks[1] out of bounds — an ANSI crash, where the oracle's
    # out-of-range list index is a NULL it then filters. NULL text: split
    # is NULL, the CASE is NULL, explode emits nothing — matching the
    # oracle's NULL-bigram filter.
    bigrams = F.expr(
        """
        CASE WHEN size(toks) >= 2
             THEN transform(sequence(1, size(toks) - 1),
                            i -> concat(toks[i - 1], ' ', toks[i]))
             ELSE array()
        END
        """
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(20)
    )


from ai_dataingestion_spark.ai.dedup import _DUP_OFFSET as _TEXT_DUP_OFFSET


@register(
    "text_paragraph_dedup",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_TEXT_DUP_OFFSET}, text FROM documents WHERE doc_id % 2 = 0
),
paras AS (
  SELECT doc_id, trim(p) AS para
  FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS p FROM corpus)
  WHERE len(trim(p)) >= 20
),
freq AS (
  SELECT md5(para) AS para_md5, min(para) AS para_text,
         count(*) AS n_occurrences,
         count(DISTINCT doc_id) AS n_docs
  FROM paras GROUP BY md5(para)
)
SELECT para_md5, para_text, n_occurrences, n_docs
FROM freq WHERE n_docs >= 2
""",
)
def text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level duplicate detection (the C4/RefinedWeb pass that
    removes repeated paragraphs rather than whole documents): split on
    sentence-ish boundaries, hash each >=20-char paragraph, and report
    paragraphs occurring in >= 2 distinct documents with occurrence and
    document counts. The measured corpus has no cross-doc repeated
    paragraphs, so the query unions in exact copies of even-id docs (the
    dedup_exact fixture) to make the check non-trivial. One explode + one
    md5-keyed groupBy — uniform 128-bit keys, map-side combined, no skew;
    the repeated-paragraph relation is a tiny fraction of the corpus at
    any scale."""
    from ai_dataingestion_spark.ai.dedup import _corpus_with_exact_dups

    corpus = _corpus_with_exact_dups(spark, sf_dir)
    paras = (
        corpus.select("doc_id", F.explode(F.split("text", "\\. ")).alias("p"))
        .select("doc_id", F.trim("p").alias("para"))
        .filter(F.length("para") >= 20)
    )
    return (
        paras.groupBy(F.md5("para").alias("para_md5"))
        .agg(
            F.min("para").alias("para_text"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "text_boilerplate_lines",
    oracle="""
WITH augmented AS (
  SELECT source, text || '. all rights reserved contact ' || source AS text
  FROM documents
),
lines AS (
  SELECT source, trim(p) AS line
  FROM (SELECT source, unnest(string_split(text, '. ')) AS p FROM augmented)
  WHERE len(trim(p)) >= 10
),
per_source AS (
  SELECT source, md5(line) AS line_md5, min(line) AS line_text,
         count(*) AS n
  FROM lines GROUP BY source, md5(line)
)
SELECT source, line_md5, line_text, n
FROM per_source WHERE n >= 5
""",
)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection (RefinedWeb-style): lines repeated
    >= 5 times WITHIN one source are navigation/footer boilerplate to
    strip, not content. The measured corpus has no repeated lines, so the
    query appends a per-source footer sentence to every document in-query
    (the fixture a crawler's site template produces naturally) and must
    isolate exactly those. Grouping key is (source, line-hash) — a hot
    source cannot concentrate a partition because the hash spreads it; the
    boilerplate relation is broadcast-sized for the downstream strip join."""
    d = Tables(spark, sf_dir).documents
    augmented = d.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(". all rights reserved contact "),
            F.col("source"),
        ).alias("text"),
    )
    lines = (
        augmented.select("source", F.explode(F.split("text", "\\. ")).alias("p"))
        .select("source", F.trim("p").alias("line"))
        .filter(F.length("line") >= 10)
    )
    return (
        lines.groupBy("source", F.md5("line").alias("line_md5"))
        .agg(F.min("line").alias("line_text"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


@register(
    "text_code_detect",
    oracle="""
SELECT doc_id,
       round(CAST(len(text) - len(replace(replace(replace(replace(text,
               '{', ''), '}', ''), ';', ''), '=', '')) AS DOUBLE)
             / len(text), 6) AS code_char_ratio,
       round(CAST(len(text) - len(replace(text, '(', '')) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS paren_per_token,
       CASE WHEN CAST(len(text) - len(replace(replace(replace(replace(text,
                   '{', ''), '}', ''), ';', ''), '=', '')) AS DOUBLE)
                 / len(text) > 0.01
              OR CAST(len(text) - len(replace(text, '(', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) > 0.2
            THEN 'code' ELSE 'prose' END AS kind
FROM documents WHERE len(text) > 0
""",
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic code-vs-prose classifier (the pretraining split that routes
    documents to code vs natural-language pipelines): density of code
    punctuation ({};=) per char and parens per token, thresholded. Counting
    is length-difference after char removal — identical integer arithmetic
    in both engines, no regex engine divergence. Pure expressions, one
    scan, no shuffle at all."""
    d = Tables(spark, sf_dir).documents.filter(F.length("text") > 0)
    stripped = F.col("text")
    for ch in ("{", "}", ";", "="):
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    code_ratio = (
        (F.length("text") - F.length(stripped)).cast("double")
        / F.length("text")
    )
    paren_rate = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("("), F.lit("")))).cast("double")
        / F.size(F.split("text", " "))
    )
    return d.select(
        "doc_id",
        F.round(code_ratio, 6).alias("code_char_ratio"),
        F.round(paren_rate, 6).alias("paren_per_token"),
        F.when((code_ratio > 0.01) | (paren_rate > 0.2), "code")
        .otherwise("prose")
        .alias("kind"),
    )


@register(
    "text_entropy_filter",
    oracle="""
WITH chars AS (
  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
  FROM documents WHERE len(text) > 0
),
hist AS (
  SELECT doc_id, ch, count(*) AS n FROM chars WHERE ch <> '' GROUP BY doc_id, ch
),
tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS total FROM hist GROUP BY doc_id)
SELECT h.doc_id,
       round(-sum((CAST(n AS DOUBLE) / total) * ln(CAST(n AS DOUBLE) / total))
             / ln(2), 6) AS char_entropy_bits,
       CASE WHEN -sum((CAST(n AS DOUBLE) / total) * ln(CAST(n AS DOUBLE) / total))
                 / ln(2) < 3.0 THEN 'low_entropy' ELSE 'ok' END AS gate
FROM hist h JOIN tot USING (doc_id)
GROUP BY h.doc_id, total
""",
)
def text_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy gate (Gopher-style repetitive-
    garbage screen: near-constant documents score < 3 bits and are
    flagged). explode-to-chars → (doc, char) histogram → one entropy
    aggregate per doc — both groupBys are map-side combinable and the
    histogram relation is bounded by |alphabet| per doc, so the shuffle
    carries ~70 rows per document regardless of document length. Entropy
    summed in a deterministic order via ordered aggregation inputs is NOT
    required: both engines sum the same ~70 doubles and the result is
    rounded to 6 dp."""
    d = Tables(spark, sf_dir).documents.filter(F.length("text") > 0)
    chars = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.groupBy("doc_id").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    ent = -F.sum(p * F.log(p)) / F.log(F.lit(2.0))
    return (
        hist.join(tot, "doc_id")
        .groupBy("doc_id", "total")
        .agg(
            F.round(ent, 6).alias("char_entropy_bits"),
            F.when(ent < 3.0, "low_entropy").otherwise("ok").alias("gate"),
        )
        .select("doc_id", "char_entropy_bits", "gate")
    )


_CMS_D = 4          # sketch depth (independent hash rows)
_CMS_W = 256        # sketch width (buckets per row)
_CMS_P = (1 << 31) - 1


def _cms_row_duck(r: int) -> str:
    """DuckDB bucket index for sketch row r over column `token`."""
    return (
        f"((({2 * r + 3} * (CAST('0x'||substring(md5(token),1,15) AS BIGINT)"
        f" % {_CMS_P}) + {1000003 * r + 12345}) % {_CMS_P}) % {_CMS_W})"
    )


_CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
assigned AS (
  SELECT token,
         {", ".join("%s AS b%d" % (_cms_row_duck(r), r) for r in range(_CMS_D))}
  FROM toks
),
sketch AS (
  {" UNION ALL ".join("SELECT %d AS row_idx, b%d AS bucket, count(*) AS c FROM assigned GROUP BY b%d" % (r, r, r) for r in range(_CMS_D))}
),
exact AS (
  SELECT token, count(*) AS exact_count,
         {", ".join("min(b%d) AS b%d" % (r, r) for r in range(_CMS_D))}
  FROM assigned GROUP BY token
  ORDER BY exact_count DESC, token ASC LIMIT 20
)
SELECT e.token, e.exact_count,
       least({", ".join("s%d.c" % r for r in range(_CMS_D))}) AS cms_estimate,
       least({", ".join("s%d.c" % r for r in range(_CMS_D))}) >= e.exact_count
         AS cms_admissible
FROM exact e
{" ".join("JOIN sketch s%d ON s%d.row_idx = %d AND s%d.bucket = e.b%d" % (r, r, r, r, r) for r in range(_CMS_D))}
"""


@register("agg_count_min_topk", oracle=_CMS_ORACLE)
def agg_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005): a
    4×256 CMS over the corpus token stream, then the true top-20 tokens
    with exact count, CMS estimate (min over the 4 bucket counts), and the
    admissibility invariant estimate >= exact. The sketch hashes are
    portable (md5 base + affine rows mod 2³¹−1), so BOTH engines build the
    bit-identical sketch and the driver hash-compares the whole thing —
    a sketch operator with an exact oracle, like agg_approx_distinct.

    Scale shape: the sketch build is ONE map-side-combinable groupBy over
    a posexploded (row_idx, bucket) pair stream — d×w ≤ 1024 groups of
    constant-size state per executor, the canonical streaming-sketch
    plan; the exact top-20 exists only to verify. Optimization r16
    (guide §1.2 step 1 / §2.3): the first draft built the sketch as d=4
    SEPARATE groupBys over the `assigned` token relation and re-derived
    that relation inside each of the 4 verification joins — 5 full
    corpus passes (explode + md5 per token, each time); the single
    posexplode pass + the dimension-bounded op_cache'd sketch relation
    cut that to exactly 2 corpus passes (sketch, exact top-20) at any
    scale. Bucket values are unchanged, so the oracle (and the emitted
    rows) are identical."""
    d = Tables(spark, sf_dir).documents
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))
    base = F.expr(
        f"CAST(conv(substring(md5(token),1,15),16,10) AS BIGINT) % {_CMS_P}"
    )
    assigned = toks.select(
        "token",
        *[
            (((F.lit(2 * r + 3) * base + F.lit(1000003 * r + 12345)) % _CMS_P)
             % _CMS_W).alias(f"b{r}")
            for r in range(_CMS_D)
        ],
    )
    # one corpus pass: every token emits its d (row_idx, bucket) pairs and
    # the partial aggregation collapses them map-side to ≤ d×w rows per
    # task; the ≤1024-row result is op_cache'd so the 4 verification joins
    # below read a dimension-bounded in-memory relation instead of each
    # re-running the corpus explode (measured: 5 corpus passes → 2)
    sketch = (
        assigned.select(
            F.posexplode(
                F.array(*[F.col(f"b{r}") for r in range(_CMS_D)])
            ).alias("row_idx", "bucket")
        )
        .groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(op_cache)
    )
    exact = (
        assigned.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("exact_count"),
            *[F.min(f"b{r}").alias(f"b{r}") for r in range(_CMS_D)],
        )
        .orderBy(F.desc("exact_count"), F.asc("token"))
        .limit(20)
    )
    joined = exact
    for r in range(_CMS_D):
        s = sketch.filter(F.col("row_idx") == r).select(
            F.col("bucket").alias(f"bk{r}"), F.col("c").alias(f"c{r}")
        )
        joined = joined.join(
            F.broadcast(s), F.col(f"b{r}") == F.col(f"bk{r}")
        )
    est = F.least(*[F.col(f"c{r}") for r in range(_CMS_D)])
    return joined.select(
        "token",
        "exact_count",
        est.alias("cms_estimate"),
        (est >= F.col("exact_count")).alias("cms_admissible"),
    )
