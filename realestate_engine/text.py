"""Text analysis operators over the documents table (north-star
extension): token counting, quality scoring, fingerprinting, TF-IDF,
and a language-ID heuristic.

All tokenization and scoring is native Spark SQL (split/regexp/
higher-order functions) — no Python in the hot path. The TF-IDF uses
explode + two aggregates (one shuffle each); document fingerprints are
md5 of a canonical normalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realestate_engine.registry import register, t

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


@register(
    "text_token_count",
    r"""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'))) AS BIGINT) AS n_distinct_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counts (total + distinct) per document."""
    d = t(spark, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))).cast("long").alias(
            "n_distinct_tokens"
        ),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "text_quality_score",
    rf"""
    WITH toks AS (
        SELECT doc_id,
               STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS words,
               LENGTH(text) AS n_char,
               LENGTH(REGEXP_REPLACE(text, '[^.!?,;]', '', 'g')) AS n_punct
        FROM documents
    )
    SELECT doc_id,
           ROUND(CAST(n_punct AS DOUBLE) / n_char, 6) AS punct_ratio,
           ROUND(CAST(LEN(LIST_FILTER(words, w -> w IN ({", ".join(repr(w) for w in _STOPWORDS)}))) AS DOUBLE)
                 / LEN(words), 6) AS stopword_ratio,
           ROUND(CAST(n_char AS DOUBLE) / LEN(words), 4) AS chars_per_token,
           ROUND(CAST(LEN(LIST_DISTINCT(words)) AS DOUBLE) / LEN(words), 6) AS lexical_diversity
    FROM toks
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality signals: punctuation ratio, stopword ratio,
    average token length, lexical diversity — the standard cheap filters
    of an LLM-pretraining pipeline."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_char = F.length("text")
    n_punct = F.length(F.regexp_replace("text", r"[^.!?,;]", ""))
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    return d.select(
        "doc_id",
        F.round(n_punct.cast("double") / n_char, 6).alias("punct_ratio"),
        F.round(
            F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).cast("double") / F.size(words), 6
        ).alias("stopword_ratio"),
        F.round(n_char.cast("double") / F.size(words), 4).alias("chars_per_token"),
        F.round(F.size(F.array_distinct(words)).cast("double") / F.size(words), 6).alias("lexical_diversity"),
    )


@register(
    "text_fingerprint",
    r"""
    SELECT doc_id,
           MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form document fingerprint (lowercase + whitespace
    collapse + md5) — the join key for exact-dup detection at scale."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias("fingerprint"),
    )


@register(
    "text_tfidf_top_term",
    r"""
    WITH words AS (
        SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
    ),
    df AS (
        SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word AS top_term, tfidf
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) = 1
    """,
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with the top-scoring term per document. Two hash
    aggregations + a broadcast of the (small) document-frequency side of
    the vocabulary; no driver-side vocabulary construction.

    r14 plan fix (guide §1.2/§2.3 — remove unnecessary passes,
    aggregate before you shuffle): df used to be a SECOND
    scan+split+explode over the corpus feeding a countDistinct(doc_id)
    (double-agg expand). df(word) == number of distinct (doc_id, word)
    pairs == COUNT(*) of tf's groups per word, so it is now derived
    from tf, and tf is CACHED — structural sharing alone is not
    enough: Catalyst prunes the unused tf count from the df branch's
    copy of the subtree, which makes the two exchanges
    non-identical and defeats exchange reuse, so without the cache the
    corpus was still tokenized twice (verified in the captured plan).
    With it the scan+split+explode+agg run once and the word-shuffle
    carries one row per distinct doc-term pair instead of one per
    token instance. Same integers, bit-identical tfidf. The tf cache
    is the same bounded shared-relation pattern as the minhash shingle
    cache (doc-term pairs, LRU-evictable; at 100 TB a pipeline would
    materialize tf once for the whole IR family anyway)."""
    from realestate_engine.dedup import cache_once

    d = t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
    tf = cache_once(words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            F.round(F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_term"), "tfidf")
    )


# Tiny per-language marker-token profiles for the heuristic language ID.
# Deterministic and self-contained (the documents table is synthetic
# word soup, so this demonstrates the operator shape, not linguistics).
_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "y"],
    "zh": ["de", "shi", "le"],
}


_LANGID_ORACLE = (
    r"""
    WITH w AS (
        SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS words
        FROM documents
    ),
    profiles(lang, markers) AS (VALUES
        """
    + ", ".join(
        "('{}', [{}])".format(lang, ", ".join(f"'{m}'" for m in markers))
        for lang, markers in _LANG_MARKERS.items()
    )
    + r"""
    ),
    scored AS (
        SELECT doc_id, lang,
               CAST(LEN(LIST_FILTER(words, x -> LIST_CONTAINS(markers, x))) AS DOUBLE)
                 / LEN(words) AS score
        FROM w CROSS JOIN profiles
    )
    SELECT doc_id,
           CASE WHEN score > 0 THEN lang ELSE 'und' END AS predicted_lang,
           ROUND(score, 6) AS confidence
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) = 1
    ORDER BY doc_id
    """
)


@register("text_langid", _LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/marker-token language-ID heuristic: score each language
    profile by marker hit-rate, take the argmax (Spark's array_max on
    (score, lang) structs — score ties break to the lexicographically
    LARGER lang, which the oracle's ORDER BY score DESC, lang DESC
    reproduces; zero hits → 'und'). One pass, all native expressions;
    both engines compute the identical hits/len double so the argmax
    comparison is bit-stable."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(words, lambda w: F.array_contains(marker_arr, w))).cast("double") / F.size(words)
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return d.select(
        "doc_id",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("predicted_lang"),
        F.round(best["score"], 6).alias("confidence"),
    ).orderBy("doc_id")


@register(
    "text_token_count_bpe",
    r"""
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+')) AS BIGINT) AS n_word_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[0-9]+')) AS BIGINT) AS n_number_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenizer approximation: letter runs, digit runs, and
    single non-alphanumeric marks as separate tokens (the pre-merge
    vocabulary of a byte-pair encoder). Pure regexp_extract_all — stays
    in codegen, no Python. At 100 TB this is the cheap token-budget
    estimator run before the real (expensive) tokenizer."""
    d = t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).cast("long").alias("n_bpe_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(r"[a-z]+"), 0)).cast("long").alias("n_word_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(r"[0-9]+"), 0)).cast("long").alias("n_number_tokens"),
    )


@register(
    "corpus_clean_pipeline",
    r"""
    WITH scored AS (
        SELECT doc_id, lang, source, n_chars,
               LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS n_tokens,
               CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'))) AS DOUBLE)
                   / LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS lexical_diversity,
               MD5(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fingerprint
        FROM documents
    ),
    filtered AS (
        SELECT * FROM scored
        WHERE n_chars BETWEEN 100 AND 2000 AND n_tokens >= 20 AND lexical_diversity >= 0.3
    ),
    deduped AS (
        SELECT * FROM filtered
        QUALIFY ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM deduped
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship LLM-pretraining composite: quality-filter (length,
    token count, lexical diversity) → exact-dedup on canonical
    fingerprint (keep lowest doc_id) → per-(lang, source) corpus stats.
    One scan, two shuffles (dedup window + final agg) — the shape of a
    real 100 TB corpus-cleaning pass where each stage's selectivity
    multiplies."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(words).alias("n_tokens"),
        (F.size(F.array_distinct(words)).cast("double") / F.size(words)).alias("lexical_diversity"),
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias("fingerprint"),
    )
    filtered = scored.filter(
        F.col("n_chars").between(100, 2000)
        & (F.col("n_tokens") >= 20)
        & (F.col("lexical_diversity") >= 0.3)
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = filtered.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


CHUNK_WORDS = 10


@register(
    "text_udtf_chunk_docs",
    rf"""
    WITH w AS (
        SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS words FROM documents
    )
    SELECT doc_id,
           CAST(k AS INT) AS chunk_idx,
           ARRAY_TO_STRING(words[k * {CHUNK_WORDS} + 1 : k * {CHUNK_WORDS} + {CHUNK_WORDS}], ' ') AS chunk
    FROM w, UNNEST(RANGE(0, GREATEST(CAST(CEIL(LEN(words) / {CHUNK_WORDS}.0) AS BIGINT), 1))) AS t(k)
    """,
)
def text_udtf_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking as a Python UDTF (table function): one document
    row fans out to fixed-size word chunks — the context-window
    preprocessing step of an LLM data pipeline, and the UDTF member of
    the UDF/UDAF/UDTF surface. Invoked via LATERAL so chunking runs
    distributed alongside the scan; the oracle reproduces the chunk
    grid with list slicing."""
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType=f"chunk_idx int, chunk string")
    class ChunkDoc:
        def eval(self, text: str):
            words = (text or "").strip().split()
            n_chunks = max(1, math.ceil(len(words) / CHUNK_WORDS))
            for k in range(n_chunks):
                yield k, " ".join(words[k * CHUNK_WORDS : (k + 1) * CHUNK_WORDS])

    # Arrow-batched UDTF eval (driver sessions may not have the engine's
    # session factory config; this is a runtime conf, safe to set here)
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("chunk_doc", ChunkDoc)
    t(spark, sf_dir, "documents").createOrReplaceTempView("_docs_for_chunking")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk "
        "FROM _docs_for_chunking d, LATERAL chunk_doc(d.text) c"
    )


@register(
    "text_repetition_filter",
    """
    WITH g AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, len(string_split_regex(lower(trim(text)), '\\s+')) - 1),
                   i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
                        string_split_regex(lower(trim(text)), '\\s+')[i + 1]
               ) AS bigrams
        FROM documents
    )
    SELECT doc_id,
           CAST(len(bigrams) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams,
           CASE WHEN len(bigrams) > 0
                THEN 1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams)
                ELSE 0.0 END AS dup_bigram_ratio,
           (CASE WHEN len(bigrams) > 0
                 THEN 1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams)
                 ELSE 0.0 END) <= 0.5 AS keep
    FROM g
    ORDER BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: Gopher-style repetition quality gate — the fraction of
    duplicated word bigrams per document (high ratio = boilerplate /
    degenerate repetition; threshold 0.5 keeps a doc). All native array
    ops: the bigram array zips the token array with its 1-shifted self
    (linear, not the quadratic transform-over-indices shape — see the
    shingling note in dedup.py), and the ratio divides two exact
    integers so the oracle matches without rounding."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim("text")), r"\s+")
    pairs = F.zip_with(
        words,
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bigrams = F.filter(pairs, lambda x: x.isNotNull())
    n_bi = F.size(bigrams).cast("bigint")
    n_di = F.size(F.array_distinct(bigrams)).cast("bigint")
    ratio = F.when(n_bi > 0, 1.0 - n_di * 1.0 / n_bi).otherwise(F.lit(0.0))
    return (
        d.select(
            "doc_id",
            n_bi.alias("n_bigrams"),
            n_di.alias("n_distinct_bigrams"),
            ratio.alias("dup_bigram_ratio"),
            (ratio <= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_unigram_logprob",
    """
    WITH toks AS (
        SELECT doc_id, u.w AS token
        FROM documents, LATERAL UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS u(w)
    ),
    vocab AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY token
    ),
    scored AS (
        SELECT t.doc_id, LN(v.cnt * 1.0 / (SELECT SUM(cnt) FROM vocab)) AS lp
        FROM toks t JOIN vocab v USING (token)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(lp), 4) AS avg_logprob
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: corpus-unigram-LM document scoring (the CCNet/Gopher-style
    LM quality gate, reduced to unigrams): build the corpus vocabulary
    with counts, score each token ln(count/total), average per doc —
    boilerplate scores high (common tokens), lorem-noise scores low.
    Two shuffles (vocab build, per-doc regroup); the vocab joins back
    BROADCAST so the token stream never shuffles for the lookup. At
    100 TB the vocab exceeds broadcast range → pre-partition both sides
    by token, or keep only the top-K vocab with a default logprob (what
    production LM filters do). The relative frequency divides exact
    integers, so ln inputs are bit-identical across engines."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = toks.join(F.broadcast(vocab), "token").crossJoin(F.broadcast(total))
    return (
        scored.select("doc_id", F.log(F.col("cnt") * 1.0 / F.col("total")).alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_contamination_ngrams",
    r"""
    WITH w AS (
        SELECT doc_id, source, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS words
        FROM documents
    ),
    g AS (
        SELECT doc_id, source, ARRAY_TO_STRING(LIST_SLICE(words, i, i + 3), ' ') AS ngram
        FROM w, UNNEST(RANGE(1, LEN(words) - 2)) AS u(i)
    ),
    train AS (SELECT DISTINCT ngram FROM g WHERE source <> 'src19'),
    eval_g AS (SELECT DISTINCT doc_id, ngram FROM g WHERE source = 'src19')
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN t.ngram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN t.ngram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS contamination_rate
    FROM eval_g e LEFT JOIN train t ON e.ngram = t.ngram
    GROUP BY e.doc_id
    ORDER BY e.doc_id
    """,
)
def text_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination audit: fraction of each held-out doc's
    distinct 4-grams (source='src19' as the eval split) that appear
    anywhere in the training corpus — the WMT/GPT-style n-gram-overlap
    decontamination check. Shape: posexplode words -> single window
    pass assembling 4-grams via 3 leads (codegen'd, no quadratic
    slice-per-index), distinct per side, then one equi-join on the
    n-gram. At 100 TB the train side would be a bloom/minhash sketch;
    here the exact join IS the oracle-checkable semantics. The rate is
    an int/int division of identical counts — bit-identical across
    engines, no rounding fudge needed."""
    from realestate_engine.dedup import cache_once, word_shingles

    d = t(spark, sf_dir, "documents")
    # 4-grams via the zip_with shingle helper: a pure map-side
    # higher-order expression (no posexplode -> window shuffle+sort),
    # already distinct per doc. Cached because BOTH branches below
    # (train corpus, eval split) read it — without the cache the
    # whole gram assembly runs twice (same lesson as the MinHash
    # shingle relation).
    grams = cache_once(
        d.select(
            "doc_id", "source", F.explode(word_shingles(F.col("text"), 4)).alias("ngram")
        )
    )
    train = grams.filter(F.col("source") != "src19").select("ngram").distinct()
    eval_g = grams.filter(F.col("source") == "src19").select("doc_id", "ngram")
    return (
        eval_g.join(train.withColumn("_hit", F.lit(1)), "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).cast("bigint").alias("n_contaminated"),
            (
                F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("contamination_rate"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_segment_dedup",
    r"""
    WITH w AS (
        SELECT doc_id, source, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS words
        FROM documents
    ),
    segs AS (
        SELECT doc_id, source,
               ARRAY_TO_STRING(LIST_SLICE(words, s * 20 + 1, s * 20 + 20), ' ') AS seg
        FROM w, UNNEST(RANGE(0, GREATEST(CAST(CEIL(LEN(words) / 20.0) AS BIGINT), 1))) AS u(s)
    ),
    seg_docs AS (SELECT seg, COUNT(DISTINCT doc_id) AS nd FROM segs GROUP BY seg)
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(COUNT(DISTINCT s.seg) AS BIGINT) AS n_distinct_segs,
           CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_doc_dup,
           CAST(SUM(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS boilerplate_rate
    FROM segs s JOIN seg_docs d ON s.seg = d.seg
    GROUP BY s.source
    ORDER BY s.source
    """,
)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity dedup audit: chop each doc into 20-word
    segments (the text has no newlines, so fixed word windows stand in
    for paragraphs), count segments whose exact text recurs in >=2
    distinct docs — the boilerplate/template-text detector that
    paragraph-level dedup (a la CCNet/RefinedWeb) removes before
    training. Segmenting is a LINEAR transform+slice (one slice per
    segment, not per word — the O(words^2) shingle trap does not apply
    at stride 20); the recurrence count is one groupBy(seg) +
    countDistinct, joined back and rolled up per source. Rates are
    int/int divisions — bit-identical cross-engine."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("words")
    )
    segs = d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(cast(ceil(size(words) / 20.0) as int), 1) - 1),"
                " s -> array_join(slice(words, s * 20 + 1, 20), ' '))"
            )
        ).alias("seg"),
    )
    seg_docs = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("nd"))
    dup = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
    return (
        segs.join(seg_docs, "seg")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.countDistinct("seg").cast("bigint").alias("n_distinct_segs"),
            dup.cast("bigint").alias("n_cross_doc_dup"),
            (dup.cast("double") / F.count(F.lit(1))).alias("boilerplate_rate"),
        )
        .orderBy("source")
    )


@register(
    "text_oov_rate",
    r"""
    WITH w AS (
        SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM w),
    f AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
    vocab AS (SELECT word FROM f, tot WHERE c * 100 >= n)
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_rate
    FROM w LEFT JOIN vocab v ON w.word = v.word
    GROUP BY w.doc_id
    ORDER BY w.doc_id
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage / OOV-rate scoring: build the corpus
    vocabulary (words whose count clears a RELATIVE frequency floor —
    c*100 >= total_tokens, a pure integer comparison so the cutoff is
    scale-invariant and bit-identical cross-engine), then score each
    doc by the fraction of tokens outside it. The tokenizer-coverage
    gate run before committing a BPE vocab to a 100 TB corpus. Shape:
    one explode, one word-frequency agg (map-side combined), the 1-row
    total broadcast-crossed onto the tiny frequency table, and the
    vocab broadcast back onto the exploded tokens — no driver
    collection."""
    w = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
    )
    tot = w.agg(F.count(F.lit(1)).alias("n"))
    freq = w.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        freq.crossJoin(F.broadcast(tot))
        .filter(F.col("c") * 100 >= F.col("n"))
        .select("word")
        .withColumn("_in_vocab", F.lit(1))
    )
    oov = F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
    return (
        w.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            oov.cast("bigint").alias("n_oov"),
            (oov.cast("double") / F.count(F.lit(1))).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_inverted_index",
    r"""
    WITH w AS (
        SELECT DISTINCT doc_id,
               UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    )
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM w
    GROUP BY word
    ORDER BY word
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term -> sorted posting list of doc_ids +
    document frequency — the IR/search-index primitive (and the
    retrieval half of a RAG corpus pipeline). One explode + distinct,
    one groupBy(word) with collect_list; postings sorted numerically
    in-plan with sort_array, then serialized to a comma-joined string
    (array result columns break the driver compare; the string pins
    both membership and order). At 100 TB posting lists for
    stopword-grade terms skew — the degree-cap (keep df below a
    threshold or bucket-split hot terms) composes on top; here every
    list is bounded by the doc count."""
    w = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
        .distinct()
    )
    return (
        w.groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
            F.array_join(
                F.transform(F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")),
                ",",
            ).alias("postings"),
        )
        .orderBy("word")
    )


@register(
    "t14_pii_redaction",
    r"""
    WITH planted AS (
        SELECT c_custkey,
               'Contact ' || c_name || ' at '
                 || LOWER(REPLACE(c_name, '#', '.')) || '@example.com'
                 || ' or call +1-800-' || CAST(c_custkey % 10000 AS VARCHAR)
                 || ' today.' AS text
        FROM customer
    )
    SELECT c_custkey,
           REGEXP_REPLACE(
               REGEXP_REPLACE(text, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
               '\+1-800-[0-9]+', '<PHONE>', 'g') AS redacted,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '\+1-800-[0-9]+')) AS BIGINT) AS n_phones
    FROM planted
    ORDER BY c_custkey
    """,
)
def t14_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14: PII redaction — the compliance pass every LLM training
    corpus runs before tokenization. Emails and phone numbers are
    replaced with typed placeholders and per-doc redaction counts are
    kept for the audit trail. The testdata carries no real PII, so the
    query PLANTS deterministic emails/phones from the customer table
    (both engines build the identical text) and then redacts them —
    proving the regex surface end-to-end, not just on empty matches.
    Pure regexp_replace/regexp_extract_all: narrow, no shuffle, scales
    linearly; the regexes stay in RE2-compatible syntax so Spark (Java
    regex) and DuckDB (RE2) agree."""
    c = t(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("Contact "),
        F.col("c_name"),
        F.lit(" at "),
        F.lower(F.regexp_replace(F.col("c_name"), "#", ".")),
        F.lit("@example.com or call +1-800-"),
        (F.col("c_custkey") % 10000).cast("string"),
        F.lit(" today."),
    )
    email_re = r"[a-z0-9.]+@[a-z0-9.]+"
    phone_re = r"\+1-800-[0-9]+"
    planted = c.select("c_custkey", text.alias("text"))
    return planted.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ).alias("redacted"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email_re), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(phone_re), 0)).cast("bigint").alias("n_phones"),
    ).orderBy("c_custkey")


@register(
    "t15_collocations",
    r"""
    WITH w AS (
        SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS words
        FROM documents
    ),
    toks AS (
        SELECT doc_id, UNNEST(words) AS word, GENERATE_SUBSCRIPTS(words, 1) AS i
        FROM w
    ),
    uni AS (SELECT word, COUNT(*) AS nx FROM toks GROUP BY word),
    nn AS (SELECT COUNT(*) AS n FROM toks),
    big AS (
        SELECT a.word AS w1, b.word AS w2, COUNT(*) AS n_xy
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        GROUP BY a.word, b.word
    )
    SELECT w1, w2, CAST(n_xy AS BIGINT) AS n_xy,
           CAST(u1.nx AS BIGINT) AS n_w1, CAST(u2.nx AS BIGINT) AS n_w2
    FROM big
    JOIN uni u1 ON u1.word = w1
    JOIN uni u2 ON u2.word = w2
    CROSS JOIN nn
    WHERE n_xy >= 3 AND n_xy * n > 2 * u1.nx * u2.nx
    ORDER BY n_xy DESC, w1, w2
    """,
)
def t15_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15: collocation mining — bigrams whose observed frequency beats
    2x the independence expectation (lift > 2), the phrase-detection
    primitive behind tokenizer vocab construction (word2phrase, BPE
    merges). The lift test n_xy*N > 2*n_x*n_y is pure integer
    cross-multiplication — no log/PMI floats, so Spark and DuckDB agree
    bit-for-bit. Spark builds bigrams with zip_with against the
    1-shifted word array (no positional self-join, unlike the oracle,
    which can afford the O(n) index join): one explode + three
    hash-aggs + two joins on word keys; the 1-row total is a broadcast
    cross join."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pairs = F.filter(
        F.zip_with(
            words,
            F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    toks = d.select(F.explode(words).alias("word"))
    uni = toks.groupBy("word").agg(F.count(F.lit(1)).alias("nx"))
    nn = toks.agg(F.count(F.lit(1)).alias("n"))
    big = (
        d.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    u1 = uni.select(F.col("word").alias("w1"), F.col("nx").alias("nx1"))
    u2 = uni.select(F.col("word").alias("w2"), F.col("nx").alias("nx2"))
    return (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nn))
        .where((F.col("n_xy") >= 3) & (F.col("n_xy") * F.col("n") > 2 * F.col("nx1") * F.col("nx2")))
        .select(
            "w1",
            "w2",
            F.col("n_xy").cast("bigint").alias("n_xy"),
            F.col("nx1").cast("bigint").alias("n_w1"),
            F.col("nx2").cast("bigint").alias("n_w2"),
        )
        .orderBy(F.desc("n_xy"), "w1", "w2")
    )


@register(
    "text_sparse_dot_pairs",
    r"""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    kept AS (SELECT tf.doc_id, tf.word, tf.tf FROM tf JOIN df USING (word) WHERE df.df <= 50),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               SUM(a.tf * b.tf) AS dot
        FROM kept a JOIN kept b ON a.word = b.word AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot
    FROM pairs
    ORDER BY dot DESC, doc_a, doc_b
    LIMIT 20
    """,
)
def text_sparse_dot_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17: sparse document-pair similarity via an inverted-index join
    — the scalable alternative to densifying TF vectors and
    cross-joining: explode to (doc, term, tf), self-join on the term
    key, sum tf products per pair. Document-frequency pruning (df <=
    50) is both the IR-standard stopword cut AND the skew guard: a
    stopword-grade term with df=d fans out d^2/2 pairs, so capping df
    bounds the worst key's join output — the difference between a
    workable and a runaway plan at 100 TB. Raw-count dot products stay
    in exact BIGINTs (a tf-idf weighting would be float and
    non-hash-comparable)."""
    from realestate_engine.dedup import cache_once

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    )
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # r15 (guide §1.2): cache the df-pruned postings — BOTH sides of
    # the self-join read this relation, and Catalyst inlines the
    # subtree twice (the r15 before-plan shows the df aggregate built
    # twice, each with its own word exchange + broadcast). One cached
    # build replaces the duplicated df agg + join branch.
    kept = cache_once(tf.join(df.where(F.col("df") <= 50), "word"))
    a = kept.select(F.col("word"), F.col("doc_id").alias("doc_a"), F.col("tf").alias("tf_a"))
    b = kept.select(F.col("word"), F.col("doc_id").alias("doc_b"), F.col("tf").alias("tf_b"))
    return (
        a.join(b, "word")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("bigint").alias("dot"))
        .orderBy(F.desc("dot"), "doc_a", "doc_b")
        .limit(20)
    )




_BM25_QUERY_TERMS = ("data", "model", "spark")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "text_bm25_ranking",
    r"""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    na AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM toks
        WHERE word IN ('data', 'model', 'spark') GROUP BY doc_id, word
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    -- float literals carry e0 exponents: DuckDB parses bare 0.5 as
    -- DECIMAL, whose division semantics differ from Spark's doubles
    scored AS (
        SELECT t.doc_id,
               LN((n_docs - df.df + 0.5e0) / (df.df + 0.5e0) + 1.0e0)
               * (t.tf * 2.2e0)
               / (t.tf + 1.2e0 * (0.25e0 + 0.75e0 * l.dl / avgdl)) AS term_score
        FROM tf t JOIN df ON t.word = df.word JOIN dl l ON t.doc_id = l.doc_id CROSS JOIN na
    )
    SELECT doc_id, ROUND(SUM(term_score), 9) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def text_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19: BM25 ranked retrieval — THE lexical relevance scorer
    (Lucene/Elasticsearch default) over the documents table for a fixed
    3-term query. Distributed shape: one token explode -> per-(doc,
    term) tf + per-doc length, df and avgdl as tiny broadcast
    aggregates, then the BM25 formula per (doc, query-term) and a
    per-doc sum over <= 3 terms (a fixed-size expression sum, NOT a
    partition-order-dependent aggregate, so the doubles are
    reproducible). Top-20 via TakeOrderedAndProject with doc_id
    tiebreak. Oracle-checked since round 4: the formula is written in
    the same operand order on both engines and rounded to 9 decimals
    (Math.log vs libm ln agree to ~1 ulp, far inside the checker's
    1e-9 atol); tests additionally replay the exact formula in Python
    and demand identical ranking and scores to 1e-9."""
    import math

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_and_avg = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.where(F.col("word").isin(*_BM25_QUERY_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_and_avg))
        .select(
            "doc_id",
            (
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 9).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@register(
    "corpus_token_budget",
    r"""
    WITH scored AS (
        SELECT doc_id,
               CAST(LEN(words) AS BIGINT) AS tok,
               CAST((1000 * LEN(LIST_DISTINCT(words))) // LEN(words) AS BIGINT) AS score_milli
        FROM (
            SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS words
            FROM documents
        )
    ),
    b AS (SELECT SUM(tok) // 4 AS budget FROM scored),
    c AS (
        SELECT doc_id, score_milli, tok,
               SUM(tok) OVER (ORDER BY score_milli DESC, doc_id) AS cum_tok
        FROM scored
    )
    SELECT doc_id, score_milli, tok, CAST(cum_tok AS BIGINT) AS cum_tok
    FROM c, b
    WHERE cum_tok <= budget
    ORDER BY cum_tok
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: budget-constrained corpus selection — keep the best documents
    (by lexical-diversity score, unique-words-per-word in exact milli
    units) until a token budget is exhausted: the "select top documents
    until N tokens" step every pretraining-data pipeline runs after
    scoring.

    The cutoff needs a GLOBAL running sum in score order, and a naive
    ``SUM() OVER (ORDER BY score)`` funnels the whole corpus through one
    task (Spark warns `No Partition Defined for Window operation`).
    Implemented instead as the scalable two-phase prefix sum:

    1. ``repartitionByRange`` on (score DESC, doc_id) — the sort key is
       a total order, so ranges partition the global order;
    2. per-partition running sums via a window PARTITIONED by
       ``spark_partition_id()`` (parallel, no global funnel);
    3. per-partition totals (one tiny row per partition) get exclusive
       prefix offsets via a window over that partition-count-sized
       frame, broadcast back, and ``global cum = offset + local cum``.

    At 100 TB step 3's frame is # partitions rows — KBs — while all
    row-level work stays fully parallel. Same shape as p14_dense_reid's
    zipWithIndex replacement (queries_extra.py:1627). The budget (total
    tokens div 4) is a 1-row broadcast, never a driver constant."""
    d = t(spark, sf_dir, "documents")
    # Integer `div` (not `/`, which is double division in Spark) so the
    # milli score matches DuckDB's `//` exactly.
    scored = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint").alias("tok"),
        F.expr(
            "CAST(1000 * size(array_distinct(split(lower(trim(text)), '\\\\s+'))) AS BIGINT) "
            "div size(split(lower(trim(text)), '\\\\s+'))"
        ).alias("score_milli"),
    )
    from realestate_engine.ordered import distributed_prefix_sum

    cum = distributed_prefix_sum(
        scored, [F.col("score_milli").desc(), F.col("doc_id")], "tok", out_col="cum_tok"
    )
    # budget from a data-sized aggregate over the SAME cached frame the
    # prefix sum reads (one corpus scan total — the uncached naive plan
    # scanned parquet three times)
    budget = cum.agg(F.expr("CAST(sum(tok) AS BIGINT) div 4").alias("budget"))
    return (
        cum.crossJoin(F.broadcast(budget))
        .where(F.col("cum_tok") <= F.col("budget"))
        .select("doc_id", "score_milli", "tok", "cum_tok")
        .orderBy("cum_tok")
    )


@register(
    "corpus_mixture_sample",
    """
    WITH rates(lang, rate_milli) AS (
        VALUES ('en', 400), ('de', 800), ('es', 800), ('fr', 800), ('zh', 800)
    ),
    sel AS (
        SELECT d.lang, r.rate_milli,
               CASE WHEN (d.doc_id * 2654435761) % 1000 < r.rate_milli
                    THEN 1 ELSE 0 END AS keep
        FROM documents d JOIN rates r ON d.lang = r.lang
    )
    SELECT lang, CAST(rate_milli AS BIGINT) AS rate_milli,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(keep) AS BIGINT) AS n_kept
    FROM sel GROUP BY lang, rate_milli ORDER BY lang
    """,
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: mixture rebalancing by deterministic hash sampling — the
    corpus-composition step of a pretraining pipeline: downsample the
    overrepresented language (en is ~44% of the corpus) toward a target
    mixture by keeping each doc iff ``hash(doc_id) mod 1000 <
    rate_milli[lang]``.

    Hash-threshold sampling (vs ``rand()``) is reproducible across
    engines/reruns/cluster sizes and composable: rerunning on a superset
    keeps a superset, and unioning shards never double-samples. The
    Knuth multiplicative hash here (``doc_id * 2654435761 mod 1000``,
    exact BIGINT both engines) stands in for xxhash64(content) in
    production — the arithmetic is portable to the DuckDB oracle, the
    plan shape identical. Rates arrive as a broadcast dim (a real
    mixture config table), not a CASE expression — at 100 TB the config
    is data, joined map-side."""
    # VALUES builds a LocalRelation — constant-folded into the plan,
    # no RDD detour (createDataFrame over Python rows plans as a
    # Scan ExistingRDD, which the plan audit rightly flags).
    rates = spark.sql(
        "SELECT lang, CAST(rate_milli AS BIGINT) AS rate_milli FROM VALUES "
        "('en', 400), ('de', 800), ('es', 800), ('fr', 800), ('zh', 800) "
        "AS t(lang, rate_milli)"
    )
    d = t(spark, sf_dir, "documents")
    keep = F.when(
        (F.col("doc_id") * F.lit(2654435761)) % 1000 < F.col("rate_milli"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        d.join(F.broadcast(rates), "lang")
        .select("lang", "rate_milli", keep.alias("keep"))
        .groupBy("lang", "rate_milli")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum("keep").cast("bigint").alias("n_kept"),
        )
        .select(
            "lang",
            F.col("rate_milli").cast("bigint").alias("rate_milli"),
            "n_total",
            "n_kept",
        )
        .orderBy("lang")
    )


@register(
    "text_phrase_search",
    r"""
    WITH w AS (
        SELECT doc_id, STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    )
    SELECT doc_id,
           CAST(LEN(LIST_FILTER(RANGE(1, LEN(w)), i -> w[i] = 'table' AND w[i + 1] = 'hash'))
                AS BIGINT) AS n_hits
    FROM w
    WHERE LEN(LIST_FILTER(RANGE(1, LEN(w)), i -> w[i] = 'table' AND w[i + 1] = 'hash')) > 0
    ORDER BY doc_id
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20: exact phrase search ("table hash", adjacent tokens) — the
    positional-matching primitive behind phrase queries and n-gram
    contamination checks. Computed as a PER-ROW higher-order-function
    scan (filter over an index sequence testing w[i], w[i+1]) — no
    explode, no self-join on positions, no shuffle at all: the plan is
    scan -> codegen'd projection -> filter, embarrassingly parallel at
    any corpus size. The inverted-index route (text_inverted_index
    posting lists joined on doc + adjacent positions) is the right
    shape when the corpus is indexed ONCE and queried many times; this
    expression form wins for one-shot scans.

    r14 rewrite (guide §4.1 — prefer codegen'd built-ins over
    interpreted evaluation): the filter-over-sequence lambda is an
    INTERPRETED higher-order function — ~1.5M per-element evaluations
    at sf0.1 (measured 5.0-5.7s for a 5,000-doc scan), and it CRASHES
    on 1-token documents (sequence(0, size-2) with size=1 yields the
    DESCENDING [0,-1], so w[i+1] indexes past the array — the DuckDB
    oracle's RANGE(1, LEN(w)) is simply empty there). Token-pair
    adjacency under a \\s+ split is exactly the regex
    (?:^|\\s)table\\s+hash(?=\\s|$) on the lowered/trimmed text (the
    lookahead keeps back-to-back phrase hits countable), so the count
    is now one codegen'd regexp_count per row: same values on every
    document (adversarial-case pinned in tests/test_round14_ops.py),
    total on 1-token docs, measured 5.0s -> 0.35s. Java and RE2 \\s
    are both ASCII, so the tokenization the regex mirrors is the one
    both engines already shared."""
    d = t(spark, sf_dir, "documents")
    hits = F.regexp_count(
        F.lower(F.trim(F.col("text"))), F.lit(r"(?:^|\s)table\s+hash(?=\s|$)")
    )
    return (
        d.select("doc_id", hits.cast("bigint").alias("n_hits"))
        .where(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


_TEMP_MIX_N = 1000  # target mixture size (docs)
_TEMP_MIX_SCALE = 1_000_000_000_000  # sqrt fixed-point scale (1e12)


@register(
    "corpus_temperature_mixture",
    f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n,
               CAST(FLOOR(SQRT(CAST(n * {_TEMP_MIX_SCALE} AS DOUBLE))) AS BIGINT) AS wgt
        FROM counts
    ),
    tot AS (SELECT SUM(wgt) AS total_w FROM w),
    appo AS (
        SELECT source, n, wgt,
               ({_TEMP_MIX_N} * wgt) // total_w AS floor_k,
               ({_TEMP_MIX_N} * wgt) % total_w AS rem,
               {_TEMP_MIX_N} - SUM(({_TEMP_MIX_N} * wgt) // total_w) OVER () AS leftover
        FROM w, tot
    ),
    budgets AS (
        SELECT source, n,
               floor_k + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source) <= leftover
                              THEN 1 ELSE 0 END AS k
        FROM appo
    ),
    ranked AS (
        SELECT d.doc_id, d.source, b.k,
               ROW_NUMBER() OVER (PARTITION BY d.source
                                  ORDER BY (d.doc_id * 2654435761) % 999999937, d.doc_id) AS rk
        FROM documents d JOIN budgets b ON d.source = b.source
    )
    SELECT doc_id, source FROM ranked WHERE rk <= k ORDER BY doc_id
    """,
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19: temperature-based mixture sampling (alpha = 0.5) — rebalance
    a multi-source corpus by sampling source i proportionally to
    sqrt(n_i) instead of n_i, the standard move that up-weights small
    sources without flattening the mixture entirely. Budgets come from
    exact integer apportionment: weights are FLOOR(SQRT(n * 1e12)) —
    IEEE sqrt is correctly rounded, so the BIGINT weight is
    deterministic cross-engine (n * 1e12 < 2^53 up to ~9000 docs per
    source per... scale the constant at larger corpora) — then
    largest-remainder over BIGINT quotients (the x15 idiom; double
    division never enters the rank). Selection within each source is
    the Knuth-hash order used by corpus_mixture_sample: deterministic,
    composable, engine-portable. A source with n < k contributes all
    its docs (the mixture under-fills rather than over-samples).

    Scale: one count agg, a broadcast budgets dim, and one window
    ranked per source — the window partitions on source, so skew
    follows source sizes; at 100 TB swap the row_number for the
    hash-threshold form (keep iff hash < k/n scaled), which is
    map-only and avoids the per-source sort at the cost of ±binomial
    noise around k."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = counts.select(
        "source",
        "n",
        F.floor(F.sqrt((F.col("n") * _TEMP_MIX_SCALE).cast("double"))).cast("bigint").alias("wgt"),
    )
    tot = w.agg(F.sum("wgt").alias("total_w"))
    appo = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr(f"({_TEMP_MIX_N} * wgt) div total_w").alias("floor_k"),
        F.expr(f"({_TEMP_MIX_N} * wgt) % total_w").alias("rem"),
    )
    # leftover + remainder rank over the k-sources frame WITHOUT an
    # unpartitioned window (the engine-wide invariant: no WindowExec
    # with "No Partition Defined", even on tiny frames): the total is a
    # 1-row broadcast agg, the rank a broadcast non-equi self-join —
    # k² of a ~|sources|-row frame (the f16/ledger idiom).
    sum_floor = appo.agg(F.sum("floor_k").alias("sum_floor"))
    o = appo.select(F.col("rem").alias("o_rem"), F.col("source").alias("o_source"))
    rn_expr = F.sum(
        F.when(
            (F.col("o_rem") > F.col("rem"))
            | ((F.col("o_rem") == F.col("rem")) & (F.col("o_source") <= F.col("source"))),
            1,
        ).otherwise(0)
    )
    budgets = (
        appo.crossJoin(F.broadcast(o))
        .groupBy("source", "floor_k", "rem")
        .agg(rn_expr.alias("rn"))
        .crossJoin(F.broadcast(sum_floor))
        .select(
            "source",
            (F.col("floor_k")
             + F.when(F.col("rn") <= _TEMP_MIX_N - F.col("sum_floor"), 1).otherwise(0)
             ).alias("k"),
        )
    )
    ranked = d.join(F.broadcast(budgets), "source").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                (F.col("doc_id") * F.lit(2654435761)) % F.lit(999999937), "doc_id"
            )
        ),
    )
    return ranked.filter(F.col("rk") <= F.col("k")).select("doc_id", "source").orderBy("doc_id")


@register(
    "corpus_global_shuffle",
    """
    WITH keyed AS (
        SELECT doc_id,
               (doc_id * 2654435761) % 999999937 AS shuffle_key,
               CAST((doc_id * 1000003) % 8 AS BIGINT) AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS BIGINT) AS position
    FROM keyed
    ORDER BY doc_id
    """,
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T20: deterministic global shuffle for training — the step that
    turns a sorted/clustered corpus into i.i.d.-looking training order
    WITHOUT RNG state: shard = hash1(doc_id) mod n_shards, position
    within shard = rank of hash2(doc_id). Reproducible across reruns,
    engines and cluster sizes (the property rand()-based shuffles
    lack), and composable: a re-shuffle after appending documents
    leaves existing (shard, relative-order) pairs stable except where
    new keys interleave. Plan: one narrow map for the two hashes, one
    shuffle on shard, per-shard ranking windows bounded by corpus/8 —
    at 100 TB raise n_shards so each shard's sort fits an executor
    (position within shard is what training dataloaders consume;
    no global total order is ever materialized)."""
    d = t(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(999999937)).alias("shuffle_key"),
        ((F.col("doc_id") * F.lit(1000003)) % 8).cast("bigint").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("position", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "position")
        .orderBy("doc_id")
    )


@register(
    "corpus_source_overlap",
    r"""
    WITH rel AS (
        SELECT DISTINCT source, UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS word
        FROM documents
    ),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM rel GROUP BY source),
    shared AS (
        SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM rel a JOIN rel b ON a.word = b.word AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b, s.n_shared,
           za.vocab AS vocab_a, zb.vocab AS vocab_b,
           CAST((s.n_shared * 1000000) // (za.vocab + zb.vocab - s.n_shared) AS BIGINT) AS jaccard_micro
    FROM shared s
    JOIN sizes za ON za.source = s.src_a
    JOIN sizes zb ON zb.source = s.src_b
    ORDER BY src_a, src_b
    """,
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21: source-level vocabulary overlap matrix — pairwise Jaccard
    of the distinct-word sets of every corpus source, the redundancy
    diagnostic behind mixture design (two sources with near-identical
    vocabulary contribute less diversity than their row counts
    suggest; pair it with corpus_temperature_mixture when setting
    weights). Computed as an inverted word->source index self-join:
    each word contributes at most |sources|²/2 pairs (bounded by the
    SOURCE count, ~20, regardless of corpus size — no df cap needed,
    unlike the per-document containment join), then one integer
    Jaccard per source pair. Output is |sources|²/2 rows whatever the
    scale; jaccard is floor-scaled micro units (exact integers)."""
    d = t(spark, sf_dir, "documents")
    rel = (
        d.select("source", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"))
        .distinct()
    )
    sizes = rel.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    a, b = rel.alias("a"), rel.alias("b")
    shared = (
        a.join(b, (F.col("a.word") == F.col("b.word")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    za = sizes.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a"))
    zb = sizes.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b"))
    return (
        shared.join(F.broadcast(za), "src_a")
        .join(F.broadcast(zb), "src_b")
        .select(
            "src_a", "src_b", "n_shared", "vocab_a", "vocab_b",
            F.expr("(n_shared * 1000000) div (vocab_a + vocab_b - n_shared)")
            .cast("bigint")
            .alias("jaccard_micro"),
        )
        .orderBy("src_a", "src_b")
    )


_CDC_BOUNDARY_MOD = 16  # expected chunk length ~16 words
_CDC_PRIME = 2147483647


@register(
    "text_cdc_chunk_dedup",
    rf"""
    WITH wh AS (
        SELECT doc_id, w.i AS pos,
               ('0x' || SUBSTR(MD5(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')[w.i]), 1, 8))::BIGINT AS h
        FROM documents,
             LATERAL (SELECT UNNEST(RANGE(1, LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) + 1)) AS i) w
    ),
    marked AS (
        SELECT doc_id, pos, h,
               SUM(CASE WHEN h % {_CDC_BOUNDARY_MOD} = 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS chunk_no
        FROM wh
    ),
    inchunk AS (
        SELECT doc_id, COALESCE(chunk_no, 0) AS chunk_no, h,
               ROW_NUMBER() OVER (PARTITION BY doc_id, COALESCE(chunk_no, 0) ORDER BY pos) AS k
        FROM marked
    ),
    chunks AS (
        SELECT doc_id, chunk_no,
               CAST(SUM(h * k) % {_CDC_PRIME} AS BIGINT) AS fp,
               CAST(COUNT(*) AS BIGINT) AS chunk_len
        FROM inchunk GROUP BY doc_id, chunk_no
    )
    SELECT fp, chunk_len,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM chunks
    GROUP BY fp, chunk_len
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, fp
    LIMIT 100
    """,
)
def text_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22: content-defined chunking dedup — the rsync/LBFS trick
    applied to text: chunk boundaries fall AFTER any word whose
    portable hash is 0 mod 16 (expected chunk ~16 words), so the
    boundaries are a function of CONTENT, not position — inserting a
    sentence shifts every fixed-window segment (text_segment_dedup's
    blind spot) but leaves all other CDC chunks identical. Duplicate
    chunks across >= 2 documents surface shared boilerplate at
    sub-document granularity. The chunk fingerprint is a
    position-weighted hash sum (h_i * i mod p) — order-sensitive yet a
    pure aggregate, so no list fold is needed and both engines compute
    it as plain SUM arithmetic (h < 2^32, i <= words-per-doc, products
    < 2^48: no overflow before the mod). All windows partition by
    doc (and chunk); the dedup group-by keys on the fingerprint."""
    d = t(spark, sf_dir, "documents")
    from realestate_engine.dedup import portable_hash32

    words = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("pos0", "word"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), portable_hash32(F.col("word")).alias("h"))
    w_cum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = words.select(
        "doc_id",
        "pos",
        "h",
        F.coalesce(
            F.sum(F.when(F.col("h") % _CDC_BOUNDARY_MOD == 0, 1).otherwise(0)).over(w_cum),
            F.lit(0),
        ).alias("chunk_no"),
    )
    w_in = Window.partitionBy("doc_id", "chunk_no").orderBy("pos")
    inchunk = marked.withColumn("k", F.row_number().over(w_in))
    chunks = inchunk.groupBy("doc_id", "chunk_no").agg(
        (F.sum(F.col("h") * F.col("k")) % _CDC_PRIME).cast("bigint").alias("fp"),
        F.count(F.lit(1)).cast("bigint").alias("chunk_len"),
    )
    return (
        chunks.groupBy("fp", "chunk_len")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "fp")
        .limit(100)
    )


def _langid_confusion_oracle() -> str:
    """Composed from the registered langid oracle: wrap its prediction
    as a CTE and join actual labels — one source of truth."""
    from realestate_engine.registry import ORACLES

    lid = ORACLES["text_langid"].strip()
    assert lid.startswith("WITH")
    cut = lid.rindex("SELECT doc_id,")
    prelude = lid[:cut].rstrip()
    if not prelude.endswith(","):
        prelude += ","
    body = lid[cut:].replace("ORDER BY doc_id", "")
    return (
        prelude
        + "\n    pred AS (\n"
        + body
        + "\n    )\n"
        + """
    SELECT d.lang AS actual_lang, p.predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
    )


@register("text_langid_confusion", None)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23: language-ID quality report — the confusion matrix of the
    marker-token heuristic (text_langid) against the corpus's actual
    lang labels, registered as a driver-checked query so the
    heuristic's error structure is DATA (which languages it confuses,
    how much lands in 'und'), not a one-off notebook check — the same
    in-engine-observability move as sim_ann_recall_report. Exact
    integer counts; the oracle wraps the registered langid oracle as a
    CTE, keeping one source of truth for the prediction."""
    pred = text_langid(spark, sf_dir).select("doc_id", "predicted_lang")
    d = t(spark, sf_dir, "documents").select("doc_id", F.col("lang").alias("actual_lang"))
    return (
        d.join(pred, "doc_id")
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("actual_lang", "predicted_lang")
    )


from realestate_engine.registry import ORACLES as _ORACLES_T  # noqa: E402

_ORACLES_T["text_langid_confusion"] = _langid_confusion_oracle()


@register(
    "t19_zipf_fit",
    r"""
    WITH words AS (
        SELECT UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'),
                                  x -> LEN(x) > 0)) AS w
        FROM documents
    ),
    freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM words GROUP BY w
    ),
    top AS (
        SELECT w, f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS rnk
        FROM freq QUALIFY rnk <= 100
    ),
    pts AS (
        SELECT CAST(FLOOR(LN(rnk) * 1e6) AS BIGINT) AS x,
               CAST(FLOOR(LN(f) * 1e6) AS BIGINT) AS y
        FROM top
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts
    )
    SELECT n AS n_points,
           CAST((n * sxy - sx * sy) // ((n * sxx - sx * sx) // 1000000) AS BIGINT)
               AS slope_micro,
           CAST((sy - (((n * sxy - sx * sy) // ((n * sxx - sx * sx) // 1000000)) * sx) // 1000000)
                // n AS BIGINT) AS intercept_micro
    FROM s
    """,
)
def t19_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T19: Zipf rank-frequency fit — the corpus-health statistic
    (natural text has log-log slope near -1; scraped boilerplate and
    synthetic spam bend it) as an OLS line over the top-100 word
    frequencies. Determinism stack: top-100 by (freq DESC, word) from
    TakeOrdered (never a global sort); ranks inside the 100-row frame
    via the broadcast rank-join idiom (no unpartitioned window);
    ln(rank)/ln(freq) FLOOR-scaled to integer micros PER POINT so the
    OLS sums are order-free BIGINT arithmetic; slope and intercept
    derived with integer division only. reference has no corpus
    statistics; this extends text.py's quality family."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("w")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    top = freq.orderBy(F.col("f").desc(), "w").limit(100)
    o = top.select(F.col("w").alias("o_w"), F.col("f").alias("o_f"))
    rnk = F.sum(
        F.when(
            (F.col("o_f") > F.col("f"))
            | ((F.col("o_f") == F.col("f")) & (F.col("o_w") <= F.col("w"))),
            1,
        ).otherwise(0)
    )
    ranked = (
        top.crossJoin(F.broadcast(o))
        .groupBy("w", "f")
        .agg(rnk.alias("rnk"))
    )
    pts = ranked.select(
        F.floor(F.log(F.col("rnk").cast("double")) * 1e6).cast("bigint").alias("x"),
        F.floor(F.log(F.col("f").cast("double")) * 1e6).cast("bigint").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )

    # Spark `div` and DuckDB `//` BOTH truncate toward zero on
    # negatives (verified; the slope here is negative) — plain integer
    # division is portable as long as every `/` in the oracle is `//`
    slope = "((n * sxy - sx * sy) div ((n * sxx - sx * sx) div 1000000))"
    intercept = f"((sy - (({slope} * sx) div 1000000)) div n)"
    return s.select(
        F.col("n").alias("n_points"),
        F.expr(slope).cast("bigint").alias("slope_micro"),
        F.expr(intercept).cast("bigint").alias("intercept_micro"),
    )


@register(
    "t21_source_reuse_matrix",
    r"""
    WITH segs AS (
        SELECT DISTINCT source,
               UNNEST(LIST_TRANSFORM(
                   RANGE(0, GREATEST(CAST(CEIL(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+') ) / 20.0) AS INTEGER), 1)),
                   s -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+'),
                                                   s * 20 + 1, s * 20 + 20), ' ')
               )) AS seg
        FROM documents
    ),
    df AS (
        SELECT seg, COUNT(*) AS nsrc FROM segs GROUP BY seg
    ),
    capped AS (
        SELECT s.source, s.seg FROM segs s JOIN df USING (seg) WHERE df.nsrc <= 10
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_segments
    FROM capped a JOIN capped b
      ON a.seg = b.seg AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def t21_source_reuse_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21: cross-source text-reuse attribution — WHICH sources share
    verbatim 20-word segments with which (the provenance question
    after text_segment_dedup says boilerplate exists: syndication,
    mirroring, or template reuse between feeds). Shape: distinct
    (source, segment) pairs, a df-cap on segments present in > 10
    sources (universal boilerplate would otherwise make the self-join
    quadratic in the hottest segment — the containment join's cap
    argument), then a segment-keyed self-join whose output is at most
    |sources|^2 rows. The segment relation is linear in corpus size;
    the join volume scales with capped per-segment source counts,
    never all-pairs of documents."""
    d = t(spark, sf_dir, "documents").select(
        "source", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("words")
    )
    segs = (
        d.select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(cast(ceil(size(words) / 20.0) as int), 1) - 1),"
                    " s -> array_join(slice(words, s * 20 + 1, 20), ' '))"
                )
            ).alias("seg"),
        )
        .distinct()
    )
    df_cap = segs.groupBy("seg").agg(F.count(F.lit(1)).alias("nsrc")).filter(
        F.col("nsrc") <= 10
    )
    capped = segs.join(df_cap.select("seg"), "seg", "left_semi")
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(b, (F.col("a.seg") == F.col("b.seg")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_segments"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-corpus dedup key)
# ---------------------------------------------------------------------------


@register(
    "t22_url_canonicalize",
    r"""
    WITH raw AS (
        SELECT 'https://Shop' || CAST(o_custkey % 50 AS VARCHAR) || '.Example.COM/item/'
               || CAST(o_orderkey % 100 AS VARCHAR)
               || CASE WHEN o_orderkey % 2 = 0
                       THEN '?page=' || CAST(o_custkey % 5 AS VARCHAR)
                            || '&utm_source=s' || CAST(o_orderkey % 7 AS VARCHAR)
                       ELSE '?utm_campaign=c' || CAST(o_orderkey % 3 AS VARCHAR) END
               || CASE WHEN o_orderkey % 5 = 0 THEN '#frag' ELSE '' END AS url
        FROM orders
    ),
    canon AS (
        SELECT LOWER(REGEXP_EXTRACT(url, '^https://([^/?#]+)', 1)) AS host,
               'https://' || LOWER(REGEXP_EXTRACT(url, '^https://([^/?#]+)', 1))
               || REGEXP_EXTRACT(url, '^https://[^/?#]+([^?#]*)', 1)
               || CASE WHEN REGEXP_EXTRACT(url, '[?&]page=([0-9]+)', 1) <> ''
                       THEN '?page=' || REGEXP_EXTRACT(url, '[?&]page=([0-9]+)', 1)
                       ELSE '' END AS canonical
        FROM raw
    )
    SELECT host,
           REGEXP_EXTRACT(host, '([a-z0-9-]+\.[a-z]+)$', 1) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical,
           CAST(COUNT(*) - COUNT(DISTINCT canonical) AS BIGINT) AS n_dupes
    FROM canon GROUP BY host
    ORDER BY host
    """,
)
def t22_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22: URL canonicalization — the first dedup key of every
    crawl-derived corpus (CommonCrawl WET processing drops ~2-3x by
    canonical-URL before any content hashing). Tracking params
    (utm_*), fragments, and host case are non-identity; real routing
    params (page) are identity. The canonical form is REBUILT from
    parsed parts (scheme + lowercased host + path + whitelisted
    params) rather than surgically regex-deleted — the rebuild is
    order-insensitive to junk-param position and engine-portable
    (RE2-safe patterns, no lookarounds). URLs are PLANTED
    deterministically from orders (the testdata carries none), the
    same idiom as t14_pii_redaction's planted emails.

    Scale: pure per-row string expressions inside whole-stage codegen,
    one hash-agg by host — the groupBy is the only shuffle; at 100 TB
    host is the natural partition key and COUNT(DISTINCT canonical)
    becomes the partial-agg-friendly distinct Spark already plans."""
    raw = t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("https://Shop"),
            (F.col("o_custkey") % 50).cast("string"),
            F.lit(".Example.COM/item/"),
            (F.col("o_orderkey") % 100).cast("string"),
            F.when(
                F.col("o_orderkey") % 2 == 0,
                F.concat(
                    F.lit("?page="),
                    (F.col("o_custkey") % 5).cast("string"),
                    F.lit("&utm_source=s"),
                    (F.col("o_orderkey") % 7).cast("string"),
                ),
            ).otherwise(F.concat(F.lit("?utm_campaign=c"), (F.col("o_orderkey") % 3).cast("string"))),
            F.when(F.col("o_orderkey") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
        ).alias("url")
    )
    host = F.lower(F.regexp_extract("url", r"^https://([^/?#]+)", 1))
    path = F.regexp_extract("url", r"^https://[^/?#]+([^?#]*)", 1)
    page = F.regexp_extract("url", r"[?&]page=([0-9]+)", 1)
    canon = raw.select(
        host.alias("host"),
        F.concat(
            F.lit("https://"),
            host,
            path,
            F.when(page != "", F.concat(F.lit("?page="), page)).otherwise(F.lit("")),
        ).alias("canonical"),
    )
    return (
        canon.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("canonical").cast("long").alias("n_canonical"),
        )
        .select(
            "host",
            F.regexp_extract("host", r"([a-z0-9-]+\.[a-z]+)$", 1).alias("domain"),
            "n_urls",
            "n_canonical",
            (F.col("n_urls") - F.col("n_canonical")).cast("long").alias("n_dupes"),
        )
        .orderBy("host")
    )



@register(
    "t24_weighted_sample_aes",
    """
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               CAST(FLOOR(
                   LN((('0x' || SUBSTR(MD5('aes-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                      / 4294967296.0)
                   * 1000000000.0 / n_chars) AS BIGINT) AS key_nano
        FROM documents WHERE n_chars > 0
    ),
    ranked AS (
        SELECT source, doc_id, n_chars, key_nano,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY key_nano DESC, doc_id) AS rk
        FROM keyed
    )
    SELECT source, CAST(rk AS BIGINT) AS rank, doc_id, CAST(n_chars AS BIGINT) AS weight,
           key_nano
    FROM ranked WHERE rk <= 5
    ORDER BY source, rank
    """,
)
def t24_weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T24: weighted sampling WITHOUT replacement per stratum —
    Efraimidis-Spirakis exponential keys (A-ES): each doc draws
    u = (hash+1)/2^32 from the portable-md5 family (an exact dyadic
    rational, so the double is bit-identical on both engines) and is
    ranked by ln(u)/w, w = n_chars; the top-k per source is a
    weight-proportional sample, reproducible forever from the key
    alone (the seeded-RNG sampling p10/p16 can't be replayed
    cross-engine; this can, which is why it carries a full value
    oracle). The key is FLOOR-scaled to integer nanos — the repo's
    order-free float idiom — with doc_id tiebreak so a FLOOR collision
    cannot flip membership.

    Scale: one scan computes keys in codegen, one shuffle partitions
    by stratum, and the top-k window is source-PARTITIONED. At 100 TB
    swap the window for the distributed top-k-per-group idiom (o3) if
    strata are huge; the key math is unchanged."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    from realestate_engine.dedup import portable_hash32

    u = (portable_hash32(F.concat(F.lit("aes-"), F.col("doc_id").cast("string"))) + 1) / F.lit(4294967296.0)
    keyed = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.floor(F.log(u) * 1000000000.0 / F.col("n_chars")).cast("long").alias("key_nano"),
    )
    w = Window.partitionBy("source").orderBy(F.col("key_nano").desc(), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "source",
            F.col("rk").cast("long").alias("rank"),
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            "key_nano",
        )
        .orderBy("source", "rank")
    )



_DSIR_TARGET_SOURCES = ("src0", "src1", "src2")


@register(
    "t28_dsir_importance_weights",
    r"""
    WITH words AS (
        SELECT d.doc_id, d.source,
               (d.source IN ('src0', 'src1', 'src2')) AS is_target,
               UNNEST(STRING_SPLIT_REGEX(LOWER(TRIM(d.text)), '\s+')) AS word
        FROM documents d
    ),
    stats AS (
        SELECT word,
               CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct,
               CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cr
        FROM words GROUP BY word
    ),
    totals AS (
        SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM stats
    ),
    weights AS (
        SELECT word,
               CAST(FLOOR(1000000.0 * (
                   LN(CAST(ct + 1 AS DOUBLE)) - LN(CAST(nt + v AS DOUBLE))
                   - LN(CAST(cr + 1 AS DOUBLE)) + LN(CAST(nr + v AS DOUBLE))
               )) AS BIGINT) AS term_micro
        FROM stats CROSS JOIN totals
    ),
    tf AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM words GROUP BY doc_id, word
    ),
    scored AS (
        SELECT tf.doc_id, CAST(SUM(tf.tf * w.term_micro) AS BIGINT) AS dsir_logweight_micro
        FROM tf JOIN weights w USING (word)
        GROUP BY tf.doc_id
    )
    SELECT s.doc_id, d.source, s.dsir_logweight_micro
    FROM scored s JOIN documents d USING (doc_id)
    ORDER BY s.dsir_logweight_micro DESC, s.doc_id
    LIMIT 50
    """,
)
def t28_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw document by the log-likelihood ratio of a
    Laplace-smoothed unigram LM fit on a small TARGET slice (sources
    src0-src2) vs the full raw remainder, then surface the top-50
    most-target-like documents. The per-token log-ratio is computed
    ONCE per vocabulary type and FLOOR-scaled to integer micros, so the
    per-document sum Σ tf·term is exact BIGINT arithmetic — order-free
    and bit-identical to the oracle (the ln() calls hit the same libm
    on identical integer inputs in the same expression order).

    Plan: one token explode feeding two hash aggregations (type stats,
    per-doc tf); the vocabulary-sized weight table is broadcast into
    the tf join (vocabulary ≪ corpus at any scale — at 100 TB the tf
    side shuffles on doc_id only for its own agg, never the corpus on
    word); totals ride a 1-row broadcast cross join. Beyond-reference
    north-star op (LLM training-data curation)."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.col("source").isin(*_DSIR_TARGET_SOURCES).alias("is_target"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    )
    stats = words.groupBy("word").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("bigint").alias("ct"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).cast("bigint").alias("cr"),
    )
    totals = stats.agg(
        F.sum("ct").cast("bigint").alias("nt"),
        F.sum("cr").cast("bigint").alias("nr"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    weights = stats.crossJoin(F.broadcast(totals)).select(
        "word",
        F.floor(
            1000000.0
            * (
                F.log((F.col("ct") + 1).cast("double"))
                - F.log((F.col("nt") + F.col("v")).cast("double"))
                - F.log((F.col("cr") + 1).cast("double"))
                + F.log((F.col("nr") + F.col("v")).cast("double"))
            )
        )
        .cast("bigint")
        .alias("term_micro"),
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    scored = (
        tf.join(F.broadcast(weights), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("term_micro")).cast("bigint").alias("dsir_logweight_micro"))
    )
    return (
        scored.join(d.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "dsir_logweight_micro")
        .orderBy(F.col("dsir_logweight_micro").desc(), "doc_id")
        .limit(50)
    )
