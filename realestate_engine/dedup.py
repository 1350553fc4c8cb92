"""Deduplication operators (north-star extension; VERDICT r1 item 7).

Five strategies, all shuffle-bounded (never all-pairs over the corpus):

- exact:        hash-groupBy via dropDuplicates — one shuffle on the key.
- keep-newest:  row_number over (key, order desc) — one shuffle, SQL-checkable.
- MinHash LSH:  shingle → minhash sketch → band buckets → join within
                buckets only. Candidate pairs scale with bucket sizes,
                not corpus²; this is the 100 TB fuzzy-dedup path.
- SimHash:      64-bit weighted fingerprint; near-dups agree on most
                bits → bucket by band-of-bits and compare hamming.
- n-gram Jaccard: exact verification metric for LSH candidates.

No Python row-at-a-time UDFs: shingling, hashing (xxhash64/crc32),
min-reduction and band extraction are all native SQL expressions inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realestate_engine.registry import register, t

# ---------------------------------------------------------------------------
# Exact + keep-newest (SQL-checkable)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    "SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup = hash-aggregate on all columns: one shuffle keyed by
    the row hash; partial aggregation removes local duplicates map-side."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity").dropDuplicates()


@register(
    "dedup_keep_newest",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    """,
)
def dedup_keep_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-newest-per-key: deterministic total order (date desc, key
    desc tiebreak) so exactly one survivor per key."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash (native expressions)
# ---------------------------------------------------------------------------


def word_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-grams as an array<string> — a native higher-order
    expression (sequence + transform), no UDF."""
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    # sequence(0, k) with k < 0 would generate a DESCENDING sequence in
    # Spark, so guard the short-text case with an empty index array.
    idx = F.when(F.size(words) >= n, F.sequence(F.lit(0), F.size(words) - n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


# Large primes for the (a*x + b) mod p family of minhash permutations.
_MINHASH_PRIME = 2147483647  # 2^31 - 1
_MINHASH_COEFFS = [
    (2971215073, 433494437), (1500450271, 2971215073), (982451653, 1500450271),
    (472882027, 982451653), (433494437, 87178291199 % _MINHASH_PRIME),
    (268435399, 472882027), (179424673, 268435399), (104395303, 179424673),
    (15485863, 104395303), (32452843, 15485863), (49979687, 32452843),
    (67867967, 49979687), (86028121, 67867967), (122949829, 86028121),
    (141650939, 122949829), (160481183, 141650939),
]


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash sketch: per permutation i, min over shingles of
    (a_i * crc32(s) + b_i) mod p. Everything stays a codegen'd
    expression — array_min over a transformed array."""
    sigs = []
    for a, b in _MINHASH_COEFFS[:num_hashes]:
        sigs.append(
            F.array_min(
                F.transform(shingles, lambda s: (F.crc32(s) * F.lit(a % _MINHASH_PRIME) + F.lit(b)) % F.lit(_MINHASH_PRIME))
            )
        )
    return F.array(*sigs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: band the signature, self-join on
    (band_index, band_hash) buckets, dedup pairs. The join is keyed by
    bucket — candidate volume scales with bucket occupancy, never n²."""
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(word_shingles(F.col(text_col), shingle_n), num_hashes).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", i * rows_per_band + 1, rows_per_band))
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates()
    )


@register("dedup_minhash_lsh")  # sketch-based candidates → rows-only check
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidate pairs over documents, with
    the exact Jaccard of each candidate attached (verification stage of
    the LSH pipeline). Deterministic: fixed hash family, fixed banding."""
    d = t(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(d, "doc_id", "text")
    sh = d.select(F.col("doc_id"), word_shingles(F.col("text")).alias("sh"))
    return (
        cands.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (SQL-checkable against DuckDB list algebra)
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    """
    WITH sh AS (
        SELECT doc_id, lang, source,
               LIST_DISTINCT(LIST_TRANSFORM(
                   RANGE(1, GREATEST(LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')) - 1, 1)),
                   i -> CONCAT_WS(' ',
                        STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')[i],
                        STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')[i+1],
                        STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+')[i+2])
               )) AS sh
        FROM documents WHERE n_chars <= 200
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(LEN(LIST_INTERSECT(a.sh, b.sh)) AS DOUBLE)
                 / LEN(LIST_DISTINCT(LIST_CONCAT(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity for pairs bucketed by
    (lang, source) — the bucketing keeps the pair count bounded per
    group (at 100 TB the bucket key would be an LSH band instead)."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") <= 200)
    sh = d.select("doc_id", "lang", "source", word_shingles(F.col("text"), 3).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    return a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.round(
            F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
            / F.size(F.array_union("a.sh", "b.sh")),
            6,
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# SimHash (deterministic 32-bit, native expressions)
# ---------------------------------------------------------------------------


def simhash32(text_col: Column) -> Column:
    """32-bit SimHash: per token crc32, each bit votes +1/-1, sign of the
    per-bit sum forms the fingerprint. Expressed as a fold over the
    token array — no UDF."""
    tokens = F.split(F.lower(F.trim(text_col)), r"\s+")
    hashes = F.transform(tokens, lambda w: F.crc32(w))
    # F.shiftleft/shiftright take Python-int bit counts only, so bit b of
    # h is extracted as floor(h / 2^b) % 2 (h < 2^32 « 2^53: exact).
    bit_sums = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when((h / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2 == 1, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_sums,
            F.sequence(F.lit(0), F.lit(31)),
            lambda s, b: F.when(s > 0, F.pow(F.lit(2.0), b.cast("double"))).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ).cast("long")


@register("dedup_simhash")  # bit-fingerprint → rows-only check
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + bucket prefix (top 8 bits). Near-duplicate
    texts land in the same bucket; at scale, compare hamming distance
    within buckets only."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", simhash32(F.col("text")).alias("simhash"))
        .withColumn("bucket", F.expr("simhash div 16777216"))  # top 8 of 32 bits
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicates (SQL-checkable)
# ---------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity between two float arrays as a native zip_with/
    aggregate expression (Arrow-free, codegen'd). Elements are widened
    to double BEFORE multiplying so the result is engine-portable
    (float32 products differ from DuckDB's double path in the 6th
    decimal)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


@register(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_DOT_PRODUCT(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (SQRT(LIST_DOT_PRODUCT(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * SQRT(LIST_DOT_PRODUCT(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(LIST_DOT_PRODUCT(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (SQRT(LIST_DOT_PRODUCT(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * SQRT(LIST_DOT_PRODUCT(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) > 0.5
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, bucketed by
    label so the pair space is per-bucket, not corpus² (at 100 TB the
    bucket key is an LSH/IVF cell, see similarity.py)."""
    e = t(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = F.round(cosine_sim(F.col("a.embedding"), F.col("b.embedding")), 4)
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"), cos.alias("cosine"))
        .filter(F.col("cosine") > 0.5)
    )
