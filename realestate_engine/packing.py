"""Sequence packing: greedy first-fit of documents into fixed
token-budget context windows — the step between "clean corpus" and
"training batches" in an LLM data pipeline.

Packing is inherently stateful (each placement depends on the running
fill of the current window), so it cannot be a window function. The
scale design makes the state small instead of global: documents are
sharded by a deterministic key hash, and packing runs independently
per shard via ``applyInPandas`` (Arrow-batched). At 100 TB you raise
``n_shards`` to (cluster cores × a few) — packing quality is
per-shard-greedy either way, and no shard ever sees more than
|corpus|/n_shards rows. A driver-side loop would be the anti-pattern
here; this keeps every byte executor-side.

Deterministic: shard = doc_id mod n_shards, docs packed in doc_id
order, pack ids are shard-prefixed — repeated runs give identical
assignments (driver-checked against a recursive-CTE DuckDB oracle +
invariant tests in tests/test_packing_timeseries.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_engine.registry import register, t

PACK_SCHEMA = (
    "doc_id bigint, shard bigint, pack_id bigint, n_tokens bigint, pack_seq bigint"
)


def pack_greedy(docs: DataFrame, budget: int, n_shards: int) -> DataFrame:
    """Assign each doc (doc_id, n_tokens) to a pack of ≤ ``budget``
    total tokens (oversized docs get a singleton pack). Returns
    doc_id, shard, pack_id, n_tokens, pack_seq (position in pack)."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        pack_ids, seqs = [], []
        pack_no, fill, seq = 0, 0, 0
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if fill > 0 and fill + tok > budget:
                pack_no, fill, seq = pack_no + 1, 0, 0
            pack_ids.append(shard * 1_000_000 + pack_no)
            seqs.append(seq)
            fill += tok
            seq += 1
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_seq"] = pd.Series(seqs, dtype="int64")
        return pdf[["doc_id", "shard", "pack_id", "n_tokens", "pack_seq"]]

    sharded = docs.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)))
    # explicit repartition: AQE would coalesce the small shuffle to one
    # partition and serialize the Arrow stage through a single Python
    # worker (see session.py note)
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    return (
        sharded.repartition(n_part, "shard")
        .groupBy("shard")
        .applyInPandas(_pack, PACK_SCHEMA)
    )


@register(
    "pack_documents_greedy",
    r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, doc_id % 8 AS shard,
               CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, shard, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM toks
    ),
    walk(shard, rn, doc_id, n_tokens, pack_no, fill, seq) AS (
        SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens, CAST(0 AS BIGINT)
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN w.fill + o.n_tokens > 256 THEN w.pack_no + 1 ELSE w.pack_no END,
               CASE WHEN w.fill + o.n_tokens > 256 THEN o.n_tokens ELSE w.fill + o.n_tokens END,
               CASE WHEN w.fill + o.n_tokens > 256 THEN CAST(0 AS BIGINT) ELSE w.seq + 1 END
        FROM walk w JOIN ordered o ON o.shard = w.shard AND o.rn = w.rn + 1
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(shard * 1000000 + pack_no AS BIGINT) AS pack_id,
           n_tokens, seq AS pack_seq
    FROM walk ORDER BY doc_id
    """,
)
def pack_documents_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the documents table into 256-token windows (whitespace
    token count) across 8 shards. Oracle-checked since round 4: the
    per-shard greedy scan IS SQL-expressible as a linear recursive CTE
    that threads (pack_no, fill, seq) through the doc_id-ordered rows
    of every shard simultaneously — O(max rows per shard) recursion
    depth, fine at oracle scale, while the Spark side stays the
    applyInPandas per-shard scan that's linear at any scale. The
    budget/coverage/determinism invariants remain pytest-enforced."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    return pack_greedy(d, budget=256, n_shards=8).orderBy("doc_id")


@register(
    "pack_length_buckets",
    r"""
    WITH toks AS (
        SELECT doc_id,
               LEN(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\s+')) AS tok
        FROM documents
    ),
    bucketed AS (
        SELECT doc_id, tok,
               CAST(FLOOR(LOG2(GREATEST(tok, 1))) AS BIGINT) AS bucket
        FROM toks
    )
    SELECT bucket,
           CAST(POW(2, bucket) AS BIGINT) AS bucket_min_tok,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(tok) AS BIGINT) AS max_tok,
           CAST(SUM(tok) AS BIGINT) AS sum_tok,
           CAST(COUNT(*) * MAX(tok) - SUM(tok) AS BIGINT) AS padding_waste
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK2: length-bucketed batching accounting — group documents into
    power-of-two token-length buckets and report the padding waste
    (rows x bucket-max minus actual tokens) a padded batch of each
    bucket would burn. This is the measurement behind dynamic batching
    in training pipelines: uniform batches pad everything to the corpus
    max; bucketing bounds waste to <2x within a bucket. One scan, one
    partial-aggregated groupBy on a ~log2(max_len)-cardinality key —
    at 100 TB the bucket count stays ~30 regardless of corpus size
    (floor(log2) on a bounded token range), so the final reduce is
    trivially small. floor(log2(tok)) is exact integer both engines."""
    d = t(spark, sf_dir, "documents")
    tok = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    b = (
        d.select(F.floor(F.log2(F.greatest(tok, F.lit(1)))).cast("bigint").alias("bucket"),
                 tok.cast("bigint").alias("tok"))
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("tok").cast("bigint").alias("max_tok"),
            F.sum("tok").cast("bigint").alias("sum_tok"),
        )
        .select(
            "bucket",
            F.pow(F.lit(2.0), F.col("bucket").cast("double")).cast("bigint").alias("bucket_min_tok"),
            "n_docs",
            "max_tok",
            "sum_tok",
            (F.col("n_docs") * F.col("max_tok") - F.col("sum_tok")).cast("bigint").alias("padding_waste"),
        )
        .orderBy("bucket")
    )
