"""Synthesize an sf1-scale test directory for the ML-oracle dry-run
(VERDICT r12 #8).

The driver ships sf0.001/0.01/0.1 only; the m17 HUGEINT interval key
(FLOOR(mean_cents * 1e15)) is documented injective while interval
weights stay below sqrt(1e15) ~ 3.1e7 rows — sf1's ~6M-row lineitem
sits 5x inside that bound ON PAPER. This script makes the bound
empirical: it writes <out>/{lineitem,orders,events}.parquet at 10x
sf0.1 volume (deterministic replication: replica i offsets every key
far past the original domain and perturbs the continuous columns by a
ppm-scale factor so replicated rows do not collapse into duplicate
values), then symlinks the remaining seven tables from sf0.1 so
registry.t() and the DuckDB view setup resolve every name.

Usage: python tools/make_sf1.py [--out /root/repo/.sf1]
Then:  python tools/check_oracle.py --sf /root/repo/.sf1 \
           m17_isotonic_calibration m21_glm_poisson m24_aft_survival
       python tools/grid_margin.py --sf /root/repo/.sf1
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
# key offsets comfortably past each sf0.1 key domain
ORDERKEY_OFF = 10_000_000
CUSTKEY_OFF = 1_000_000
EVENTKEY_OFF = 10_000_000
USERKEY_OFF = 1_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.sf1")
    ap.add_argument("--full", action="store_true",
                    help="also scale documents/embeddings 10x "
                         "(token-rotated / ppm-jittered replicas)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT UNNEST(RANGE({REPLICAS})) AS i")

    # ppm-scale deterministic perturbation: (i*7 % 13 - 6) in
    # [-6, +6] ppm-ish units — enough to decollide replicated doubles,
    # far too small to move any distributional property.
    jit = "(1.0 + ((i * 7) % 13 - 6) * 1e-6)"

    con.execute(f"""
        COPY (
            SELECT l_orderkey + i * {ORDERKEY_OFF} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber,
                   l_quantity,
                   l_extendedprice * {jit} AS l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet'), reps
        ) TO '{args.out}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT o_orderkey + i * {ORDERKEY_OFF} AS o_orderkey,
                   o_custkey + i * {CUSTKEY_OFF} AS o_custkey,
                   o_orderstatus,
                   o_totalprice * {jit} AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet'), reps
        ) TO '{args.out}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT event_id + i * {EVENTKEY_OFF} AS event_id,
                   ts + INTERVAL (i) SECOND AS ts,
                   user_id + i * {USERKEY_OFF} AS user_id,
                   event_type,
                   value * {jit} AS value,
                   props
            FROM read_parquet('{SRC}/events.parquet'), reps
        ) TO '{args.out}/events.parquet' (FORMAT PARQUET)
    """)

    if args.full:
        # documents: SUBSTITUTE every 7th token with a replica-tagged
        # variant (replica 0 stays byte-identical). A token ROTATION
        # is NOT enough — rotating a sequence preserves every interior
        # k-gram, so replicas would be planted 10-way near-dups and
        # any shingle-based dedup timing would blow up quadratically
        # in the replication factor for DATA reasons, not plan reasons
        # (measured: dedup_ngram_jaccard 32x under rotation). With
        # 1-in-7 substitution, ~(6/7)^k of k-shingles survive
        # (~63% for k=3), putting replica-pair Jaccard ~0.46 — below
        # near-dup thresholds, so the corpus scales without planting
        # duplicate mega-clusters.
        con.execute(f"""
            COPY (
                WITH d AS (
                    SELECT *, STRING_SPLIT(text, ' ') AS tk
                    FROM read_parquet('{SRC}/documents.parquet')
                ),
                r AS (
                    SELECT doc_id + i * 10000000 AS doc_id,
                           CASE WHEN i = 0 THEN text
                                ELSE ARRAY_TO_STRING(
                                    LIST_TRANSFORM(tk,
                                        (x, j) -> CASE WHEN (j + i) % 7 = 0
                                                  THEN x || 'x' || i
                                                  ELSE x END),
                                    ' ')
                           END AS text,
                           lang, source
                    FROM d, reps
                )
                SELECT doc_id, text, lang, source,
                       CAST(LEN(text) AS BIGINT) AS n_chars
                FROM r
            ) TO '{args.out}/documents.parquet' (FORMAT PARQUET)
        """)
        # embeddings: replica-dependent deterministic noise at ~1
        # per-dim std (amplitude +-0.12 vs std 0.125), replica 0
        # untouched. ppm jitter is NOT enough — it leaves replicas as
        # genuine 10-way duplicate clusters (cosine ~ 1 - 1e-12), so
        # every sign-bucket pair is a true near-dup and the verify
        # stage legitimately does ~replication^2 work (measured:
        # dedup_embedding_cosine >= 100x under ppm jitter). At 1-std
        # noise, replica-pair cosine ~ 0.87 — below dedup thresholds —
        # while the 10-cluster label geometry survives.
        con.execute(f"""
            COPY (
                SELECT vec_id + i * 10000000 AS vec_id,
                       LIST_TRANSFORM(embedding,
                           (x, j) -> CAST(x + CASE WHEN i = 0 THEN 0.0
                               ELSE ((vec_id * 31 + j * 17 + i * 13) % 25 - 12)
                                    * 0.01 END AS FLOAT)) AS embedding,
                       label
                FROM read_parquet('{SRC}/embeddings.parquet'), reps
            ) TO '{args.out}/embeddings.parquet' (FORMAT PARQUET)
        """)

    small = ["region", "nation", "customer", "supplier", "part"]
    if not args.full:
        small += ["documents", "embeddings"]
    for tbl in small:
        dst = os.path.join(args.out, f"{tbl}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{tbl}.parquet", dst)

    for tbl in ["lineitem", "orders", "events"]:
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.out}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()
