"""Derive an sf1-scale bench dataset from the sf0.1 fixtures.

The driver ships fixtures up to sf0.1; the round-5 verdict's stretch item
asks for an sf1 (10×) scaling point for the heavy bench trio
(curate_corpus_full, join_bloom, dedup_minhash). This derives one
DETERMINISTICALLY from sf0.1 — no new synthetic distributions:

- documents: 10 replicas; replica 0 is the original, replicas 1-9 offset
  doc_id by r*10^9 and SHUFFLE each document's words with a per-(replica,
  doc) seeded permutation. Word-shuffling destroys nearly all n>=3-gram
  shingles, so replicas are NOT near-duplicates of each other and the
  dedup/curation workload keeps the same clustered SHAPE as sf0.1 at 10×
  the rows (naively duplicating text would instead create 10-way
  near-dup clusters and benchmark a different, cluster-explosion
  workload). Token counts, quality ratios and source mix are preserved
  exactly (same multiset of words per doc).
- orders/lineitem: 10 replicas with orderkeys offset by r*10^9 on BOTH
  sides, prices/dates untouched — per-replica join selectivity identical
  to sf0.1, build-side cardinality 10×.

Output: /root/repo/.benchdata/sf1/{documents,orders,lineitem}.parquet
(only the tables the heavy trio reads). Run: python tools/gen_benchdata.py
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".benchdata", "sf1")
REPLICAS = 10
OFFSET = 10**9


def _shuffle_words(text: str, seed: int) -> str:
    words = text.split(" ")
    random.Random(seed).shuffle(words)
    return " ".join(words)


def gen_documents():
    tbl = duckdb.sql(f"SELECT * FROM '{SRC}/documents.parquet'").arrow()
    cols = tbl.column_names
    docs = tbl.to_pylist()
    out = []
    for r in range(REPLICAS):
        for row in docs:
            d = dict(row)
            d["doc_id"] = row["doc_id"] + r * OFFSET
            if r > 0:
                d["text"] = _shuffle_words(row["text"], seed=r * OFFSET + row["doc_id"])
            out.append(d)
    pq.write_table(
        pa.Table.from_pylist(out, schema=tbl.schema),
        os.path.join(OUT, "documents.parquet"),
        row_group_size=65536,
    )
    print(f"documents: {len(out)} rows ({len(docs)} x {REPLICAS})")


def gen_embeddings():
    """10 replicas of the embeddings table (round-8 verdict #5: the ANN
    recall telemetry needs a larger-scale point). Replica 0 is the
    original; replicas 1-9 offset vec_id by r*10^9 and SHUFFLE each
    vector's COMPONENT ORDER with a per-(replica, vec) seeded permutation
    — the embedding twin of the document word shuffle: norms (hence
    cluster-radius scale) are preserved exactly, while a random 64-dim
    permutation decorrelates the replica from the original (expected
    cosine ≈ the corpus mean), so the 10× corpus keeps the same local
    neighborhood SHAPE instead of planting 10-way exact-duplicate
    neighbors that would make every recall probe trivially easy."""
    tbl = duckdb.sql(f"SELECT * FROM '{SRC}/embeddings.parquet'").arrow()
    rows = tbl.to_pylist()
    out = []
    for r in range(REPLICAS):
        for row in rows:
            d = dict(row)
            d["vec_id"] = row["vec_id"] + r * OFFSET
            if r > 0:
                vec = list(row["embedding"])
                random.Random(r * OFFSET + row["vec_id"]).shuffle(vec)
                d["embedding"] = vec
            out.append(d)
    pq.write_table(
        pa.Table.from_pylist(out, schema=tbl.schema),
        os.path.join(OUT, "embeddings.parquet"),
        row_group_size=65536,
    )
    print(f"embeddings: {len(out)} rows ({len(rows)} x {REPLICAS})")


def gen_keyed(table: str, key_cols: tuple[str, ...]):
    con = duckdb.connect()
    parts = []
    for r in range(REPLICAS):
        sels = ", ".join(
            f"({c} + {r * OFFSET}) AS {c}" if c in key_cols else c
            for c in con.sql(f"SELECT * FROM '{SRC}/{table}.parquet' LIMIT 0").columns
        )
        parts.append(f"SELECT {sels} FROM '{SRC}/{table}.parquet'")
    union = " UNION ALL ".join(parts)
    con.sql(
        f"COPY ({union}) TO '{os.path.join(OUT, table + '.parquet')}' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
    )
    n = con.sql(f"SELECT count(*) FROM '{os.path.join(OUT, table + '.parquet')}'").fetchone()[0]
    print(f"{table}: {n} rows")


def main():
    os.makedirs(OUT, exist_ok=True)
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    if only is None or "documents" in only:
        gen_documents()
    if only is None or "embeddings" in only:
        gen_embeddings()
    if only is None or "orders" in only:
        gen_keyed("orders", ("o_orderkey", "o_custkey"))
    if only is None or "lineitem" in only:
        gen_keyed("lineitem", ("l_orderkey",))


if __name__ == "__main__":
    main()
