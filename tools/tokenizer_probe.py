"""Cross-scale BPE tokenizer evidence (round-10 verdict #4).

Measures, per scale (sf0.01, sf0.1, and the derived .benchdata/sf1
documents when present):

- ``train_sec``: wall of ``train_bpe(docs, 'text', 24)`` — one corpus
  scan builds the word-frequency table, then 24 vocabulary-sized rounds;
- ``apply_memo`` / ``apply_nomemo``: apply throughput (tokens/sec)
  WITH the round-10 per-batch distinct-piece memo vs WITHOUT it (the
  pre-round-10 behavior, re-derived per piece occurrence) — Zipf makes
  the memo a large constant factor on real text.

Run: ``python tools/tokenizer_probe.py``; paste the printed rows into
README.md's cross-scale table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from database_anonymiser_spark.operators.text import BPE_PIECE_RE  # noqa: E402
from database_anonymiser_spark.operators.tokenizer import (  # noqa: E402
    apply_bpe,
    train_bpe,
)
from database_anonymiser_spark.session import get_spark  # noqa: E402
from database_anonymiser_spark.suite.base import load  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def apply_bpe_nomemo(df, id_col, text_col, merges):
    """The pre-round-10 applier, verbatim minus the memo: re-derives the
    merge walk for every piece OCCURRENCE. Kept here (not in the
    package) purely as the probe's A/B baseline."""
    piece_re = re.compile(BPE_PIECE_RE, re.ASCII)
    rules = [tuple(m) for m in merges]

    def _tok(piece):
        syms = list(piece)
        for a, b in rules:
            if len(syms) < 2:
                break
            out, j, n = [], 0, len(syms)
            while j < n:
                if j + 1 < n and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    @F.pandas_udf(T.LongType())
    def bpe(texts: pd.Series) -> pd.Series:
        vals = []
        for t in texts:
            if t is None:
                vals.append(0)
                continue
            n = 0
            for piece in piece_re.findall(t.lower()):
                n += len(_tok(piece))
            vals.append(n)
        return pd.Series(vals)

    return df.select(F.col(id_col), bpe(F.col(text_col)).alias("n_bpe_tokens"))


def main():
    spark = get_spark(app_name="tokenizer_probe")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scales = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(here, ".benchdata", "sf1")),
    ]
    out = {}
    for name, d in scales:
        if not os.path.exists(os.path.join(d, "documents.parquet")):
            continue
        docs = load(spark, d, "documents")
        t0 = time.perf_counter()
        merges = train_bpe(docs, "text", 24)
        train_sec = round(time.perf_counter() - t0, 2)

        def best(job):
            b = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                job()
                b = min(b, time.perf_counter() - t0)
            return b

        tok = apply_bpe(docs, "doc_id", "text", merges)
        n_tokens = int(tok.agg(F.sum("n_bpe_tokens")).first()[0])
        memo_sec = best(
            lambda: apply_bpe(docs, "doc_id", "text", merges)
            .agg(F.sum("n_bpe_tokens")).first()
        )
        nomemo_sec = best(
            lambda: apply_bpe_nomemo(docs, "doc_id", "text", merges)
            .agg(F.sum("n_bpe_tokens")).first()
        )
        # parity: the memo is a pure cache
        n2 = int(
            apply_bpe_nomemo(docs, "doc_id", "text", merges)
            .agg(F.sum("n_bpe_tokens")).first()[0]
        )
        assert n2 == n_tokens, (n2, n_tokens)
        out[name] = {
            "train_sec": train_sec,
            "tokens": n_tokens,
            "apply_memo_sec": round(memo_sec, 2),
            "apply_nomemo_sec": round(nomemo_sec, 2),
            "memo_tokens_per_sec": int(n_tokens / memo_sec),
            "nomemo_tokens_per_sec": int(n_tokens / nomemo_sec),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
