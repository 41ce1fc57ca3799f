"""Headline ANN recall@k at PRODUCTION DEFAULTS for any sf_dir — the
cross-scale face of bench.py's ann_recall dict (round-8 verdict #5: the
probe defaults were recall-justified at sf0.1 only; IVF probe coverage
degrades as lists grow, so the defaults need a larger-scale point).

Ground truth is the exact brute-force top-k on the SAME corpus, so the
number is a recall, not a proxy, at every scale.
"""

from __future__ import annotations


def ann_recall_headline(
    spark, sf_dir: str, k: int = 10, qs: tuple[int, ...] = (1, 701, 1301)
) -> dict[str, float]:
    """recall@k of the four ANN branches at their production defaults
    (ivf n_probe=8 of 16 lists; pq 8x16 with the auto ADC-shortlist →
    exact re-rank; trained-pq n_iter=3; lsh 8 planes + query-directed
    93-bucket probing, round 13), averaged over the ``qs`` probe
    queries, vs exact brute force."""
    from database_anonymiser_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_bucket_topk,
        pq_codebooks,
        pq_index,
        pq_topk,
        train_pq_codebooks,
    )
    from database_anonymiser_spark.suite.base import load

    emb = load(spark, sf_dir, "embeddings")
    # wrap probe ids into the corpus id range (a 500-row sf0.01 corpus has
    # no vec_id 701/1301 — an absent query would silently score recall 0)
    max_id = emb.agg({"vec_id": "max"}).first()[0]
    qs = tuple(sorted({q % (int(max_id) + 1) for q in qs}))
    books = pq_codebooks(emb, "vec_id", "embedding", 8, 16)
    pidx = pq_index(emb, "vec_id", "embedding", books).cache()
    pidx.count()
    tbooks = train_pq_codebooks(emb, "vec_id", "embedding", 8, 16, n_iter=3)
    tidx = pq_index(emb, "vec_id", "embedding", tbooks).cache()
    tidx.count()
    exact_sets = {
        q: {
            r["vec_id"]
            for r in brute_force_topk(emb, "vec_id", "embedding", q, k).collect()
        }
        for q in qs
    }

    def _recall(mk) -> float:
        hits = sum(
            len(exact_sets[q] & {r["vec_id"] for r in mk(q).collect()}) / k
            for q in qs
        )
        return round(hits / len(qs), 3)

    # round 14 (verdict r13 watch item: ivf 0.733 at sf0.01): the
    # production sizing is the documented occupancy rule — lists hold
    # ≥50 vectors (ivf_n_centroids) — which returns the unchanged 16 at
    # sf0.1/sf1 and right-sizes the tiny sf0.01 corpus (500 rows → 10
    # lists → 0.967 at the default 8-probe). The fixed-16 row is kept
    # as ivf_nc16 so the over-partitioned number stays visible.
    from database_anonymiser_spark.operators.similarity import (
        ivf_n_centroids,
    )

    n_corpus = emb.count()
    nc = ivf_n_centroids(n_corpus)
    out = {
        "ivf": _recall(
            lambda q: ivf_topk(emb, "vec_id", "embedding", q, k, nc)
        ),
        "ivf_n_centroids": nc,
        "ivf_nc16": _recall(
            lambda q: ivf_topk(emb, "vec_id", "embedding", q, k, 16)
        ),
        "pq": _recall(
            lambda q: pq_topk(pidx, emb, "vec_id", "embedding", q, books, k)
        ),
        "pq_trained": _recall(
            lambda q: pq_topk(tidx, emb, "vec_id", "embedding", q, tbooks, k)
        ),
        "lsh": _recall(
            lambda q: lsh_bucket_topk(
                emb, "vec_id", "embedding", q, k, n_planes=8, dim=64,
                n_probes=93,
            )
        ),
    }
    pidx.unpersist()
    tidx.unpersist()
    return out
