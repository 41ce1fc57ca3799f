"""End-to-end corpus curation: the composed training-data pipeline.

Every stage below exists as a standalone, individually oracle-checked
operator; this module is the GLUE — the pipeline a user of the engine
actually runs over a raw crawl before training. Reference scope: the
reference has no curation pipeline (SURVEY.md §2 training-pipeline
extension); the composition order follows the published pre-training
data recipes (C4/RefinedWeb/Dolma-style):

1. profile + quality gate   (operators/text.py::text_profile — one scan)
   + optional Gopher-style repetition gate (repetition_profile, map-side)
2. exact dedup              (md5 fingerprint, keep min id)
3. near dedup               (MinHash-LSH pairs → connected components →
                             one canonical survivor per cluster)
4. leakage-safe split       (md5-bucket by SOURCE, never by row)
5. decontamination          (drop train docs sharing n-grams with eval)
6. mixture sampling         (per-source target rates, optional)

Scale shape: stages 1-2 and 4-6 are map-side or single-shuffle; stage 3
is the LSH-blocked near-dedup (cost ∝ collisions) plus an O(log diameter)
component iteration over the pair set. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database_anonymiser_spark.operators import dedup as D
from database_anonymiser_spark.operators import text as TX
from database_anonymiser_spark.operators.cachectl import scoped_cache
from database_anonymiser_spark.operators.graph import (
    connected_components,
    dedup_survivors,
)
from database_anonymiser_spark.operators.sampling import (
    mixture_sample,
    token_budget_sample,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    min_quality: float = 0.0,
    allowed_langs: tuple[str, ...] | None = None,
    drop_repetitive: bool = False,
    clf_cutoff: float | None = None,
    lm_cutoff: float | None = None,
    clean_lines: bool = False,
    drop_boilerplate: bool = False,
    dedup_lines_min_docs: int | None = None,
    near_dedup: bool = True,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    max_df: int | None = None,
    train_pct: int = 90,
    decontam_n: int | None = 8,
    decontam_min_common: int = 1,
    cluster_balance: int | None = None,
    embeddings: DataFrame | None = None,
    embedding_id_col: str = "vec_id",
    embedding_vec_col: str = "embedding",
    n_clusters: int = 16,
    kmeans_iter: int = 5,
    train_sample_fraction: float | None = None,
    mixture_rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    token_budgets: dict[str, int] | None = None,
    temperature_target: int | None = None,
    temperature_alpha: float = 0.5,
    stop_after: str | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns one curated DataFrame with
    columns (id, text, source, n_tokens, quality_score, lang_pred,
    fingerprint, split[, copy_idx]).

    Filter semantics: ``min_tokens``/``max_tokens``/``min_quality`` gate
    on the profile metrics; ``allowed_langs`` (None = keep all) gates on
    the n-gram language ID; ``drop_repetitive`` additionally rejects docs
    failing the Gopher-style repetition thresholds
    (text.py::REPETITION_THRESHOLDS); ``clf_cutoff`` (None = off) adds the
    model-based gate — text.py::quality_classifier score ≥ cutoff — after
    the heuristic gates, CCNet-style. ``lm_cutoff`` (None = off, round 6)
    adds the corpus-trained char-bigram LM gate (text.py::char_bigram_lm,
    the perplexity-filter slot of the CCNet/Dolma recipes): keep docs
    with ``lm_mean_prob`` ≥ cutoff. Exact dedup keeps the minimum id per
    fingerprint; near dedup keeps the minimum id per duplicate CLUSTER
    (transitive closure of LSH pairs, so chains collapse to one doc).
    ``decontam_n=None`` skips decontamination; otherwise every TRAIN doc
    sharing ≥ ``decontam_min_common`` distinct ``decontam_n``-grams with
    any eval doc is dropped (eval rows are never dropped — they are the
    benchmark). ``mixture_rates=None`` skips mixing; otherwise rates
    apply to train AND eval rows keyed on ``source_col`` (copy_idx
    appears in the output). ``temperature_target`` (round 10) is the
    hands-free alternative: α-scaled source rebalancing (sources
    sampled ∝ n^α toward that many rows,
    :func:`~database_anonymiser_spark.operators.sampling.temperature_mixture`)
    — mutually exclusive with ``mixture_rates``.

    C4 pre-gates (round 4, both default-off — the raw-crawl scrub that
    runs BEFORE profiling, per Raffel et al. 2020): ``clean_lines``
    replaces each document's text with its C4-cleaned lines
    (text.py::c4_clean), so the length/quality/dedup gates judge the
    cleaned document; ``drop_boilerplate`` drops brace/lorem-ipsum pages
    outright. Both stay map-side (one projection, no shuffle).
    ``dedup_lines_min_docs`` additionally runs CROSS-document line dedup
    (dedup.py::line_dedup — RefinedWeb/CCNet boilerplate removal: any
    normalized line shared by that many docs is stripped corpus-wide)
    before the per-document gates.

    ``cluster_balance`` (round 9, default off) runs the SemDeDup/Sorscher
    cluster-scoped rebalancing between near-dedup and the split — the
    recipe semantic_clusters and cluster_balanced_sample exist for
    (Abbas et al. 2023 §3; Sorscher et al. 2022 §5): join the surviving
    docs to ``embeddings`` (id ↔ ``embedding_id_col``), partition the
    embedding space with the exact-integer spherical k-means
    (``n_clusters``/``kmeans_iter``), then flatten each cluster toward
    ``cluster_balance`` rows (rate = min(1, budget/n_c)). Docs WITHOUT an
    embedding row pass through unbalanced (they cannot be clustered;
    dropping them silently would turn a coverage gap into data loss).
    ``train_sample_fraction`` (None = train on everything) trains the
    codebook on a deterministic hash_sample — the 100 TB shape: k-means
    quality saturates long before the full corpus, so train small and
    assign all. Plan shape: one broadcast-ready join to the embedding
    column, the trainer's K-sized bounded collects over a checkpointed
    micro frame, one map-side Arrow assignment pass, one count aggregate
    — no new wide shuffle of the corpus.

    ``stop_after`` (bench/debug only) returns the pipeline's intermediate
    frame after the named stage — 'gates' (scrub + profile + heuristic/
    classifier/repetition gates), 'exact' (exact dedup), 'near'
    (near dedup), 'balance' (cluster rebalancing), 'split', 'decontam' —
    so bench.py can attribute wall time per stage by timing cumulative
    prefixes. ``None`` (the default) runs the full pipeline; results are
    unchanged.
    """
    _STAGES = (None, "gates", "exact", "near", "balance", "split", "decontam")
    if stop_after not in _STAGES:
        raise ValueError(f"stop_after must be one of {_STAGES}")
    # Parallelism floor with a cache barrier: the per-doc gate expressions
    # (C4 scrub, profile regex trees, repetition fold HOFs) are the
    # pipeline's compute bulk, and the gate FILTERS over them would sink
    # through a bare repartition back into the scan (measured at sf0.1:
    # 27s single-task vs ~2s wide). scan_floor's barrier form caches the
    # repartitioned raw docs as the pushdown barrier; no-op at scale.
    from database_anonymiser_spark.operators.parallel import scan_floor

    docs = scan_floor(docs, key_col=id_col, barrier_slot="curate.docs")

    if clean_lines or drop_boilerplate:
        c4 = TX.c4_clean(docs, id_col, text_col, keep=(text_col, source_col))
        if drop_boilerplate:
            c4 = c4.where(~F.col("c4_boilerplate"))
        text_expr = F.col("c4_text") if clean_lines else F.col(text_col)
        docs = c4.select(
            F.col(id_col), text_expr.alias(text_col), F.col(source_col)
        )
    if dedup_lines_min_docs is not None:
        # source rides line_dedup's map-side total-lines projection (its
        # ``keep`` passthrough, r15) instead of a corpus-keyed re-attach
        # join afterwards — one exchange + sort fewer at scale, identical
        # rows (guide §2.4)
        docs = D.line_dedup(
            docs, id_col, text_col,
            min_docs=dedup_lines_min_docs, keep=(source_col,),
        ).select(F.col(id_col), F.col(text_col), F.col(source_col))
    prof = TX.text_profile(docs, id_col, text_col, keep=(text_col, source_col))
    kept = prof.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality_score") >= min_quality)
    )
    if allowed_langs is not None:
        kept = kept.where(F.col("lang_pred").isin(*allowed_langs))
    kept = kept.select(
        id_col, text_col, source_col, "n_tokens", "quality_score", "lang_pred", "fingerprint"
    )

    if clf_cutoff is not None:
        # model-based quality gate (text.py::quality_classifier — the
        # fixed-weight linear twin of the trained fastText filters): same
        # map-side shape as the heuristic gates, one more projection on
        # the same scan
        keep_cols = tuple(c for c in kept.columns if c != id_col)
        kept = (
            TX.quality_classifier(kept, id_col, text_col, keep=keep_cols, cutoff=clf_cutoff)
            .where(F.col("qc_keep"))
            .drop("qc_score", "qc_keep")
        )

    if lm_cutoff is not None:
        # corpus-trained LM gate (text.py::char_bigram_lm — the CCNet/
        # Dolma perplexity-filter class): docs whose mean transition
        # probability sits below the cutoff are dropped. The model trains
        # on the GATED corpus (post-heuristics), so junk already removed
        # does not pollute the transition table. One bounded aggregate +
        # a broadcast join — no new wide shuffle beyond the per-doc agg.
        lm = TX.char_bigram_lm(kept, id_col, text_col)
        keep_ids = lm.where(F.col("lm_mean_prob") >= lm_cutoff).select(id_col)
        kept = kept.join(keep_ids, id_col, "left_semi")

    if drop_repetitive:
        # Gopher-style repetition gate — the FILTER-SAFE lambda-bound form
        # (text.py::repetitive_gate): a filter on repetition_profile's
        # alias would re-evaluate the tokenization + fold trees once per
        # disjunct (no CSE in filter context — measured 2.5x slower);
        # the HOF binding computes the token array once. Same map-side
        # scan, identical gate semantics (pinned in tests).
        kept = kept.where(~TX.repetitive_gate(text_col))

    # The pipeline is a DAG, not a chain: the frame below feeds the exact
    # dedup's BOTH sides, then the near-dedup pair generation AND the
    # survivors join, and later decontamination reads it three ways
    # (train, eval, anti). Uncached, Spark re-executes the whole upstream
    # (C4 scrub, line dedup, profile regex trees, gates) once per consumer
    # — measured 60s+ vs ~15s on the sf0.1 bench config. Persisting at the
    # two fan-out points is the standard diamond-dependency treatment
    # (MEMORY_AND_DISK — spills, never OOMs); scoped_cache bounds the
    # live cache to the current call.
    kept = scoped_cache("curate.gated", kept)
    if stop_after == "gates":
        return kept

    # exact dedup: one shuffle on the fingerprint, keep the min id
    canonical = kept.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    kept = kept.join(canonical, [id_col, "fingerprint"], "left_semi")
    if stop_after == "exact":
        return kept

    if near_dedup:
        # widen=False: `kept` already rides the pipeline-head barrier
        # repartition (scan_floor at the top), so the shingle stage's own
        # floor would only add a redundant exchange of the gated frame
        pairs = D.minhash_lsh_pairs(
            kept,
            id_col,
            text_col,
            n=shingle_n,
            threshold=jaccard_threshold,
            max_df=max_df,
            widen=False,
        )
        clusters = connected_components(pairs)
        kept = dedup_survivors(kept, id_col, clusters)
    if stop_after == "near":
        return kept

    if cluster_balance is not None:
        if embeddings is None:
            raise ValueError("cluster_balance requires an embeddings frame")
        from database_anonymiser_spark.operators.sampling import (
            cluster_balanced_sample,
        )
        from database_anonymiser_spark.operators.similarity import (
            semantic_clusters,
        )

        emb = embeddings.select(
            F.col(embedding_id_col).alias(id_col),
            F.col(embedding_vec_col).alias("_vec"),
        )
        # the survivor set is read twice (clustered side + passthrough
        # anti side) — same diamond treatment as the gate fan-out
        kept = scoped_cache("curate.neardeduped", kept)
        with_emb = kept.join(emb, id_col, "inner")
        codebook = None
        if train_sample_fraction is not None:
            from database_anonymiser_spark.operators.sampling import hash_sample
            from database_anonymiser_spark.operators.similarity import (
                train_spherical_kmeans,
            )

            codebook = train_spherical_kmeans(
                hash_sample(with_emb, id_col, train_sample_fraction),
                id_col, "_vec",
                n_clusters=n_clusters, n_iter=kmeans_iter,
            )
        # the assigned frame is consumed twice — the per-cluster count
        # collect inside cluster_balanced_sample and the surviving-row
        # pipeline below — and each uncached consumer would re-run the
        # join + the Arrow assignment pass over the corpus (a full
        # JVM→Python round trip, guide §4). Drop the dead _vec column
        # FIRST so the cache holds only live columns, then cache.
        clustered = scoped_cache(
            "curate.clustered",
            semantic_clusters(
                with_emb, id_col, "_vec",
                n_clusters=n_clusters, n_iter=kmeans_iter, codebook=codebook,
            ).drop("_vec"),
        )
        balanced = cluster_balanced_sample(
            clustered, id_col, "cluster_id", cluster_balance
        ).drop("copy_idx", "cluster_id")
        no_emb = kept.join(emb.select(id_col), id_col, "left_anti")
        kept = balanced.unionByName(no_emb)
    if stop_after == "balance":
        return kept

    kept = TX.train_eval_split(kept, source_col, train_pct=train_pct).drop(
        "split_bucket"
    )
    if stop_after == "split":
        return kept

    if decontam_n is not None:
        kept = scoped_cache("curate.split", kept)
        train = kept.where(F.col("split") == "train")
        evals = kept.where(F.col("split") == "eval")
        dirty = (
            TX.ngram_contamination(
                train,
                evals,
                id_col,
                text_col,
                n=decontam_n,
                min_common=decontam_min_common,
            )
            .select(F.col("train_id").alias(id_col))
            .distinct()
        )
        kept = kept.join(dirty, id_col, "left_anti")
    if stop_after == "decontam":
        return kept

    if temperature_target is not None:
        # α-scaled source rebalancing (GPT-3/XLM-R/Llama): sources
        # sampled ∝ n^α toward temperature_target rows — the
        # hands-free alternative to hand-written mixture_rates
        # (mutually exclusive: both at once would double-sample)
        if mixture_rates is not None:
            raise ValueError(
                "pass mixture_rates or temperature_target, not both"
            )
        from database_anonymiser_spark.operators.sampling import (
            temperature_mixture,
        )

        kept = temperature_mixture(
            kept, id_col, source_col, temperature_target,
            alpha=temperature_alpha,
        )
    if mixture_rates is not None:
        kept = mixture_sample(
            kept, id_col, source_col, mixture_rates, default_rate=default_rate
        )
    if token_budgets is not None:
        # token-weighted mixture (the form pretraining specs use): reuses
        # the n_tokens the profile stage already computed; unlisted
        # sources pass through uncapped
        kept = token_budget_sample(
            kept, id_col, "n_tokens", source_col, token_budgets, None
        )
    return kept
