"""curate_corpus — the composed training-data pipeline, end to end."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark.operators.curate import curate_corpus


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        # near-dup chain: 1 ~ 2 ~ 3 (transitive, must collapse to doc 1)
        (1, base, "srcA"),
        (2, base + " extra", "srcA"),
        (3, base + " extra words", "srcA"),
        # exact dup of 1 (differs only in case/whitespace → same fingerprint)
        (4, "The  quick brown fox jumps over the lazy dog and runs far away today", "srcB"),
        # junk: too short
        (5, "tiny doc", "srcB"),
        # clean unique docs
        (6, "completely different content about databases and distributed query engines", "srcB"),
        (7, "another unrelated document discussing streaming watermarks and state stores", "srcC"),
        (8, "a third standalone text on partition pruning and adaptive execution plans", "srcC"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_curate_corpus_end_to_end(spark):
    out = curate_corpus(
        _corpus(spark),
        min_tokens=5,
        near_dedup=True,
        jaccard_threshold=0.5,
        train_pct=50,
        decontam_n=None,
    ).cache()
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 5 dropped (short), 4 dropped (exact dup of 1), 2+3 dropped (near-dup
    # cluster collapses to 1 even though only 1~2 and 2~3 pairs exist)
    assert ids == [1, 6, 7, 8]
    # split is keyed on source: all docs of a source land on one side
    sides = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.countDistinct("split").alias("n")).collect()
    }
    assert set(sides.values()) == {1}
    cols = set(out.columns)
    assert {"doc_id", "text", "source", "n_tokens", "quality_score",
            "lang_pred", "fingerprint", "split"} <= cols
    out.unpersist()


def test_curate_corpus_decontam_and_mixture(spark):
    # force srcA+srcB train / srcC eval via a split salt-free check: pick
    # train_pct so the fixture sources split both ways, then verify that
    # any train doc sharing a 4-gram with an eval doc is dropped
    docs = _corpus(spark)
    plain = curate_corpus(docs, near_dedup=False, decontam_n=None, train_pct=50)
    split_of = {r["source"]: r["split"] for r in plain.select("source", "split").collect()}
    assert len(set(split_of.values())) == 2  # fixture must exercise both sides

    # plant contamination: a train doc that contains an eval doc's text
    eval_src = next(s for s, sp in split_of.items() if sp == "eval")
    train_src = next(s for s, sp in split_of.items() if sp == "train")
    eval_text = next(
        r["text"] for r in plain.where(F.col("split") == "eval").collect()
    )
    dirty = docs.union(
        spark.createDataFrame(
            [(100, "prefix words " + eval_text + " suffix words", train_src)],
            "doc_id long, text string, source string",
        )
    )
    out = curate_corpus(dirty, near_dedup=False, decontam_n=4, train_pct=50)
    kept_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 100 not in kept_ids  # contaminated train doc dropped
    # eval rows are never dropped by decontamination
    assert out.where(F.col("split") == "eval").count() == plain.where(
        F.col("split") == "eval"
    ).count()

    mixed = curate_corpus(
        docs,
        near_dedup=False,
        decontam_n=None,
        mixture_rates={train_src: 2.0},
        default_rate=1.0,
    )
    per_doc = {
        r["doc_id"]: r["n"]
        for r in mixed.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 2 for d, n in per_doc.items()
               if split_of.get(train_src) and d in kept_ids) or "copy_idx" in mixed.columns
    assert "copy_idx" in mixed.columns


def test_curate_corpus_on_fixture(spark, sf_dir):
    from database_anonymiser_spark.suite.base import load

    docs = load(spark, sf_dir, "documents")
    out = curate_corpus(docs, min_tokens=3, decontam_n=5).cache()
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out < n_in  # fixture contains planted dups → some drop
    # no surviving exact dups
    assert out.groupBy("fingerprint").count().where("count > 1").count() == 0
    out.unpersist()


def test_curate_corpus_repetition_gate(spark):
    """drop_repetitive rejects a pathologically loopy doc (top-token and
    top-bigram fractions blow past the Gopher thresholds) while ordinary
    prose of the same length survives."""
    loopy = "spam ham " * 40 + "end"
    rows = [
        (1, loopy, "srcA"),
        (2, "perfectly ordinary sentence with enough distinct words to pass every configured gate", "srcA"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    base = curate_corpus(docs, near_dedup=False, decontam_n=None)
    assert {r["doc_id"] for r in base.select("doc_id").collect()} == {1, 2}
    gated = curate_corpus(docs, near_dedup=False, decontam_n=None, drop_repetitive=True)
    assert {r["doc_id"] for r in gated.select("doc_id").collect()} == {2}


def test_curate_corpus_golden_fixture_snapshot(spark, sf_dir):
    """Golden end-to-end pin (VERDICT r3 #3): the surviving-id set after
    each pipeline prefix at FIXED parameters on the sf0.001 documents
    fixture, as count + md5 of the sorted ids — stage-ordering or
    stage-semantics regressions in the COMPOSITION cannot slip through
    the per-stage oracles. Values re-derived only for a deliberate
    semantic change of a stage (each stage is individually oracle-checked;
    this test pins the glue)."""
    import hashlib

    from database_anonymiser_spark.suite.base import load

    docs = load(spark, sf_dir, "documents")
    kw = dict(min_tokens=3, train_pct=90, jaccard_threshold=0.5, shingle_n=3)

    def snap(df):
        rows = df.select("doc_id", "split").collect()
        ids = sorted(r["doc_id"] for r in rows)
        h = hashlib.md5(",".join(map(str, ids)).encode()).hexdigest()
        return (
            len(ids),
            h,
            sum(1 for r in rows if r["split"] == "train"),
            sum(1 for r in rows if r["split"] == "eval"),
        )

    # P1: profile filter + exact dedup + split (no near-dedup/decontam)
    assert snap(
        curate_corpus(docs, near_dedup=False, decontam_n=None, **kw)
    ) == (500, "c7b8df7a96779886bfe0e8b5fc968c52", 375, 125)
    # P2: + LSH near-dedup via connected components (24 docs collapse)
    assert snap(
        curate_corpus(docs, near_dedup=True, decontam_n=None, **kw)
    ) == (476, "9e788b79dfa81f5ba710e5013d2ea065", 358, 118)
    # P3: + decontamination (2 contaminated TRAIN docs drop; eval intact)
    assert snap(
        curate_corpus(docs, near_dedup=True, decontam_n=5, **kw)
    ) == (474, "545c5c1d7167cab29b811614dd1c5cf6", 356, 118)
    # P3b (round 9): + cluster-balanced rebalancing (SemDeDup/Sorscher
    # recipe) between near-dedup and split — exact-integer k-means + md5
    # buckets, so the surviving-id set pins like every other prefix
    emb = load(spark, sf_dir, "embeddings")
    assert snap(
        curate_corpus(
            docs, near_dedup=True, decontam_n=5,
            cluster_balance=40, embeddings=emb,
            n_clusters=8, kmeans_iter=3, **kw,
        )
    ) == (311, "200f0bb45064c5292e84af5fd142b7b1", 226, 85)
    # P4: + mixture sampling (src0 2x, src1 0.5x) — (id, copy_idx) multiset
    out = curate_corpus(
        docs,
        near_dedup=True,
        decontam_n=5,
        mixture_rates={"src0": 2.0, "src1": 0.5},
        default_rate=1.0,
        **kw,
    )
    pairs = sorted(
        (r["doc_id"], r["copy_idx"]) for r in out.select("doc_id", "copy_idx").collect()
    )
    h = hashlib.md5(",".join(f"{a}:{b}" for a, b in pairs).encode()).hexdigest()
    assert (len(pairs), h) == (484, "354c91923b16227e43c8e154b6e76de9")


def test_curate_corpus_cluster_balance_stage(spark, sf_dir):
    """Round-9 (verdict #6): the optional cluster_balance stage flattens
    the post-near-dedup corpus toward the per-cluster budget; docs WITHOUT
    an embedding row pass through unbalanced; output schema is unchanged
    (no cluster/copy columns leak); requesting the stage without an
    embeddings frame raises."""
    import pytest as _pytest

    from database_anonymiser_spark.suite.base import load

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    kw = dict(min_tokens=3, decontam_n=None, near_dedup=True)

    base = curate_corpus(docs, stop_after="near", **kw)
    n_base = base.count()

    # only half the docs carry embeddings: the other half must survive
    half = emb.where(F.col("vec_id") % 2 == 0)
    out = curate_corpus(
        docs, cluster_balance=10, embeddings=half,
        n_clusters=4, kmeans_iter=2, stop_after="balance", **kw,
    )
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    out_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    no_emb_ids = {i for i in base_ids if i % 2 == 1}
    assert no_emb_ids <= out_ids  # passthrough, never dropped
    balanced_kept = out_ids - no_emb_ids
    # the embedded half got flattened toward 4 clusters x 10 budget
    n_embedded = len(base_ids) - len(no_emb_ids)
    assert len(balanced_kept) < n_embedded
    assert len(balanced_kept) >= min(n_embedded, 4 * 10) // 2
    assert set(out.columns) == set(base.columns)
    assert out.count() < n_base

    with _pytest.raises(ValueError, match="embeddings"):
        curate_corpus(docs, cluster_balance=10, **kw)


def test_curate_corpus_c4_pre_gates(spark):
    """clean_lines rewrites docs to their C4-kept lines BEFORE profiling
    (so the min_tokens gate judges the cleaned text) and drop_boilerplate
    removes brace/lorem-ipsum pages outright; defaults-off leaves the
    pipeline byte-identical (golden snapshot test covers that)."""
    rows = [
        (1, "This document keeps both of its sentences intact today.\nMenu Home About", "srcA"),
        (2, "Short menu.\nNav bar\nFooter links here", "srcA"),
        (3, "A lorem ipsum placeholder page with plenty of words to pass gates.", "srcB"),
        (4, "Perfectly normal prose with enough words to pass the gates easily.", "srcB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    base = curate_corpus(docs, near_dedup=False, decontam_n=None, min_tokens=3)
    assert {r["doc_id"] for r in base.select("doc_id").collect()} == {1, 2, 3, 4}

    gated = curate_corpus(
        docs,
        near_dedup=False,
        decontam_n=None,
        min_tokens=3,
        clean_lines=True,
        drop_boilerplate=True,
    )
    out = {r["doc_id"]: r["text"] for r in gated.select("doc_id", "text").collect()}
    # 3 dropped (lorem ipsum); 2 dropped (no line survives cleaning → blank
    # text fails min_tokens); 1 survives with ONLY its kept sentence
    assert set(out) == {1, 4}
    assert out[1] == "This document keeps both of its sentences intact today."


def test_curate_corpus_line_dedup_pre_gate(spark):
    """dedup_lines_min_docs strips corpus-wide boilerplate lines before
    the per-document gates, so two docs sharing a footer stop being
    near-duplicates of each other."""
    rows = [
        (1, "unique article text goes here today.\nShared Footer Line", "srcA"),
        (2, "a different unique article body text.\nShared Footer Line", "srcB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(
        docs,
        near_dedup=False,
        decontam_n=None,
        min_tokens=3,
        dedup_lines_min_docs=2,
    )
    texts = {r["doc_id"]: r["text"] for r in out.select("doc_id", "text").collect()}
    assert texts == {
        1: "unique article text goes here today.",
        2: "a different unique article body text.",
    }


def test_curate_corpus_token_budget_stage(spark):
    """token_budgets caps each source at a token budget (at-least
    semantics, hash-order admission) using the n_tokens the profile stage
    already computed; unlisted sources pass through whole."""
    rows = [(i, f"doc number {i} with exactly eight tokens total.", "big" if i < 20 else "small")
            for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(
        docs, near_dedup=False, decontam_n=None, min_tokens=3,
        token_budgets={"big": 30},
    )
    per_src = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # 8 tokens/doc: docs admit while the running total is < 30, so the
    # 4th (taking the total to 32 >= 30) is the kept crossing doc
    assert per_src["big"] == 4
    assert per_src["small"] == 5  # uncapped


# ---------------------------------------------------------------- property
# pin of the C4 -> cross-doc line-dedup composition (VERDICT r4 #6)

_C4_POOL = (
    "this cookie banner appears on every page today.",
    "subscribe to our newsletter for daily updates now.",
    "all rights reserved by the site owner always.",
    "too short.",  # 2 words -> C4-dropped
    "no terminal punctuation here at all",  # -> C4-dropped
    "a genuinely informative shared sentence follows below.",
    "lorem ipsum dolor sit amet consectetur.",  # boilerplate doc marker
)


def _c4_oracle_pipeline(docs, min_docs):
    """Pure-Python rendition of curate_corpus's pre-gate composition with
    clean_lines + drop_boilerplate + dedup_lines_min_docs: C4 line filter
    first, THEN cross-document line dedup over the CLEANED corpus, then
    the token gate on the final text and exact dedup on its normalized
    fingerprint (keep min id)."""
    import re
    from collections import Counter

    def c4_keep(ln):
        return bool(
            re.search(r"\S", ln)
            and len(re.split(r"\s+", ln.strip())) >= 3
            and re.search(r'[.!?"]\s*$', ln)
        )

    def norm(s):
        return re.sub(r"\s+", " ", s.lower()).strip()

    cleaned = {}
    for i, text, _src in docs:
        if "{" in text or "lorem ipsum" in text.lower():
            continue  # drop_boilerplate
        cleaned[i] = [ln for ln in text.split("\n") if c4_keep(ln)]
    cnt = Counter()
    for lns in cleaned.values():
        for key in {norm(ln) for ln in lns if norm(ln)}:
            cnt[key] += 1
    hot = {k for k, c in cnt.items() if c >= min_docs}
    final = {}
    for i, lns in cleaned.items():
        t = "\n".join(ln for ln in lns if norm(ln) not in hot)
        if len(re.split(r"\s+", t.strip())) >= 3:  # min_tokens gate
            final[i] = t
    first_by_fp = {}
    for i in sorted(final):
        first_by_fp.setdefault(norm(final[i]), i)
    return {i: final[i] for i in first_by_fp.values()}, hot


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_FAST = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    picks=st.lists(
        st.lists(st.integers(0, len(_C4_POOL) - 1), min_size=0, max_size=6),
        min_size=2,
        max_size=7,
    ),
    min_docs=st.sampled_from([2, 3]),
)
@_FAST
def test_curate_c4_line_dedup_composition(spark, picks, min_docs):
    """For ANY corpus built from repeating/unique/C4-droppable/boilerplate
    lines: the fully-composed pipeline equals the pure-Python oracle of
    the fixed stage order (C4 first, line dedup over the cleaned corpus,
    gates judging the final text) — no surviving doc contains a stripped
    hot line, and docs whose CLEANED text fails the token gate are gone
    even if their raw text would have passed."""
    docs = []
    for i, idxs in enumerate(picks):
        lines = [_C4_POOL[j] for j in idxs] + [
            f"document number {i} closes with its own distinctive sentence."
        ]
        docs.append((i, "\n".join(lines), f"src{i % 2}"))
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = curate_corpus(
        df,
        min_tokens=3,
        clean_lines=True,
        drop_boilerplate=True,
        dedup_lines_min_docs=min_docs,
        near_dedup=False,
        decontam_n=None,
    )
    got = {r["doc_id"]: r["text"] for r in out.select("doc_id", "text").collect()}
    want, hot = _c4_oracle_pipeline(docs, min_docs)
    assert got == want
    # the invariant stated in the verdict: no surviving doc contains a
    # stripped line (compare on normalized forms, as the operator does)
    import re

    for t in got.values():
        for ln in t.split("\n"):
            assert re.sub(r"\s+", " ", ln.lower()).strip() not in hot


def test_curate_corpus_classifier_gate(spark, sf_dir):
    """clf_cutoff composes as a strictly-tightening gate: the kept set is a
    subset of the ungated run, exactly the docs whose standalone
    quality_classifier score clears the cutoff survive (among the docs the
    other gates kept), and clf_cutoff=None is the identity."""
    from database_anonymiser_spark.operators.text import quality_classifier
    from database_anonymiser_spark.suite.base import load

    docs = load(spark, sf_dir, "documents")
    base = curate_corpus(docs, near_dedup=False, decontam_n=None)
    gated = curate_corpus(docs, near_dedup=False, decontam_n=None, clf_cutoff=0.2)
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    gated_ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert gated_ids < base_ids  # strictly tightens on the fixture
    passing = {
        r["doc_id"]
        for r in quality_classifier(docs, "doc_id", "text", cutoff=0.2)
        .where(F.col("qc_keep"))
        .collect()
    }
    assert gated_ids == base_ids & passing


def test_curate_lm_gate_drops_junk(spark):
    """lm_cutoff: the corpus-trained bigram-LM gate drops the consonant-
    soup doc while the running-text docs survive; with the gate off the
    junk doc passes the heuristic gates (it has enough tokens), proving
    the LM signal is doing the work."""
    fluent = [
        (i, f"the {w} sat on the mat and then the {w} ran to the door", "src0")
        for i, w in enumerate(["cat", "dog", "fox", "hen", "owl", "rat", "pig", "bat"])
    ]
    junk = [(99, "xq zj qv kx jz vq qk zx jq vz qx kj zq vk xz jv", "src0")]
    df = spark.createDataFrame(fluent + junk, "doc_id long, text string, source string")
    common = dict(min_tokens=3, near_dedup=False, decontam_n=None)
    without = curate_corpus(df, **common)
    assert 99 in {r["doc_id"] for r in without.select("doc_id").collect()}
    gated = curate_corpus(df, lm_cutoff=0.12, **common)
    ids = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert 99 not in ids
    assert len(ids) >= len(fluent) - 1  # running text survives


def test_curate_temperature_mixing(spark, sf_dir):
    """temperature_target: α-scaled source rebalancing as the mix stage;
    mutually exclusive with hand-written mixture_rates."""
    import pytest as _pt

    from database_anonymiser_spark.operators.curate import curate_corpus
    from database_anonymiser_spark.suite.base import load

    docs = load(spark, sf_dir, "documents")
    out = curate_corpus(docs, min_tokens=3, temperature_target=300)
    n = out.count()
    assert 150 < n < 450  # near the target, hash error only
    assert "copy_idx" in out.columns
    with _pt.raises(ValueError, match="not both"):
        curate_corpus(
            docs,
            min_tokens=3,
            temperature_target=300,
            mixture_rates={"src0": 1.0},
        )
