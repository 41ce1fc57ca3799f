"""Declared text-analysis queries over ``documents`` (SURVEY.md §2 ext).

``text_profile`` is the one-pass corpus profiler (token counts, quality
heuristics, language ID, fingerprint — every metric a map-side built-in over
one scan); ``text_tfidf`` is the corpus-level term weighting (explode + two
aggregations). Both fully DuckDB-oracle checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark.operators import text as TX
from database_anonymiser_spark.suite.base import load, register


def _micro_frac_sql(num: str, den: str) -> str:
    """DuckDB twin of operators.text._frac: exact micro-half-up ratio."""
    return (
        f"CASE WHEN {den} > 0 THEN "
        f"((2 * ({num}) * 1000000 + {den}) // (2 * {den})) / 1000000.0 "
        f"ELSE 0.0 END"
    )


def _profile_oracle() -> str:
    lang_counts = ",\n             ".join(
        rf"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{lang}"
        for lang, pat in TX.LANG_MARKERS.items()
    )
    langs = ", ".join(f"n_{lang}" for lang in TX.LANG_MARKERS)
    whens = "\n             ".join(
        f"WHEN n_{lang} = best THEN '{lang}'" for lang in TX.LANG_MARKERS
    )
    top = "coalesce(list_max(list_transform(list_distinct({a}), x -> len(list_filter({a}, y -> y = x)))), 0)"
    gates = TX.REPETITION_THRESHOLDS
    # repetition signals use rep_toks/rep_n_tokens: the zero-real-token
    # guard (blank text would otherwise tokenize to [''] and score 1.0)
    top_token_frac = _micro_frac_sql(top.format(a="rep_toks"), "rep_n_tokens")
    top_2gram_frac = _micro_frac_sql(top.format(a="bi"), "len(bi)")
    dup_2gram_frac = _micro_frac_sql("len(bi) - len(list_distinct(bi))", "len(bi)")
    dup_3gram_frac = _micro_frac_sql("len(tri) - len(list_distinct(tri))", "len(tri)")
    symbol_word_ratio = _micro_frac_sql(
        r"CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)", "rep_n_tokens"
    )
    c4_kept = (
        r"list_filter(string_split(text, chr(10)), ln -> "
        r"regexp_matches(ln, '\S') AND "
        rf"len(string_split_regex(trim(ln), '\s+')) >= {TX.C4_MIN_LINE_WORDS} AND "
        r"""regexp_matches(ln, '[.!?"]\s*$'))"""
    )
    return rf"""
    WITH m AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, chr(10))) AS BIGINT) AS c4_n_lines,
             CAST(len({c4_kept}) AS BIGINT) AS c4_kept_lines,
             (contains(text, '{{') OR contains(lower(text), 'lorem ipsum'))
               AS c4_boilerplate,
             -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
             -- array_join([]) is '' — align on the empty string
             md5(coalesce(array_to_string({c4_kept}, chr(10)), ''))
               AS c4_clean_fingerprint,
             string_split_regex(trim(text), '\s+') AS toks,
             CASE WHEN regexp_matches(text, '\S')
                  THEN string_split_regex(trim(text), '\s+')
                  ELSE [] END AS rep_toks,
             CASE WHEN regexp_matches(text, '\S')
                  THEN CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                  ELSE 0 END AS rep_n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(len(regexp_extract_all(text, '\b(the|a|of|and|is|to|in)\b')) AS BIGINT) AS n_stop,
             length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace,
             CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_pieces,
             {lang_counts},
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
             (('0x' || substr(md5('split-v1' || source), 1, 15))::BIGINT) % 100 AS split_bucket
      FROM documents
    ), g AS (
      SELECT *,
             list_transform(range(1, greatest(len(rep_toks), 1)),
                            i -> rep_toks[i] || ' ' || rep_toks[i+1]) AS bi,
             list_transform(range(1, greatest(len(rep_toks) - 1, 1)),
                            i -> rep_toks[i] || ' ' || rep_toks[i+1] || ' ' || rep_toks[i+2]) AS tri
      FROM m
    ), r AS (
      SELECT *,
             -- zero-denominator guard mirrors _micro_half_up: empty docs
             -- profile as all-zero ratios instead of erroring/NULLing
             CASE WHEN n_chars > 0
                  THEN (2 * n_punct * 1000000 + n_chars) // (2 * n_chars)
                  ELSE 0 END AS punct_micro,
             CASE WHEN n_tokens > 0
                  THEN (2 * n_stop * 1000000 + n_tokens) // (2 * n_tokens)
                  ELSE 0 END AS stop_micro,
             CASE WHEN n_tokens > 0
                  THEN (2 * n_nonspace * 1000000 + n_tokens) // (2 * n_tokens)
                  ELSE 0 END AS avglen_micro,
             greatest({langs}) AS best,
             {top_token_frac} AS top_token_frac,
             {top_2gram_frac} AS top_2gram_frac,
             {dup_2gram_frac} AS dup_2gram_frac,
             {dup_3gram_frac} AS dup_3gram_frac,
             {symbol_word_ratio} AS symbol_word_ratio
      FROM g
    )
    SELECT doc_id, n_tokens, n_chars,
           CAST(ceil(n_nonspace / 4.0) AS BIGINT) AS n_subwords_est,
           n_bpe_pieces,
           punct_micro / 1000000.0 AS punct_ratio,
           stop_micro / 1000000.0 AS stopword_ratio,
           avglen_micro / 1000000.0 AS avg_token_len,
           (2 * least(n_tokens * 10000, 1000000)
            + (1000000 - punct_micro)
            + least(stop_micro * 5, 1000000)) / 4000000.0 AS quality_score,
           {langs},
           CASE WHEN best = 0 THEN 'und'
             {whens}
           END AS lang_pred,
           fingerprint,
           ('0x' || substr(fingerprint, 1, 15))::BIGINT AS fingerprint64,
           split_bucket,
           CASE WHEN split_bucket < 90 THEN 'train' ELSE 'eval' END AS split,
           top_token_frac, top_2gram_frac, dup_2gram_frac, dup_3gram_frac,
           symbol_word_ratio,
           (top_token_frac > {gates["top_token_frac"]}
            OR top_2gram_frac > {gates["top_2gram_frac"]}
            OR dup_3gram_frac > {gates["dup_3gram_frac"]}
            OR symbol_word_ratio > {gates["symbol_word_ratio"]}) AS repetitive,
           c4_n_lines, c4_kept_lines, c4_boilerplate, c4_clean_fingerprint
    FROM r
    """


@register("text_profile", _profile_oracle(), tags=("text",))
def text_profile(spark, sf_dir):
    """One-pass corpus profiler + leakage-safe train/eval assignment + the
    Gopher-style repetition gates (round 3): the split is keyed on
    ``source`` (every doc of a source lands on one side — domain-level
    contamination control), and the repetition signals
    (operators/text.py::repetition_profile) ride the same map-side pass
    over one scan — the profile/C4 selects collapse into one projection,
    while the repetition stages are DELIBERATELY factored so
    CollapseProject cannot merge them (r15: merging re-evaluates the
    CodegenFallback HOF trees once per signal column; the staged form
    computes each count exactly once).
    The md5-bucket split arithmetic, the micro-half-up ratios,
    the nested-lambda top-count construction, and (round 4) the C4-style
    line-cleaning signals (operators/text.py::c4_clean — kept-line counts,
    boilerplate flag, md5 of the cleaned text) are all reproduced in the
    oracle, so every column is value-hash checked."""
    docs = load(spark, sf_dir, "documents")
    split = TX.train_eval_split(docs, "source")
    prof = TX.text_profile(split, "doc_id", "text", keep=("split_bucket", "split", "text"))
    rep_keep = tuple(c for c in prof.columns if c not in ("doc_id", "text"))
    rep = TX.repetition_profile(prof, "doc_id", "text", keep=rep_keep + ("text",))
    c4_keep = tuple(c for c in rep.columns if c not in ("doc_id", "text"))
    return TX.c4_clean(rep, "doc_id", "text", keep=c4_keep).drop("c4_text")


@register(
    "text_pii_scrub",
    r"""
    WITH synth AS (
      SELECT c_custkey,
             c_name || ' reach me at ' ||
             regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') || '@example.com' ||
             ' or 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') ||
             '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
             ' ssn ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') ||
             '-' || lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') ||
             '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS raw_text
      FROM customer
    )
    SELECT c_custkey,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw_text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '[0-9]{3}-[0-9]{2}-[0-9]{4}', '[SSN]', 'g'),
             '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '[PHONE]', 'g') AS scrubbed
    FROM synth
    """,
    tags=("text", "masking"),
)
def text_pii_scrub(spark, sf_dir):
    """Free-text PII scrubbing (emails / SSNs / phones → typed tokens) —
    the anonymiser's strategies extended to unstructured text. The fixture
    corpus contains no PII, so the query synthesizes a PII-bearing line per
    customer (name + derived email + 555-phone + synthetic SSN) and scrubs
    it; the oracle applies the same replacement chain. Map-side
    regexp_replace chain: zero shuffles, pure scan bandwidth at any scale.
    """
    c = load(spark, sf_dir, "customer")
    raw = F.concat(
        F.col("c_name"),
        F.lit(" reach me at "),
        F.regexp_replace(F.lower("c_name"), "[^a-z0-9]", ""),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" ssn "),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") % 100).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    return c.select("c_custkey", TX.scrub_pii(raw).alias("scrubbed"))


@register(
    "text_tfidf",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf_raw AS (
      SELECT doc_id, term, count(*) AS term_count FROM tok GROUP BY 1, 2
    ),
    doc_len AS (SELECT doc_id, count(*) AS doc_len FROM tok GROUP BY 1),
    doc_freq AS (SELECT term, count(*) AS doc_freq FROM tf_raw GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT t.doc_id, t.term, t.term_count, f.doc_freq,
           round((t.term_count / l.doc_len) * (n.n_docs / f.doc_freq), 6) AS tfidf
    FROM tf_raw t
    JOIN doc_len l ON t.doc_id = l.doc_id
    JOIN doc_freq f ON t.term = f.term
    CROSS JOIN n
    """,
    tags=("text",),
)
def text_tfidf(spark, sf_dir):
    from database_anonymiser_spark.operators.text import tfidf

    docs = load(spark, sf_dir, "documents")
    return tfidf(docs, "doc_id", "text")


def _quality_clf_oracle(cutoff: float = 0.2) -> str:
    """DuckDB twin of operators/text.py::quality_classifier: identical
    integer micro-features, identical fixed weights, one exact constant
    divide — the score doubles are bit-identical cross-engine."""
    w = TX.QUALITY_CLF
    lang_counts = ",\n             ".join(
        rf"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{lang}"
        for lang, pat in TX.LANG_MARKERS.items()
    )
    langs = ", ".join(f"n_{lang}" for lang in TX.LANG_MARKERS)
    return rf"""
    WITH m AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(len(regexp_extract_all(text, '\b(the|a|of|and|is|to|in)\b')) AS BIGINT) AS n_stop,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS n_nonspace,
             {lang_counts}
      FROM documents
    ), r AS (
      SELECT doc_id, n_tokens, {langs},
             greatest({langs}) AS best,
             CASE WHEN n_chars > 0
                  THEN (2 * n_punct * 1000000 + n_chars) // (2 * n_chars)
                  ELSE 0 END AS punct_micro,
             CASE WHEN n_tokens > 0
                  THEN (2 * n_stop * 1000000 + n_tokens) // (2 * n_tokens)
                  ELSE 0 END AS stop_micro,
             CASE WHEN n_tokens > 0
                  THEN (2 * n_nonspace * 1000000 + n_tokens) // (2 * n_tokens)
                  ELSE 0 END AS avglen_micro
      FROM m
    ), s AS (
      SELECT doc_id,
             ({w["len_sat"]} * least(n_tokens * 1000, 1000000)
              + ({w["punct"]}) * punct_micro
              + {w["stop"]} * least(stop_micro * 5, 1000000)
              + ({w["len_dev"]}) * (least(abs(avglen_micro - 5000000), 5000000) // 5)
              + {w["is_en"]} * (CASE WHEN best > 0 AND n_en = best THEN 1 ELSE 0 END) * 1000000
             ) AS logit_micro
      FROM r
    )
    SELECT doc_id,
           logit_micro / 10000000.0 AS qc_score,
           logit_micro >= {int(cutoff * 10_000_000)} AS qc_keep
    FROM s
    """


_SPAN_K = 5


def _dup_spans_ctes() -> str:
    """CTE chain of the dedup_spans oracle (operators/dedup.py::dup_spans):
    5-token window hashes, the ≥2-distinct-docs hot filter, and the
    lag-based overlap-merged span cover, ending in per-doc ``spanagg``."""
    return rf"""
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ),
    pos AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - {_SPAN_K} + 2, 1))) AS p
      FROM tok
    ),
    w AS (
      SELECT doc_id, p,
             ('0x' || substr(md5(array_to_string(toks[p : p + {_SPAN_K} - 1], ' ')), 1, 15))::BIGINT AS whash
      FROM pos
    ),
    hot AS (
      SELECT whash FROM w GROUP BY whash HAVING count(DISTINCT doc_id) >= 2
    ),
    seeds AS (SELECT w.doc_id, w.p FROM w JOIN hot USING (whash)),
    cov AS (
      SELECT doc_id,
             least({_SPAN_K}, p - coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), p - {_SPAN_K})) AS c
      FROM seeds
    ),
    spanagg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows,
             CAST(sum(c) AS BIGINT) AS dup_tokens
      FROM cov GROUP BY doc_id
    )
    """


def _lm_ctes() -> str:
    """CTE chain of the char-bigram LM oracle (operators/text.py::
    char_bigram_lm): fold the alphabet, explode bigrams, train the
    add-one-smoothed transition table, score as integer mean transition
    probability — every step exact integer division, so the doubles are
    bit-identical cross-engine."""
    return """
    lmnorm AS (
      SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '_', 'g') AS n
      FROM documents
    ),
    lmgrams AS (
      SELECT doc_id, substr(n, CAST(i AS INT), 2) AS bg
      FROM lmnorm, LATERAL unnest(range(1, CAST(length(n) AS BIGINT))) AS u(i)
    ),
    lmcounts AS (
      SELECT bg, CAST(count(*) AS BIGINT) AS cnt FROM lmgrams GROUP BY bg
    ),
    lmtots AS (
      SELECT substr(bg, 1, 1) AS c1, SUM(cnt) AS tot FROM lmcounts GROUP BY 1
    ),
    lmmodel AS (
      SELECT bg, (cnt + 1) * 1000000 // (tot + 28) AS prob_micro
      FROM lmcounts JOIN lmtots ON substr(lmcounts.bg, 1, 1) = lmtots.c1
    ),
    lmscore AS (
      SELECT g.doc_id,
             CAST(count(*) AS BIGINT) AS lm_bigrams,
             SUM(m.prob_micro) // count(*) AS mean_micro
      FROM lmgrams g JOIN lmmodel m USING (bg)
      GROUP BY g.doc_id
    )
    """


def _quality_spans_oracle() -> str:
    return f"""
    WITH {_dup_spans_ctes().strip().rstrip()},
    {_lm_ctes().strip().rstrip()},
    clf AS (
      {_quality_clf_oracle()}
    )
    SELECT t.doc_id, clf.qc_score, clf.qc_keep,
           CAST(greatest(len(t.toks) - {_SPAN_K} + 1, 0) AS BIGINT) AS n_windows,
           coalesce(a.n_dup_windows, 0) AS n_dup_windows,
           coalesce(a.dup_tokens, 0) AS dup_tokens,
           (CASE WHEN len(t.toks) > 0 THEN
              (2 * coalesce(a.dup_tokens, 0) * 1000000 + len(t.toks)) // (2 * len(t.toks))
            ELSE 0 END) / 1000000.0 AS dup_frac,
           coalesce(l.lm_bigrams, 0) AS lm_bigrams,
           coalesce(l.mean_micro, 0) / 1000000.0 AS lm_mean_prob
    FROM tok t
    LEFT JOIN spanagg a USING (doc_id)
    LEFT JOIN lmscore l USING (doc_id)
    JOIN clf USING (doc_id)
    """


@register("text_quality_spans", _quality_spans_oracle(), tags=("text", "dedup"))
def text_quality_spans(spark, sf_dir):
    """Model-based quality filtering + cross-document duplicated-span
    detection, one row per document — packed because the driver's
    correctness gate checks the 50 alphabetically-first entries.

    - quality_classifier (operators/text.py): the fixed-weight linear twin
      of the fastText/logistic quality filters (CCNet, LLaMA's Wikipedia-
      reference filter) — saturating length, punctuation density, stopword
      prevalence, token-length deviation, English-argmax bonus, in exact
      integer micro-arithmetic (scores hash bit-equal). Map-side, zero
      shuffles.
    - dup_spans (operators/dedup.py): Lee et al. 2021's ExactSubstr signal
      in the windowed rendering — 5-token window hashes, ≥2-distinct-docs
      seeds, lag-based overlap-merged token cover per doc. Inverted-index
      shape, cost ∝ duplicate occurrences.
    - char_bigram_lm (operators/text.py, round 6): the CCNet/Dolma
      LM-filter class — corpus-trained add-one-smoothed char-bigram
      transition model (≤784 cells, the bounded 'model' aggregate class),
      scored as exact-integer mean transition probability per doc.

    The three frames join on the doc id (all one-row-per-doc); the oracle
    replays every construction and the joins.
    """
    docs = load(spark, sf_dir, "documents")
    from database_anonymiser_spark.operators.dedup import dup_spans

    clf = TX.quality_classifier(docs, "doc_id", "text")
    spans = dup_spans(docs, "doc_id", "text", k=_SPAN_K, min_docs=2)
    lm = TX.char_bigram_lm(docs, "doc_id", "text")
    return clf.join(spans, "doc_id").join(lm, "doc_id")
