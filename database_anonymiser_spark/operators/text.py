"""Text-analysis operators over document tables (SURVEY.md §2 extensions).

Language ID, quality scoring, token counting, fingerprinting — every output
column is a built-in expression chain (regexp/length/arithmetic) chosen so an
independent ANSI-SQL engine reproduces values bit-for-bat: integer counts,
ratios as double divisions of exact integers, no transcendental functions
(libm vs JVM last-ulp differences would break value-hash checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from database_anonymiser_spark.operators.dedup import normalized_text, tokens

# language marker words: deterministic n-gram-heuristic lexicons
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|and|is|to|in)\b",
    "es": r"\b(el|la|de|que|los|es)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|des|est|une)\b",
}

STOPWORD_PATTERN = r"\b(the|a|of|and|is|to|in)\b"
PUNCT_PATTERN = r"[.,!?;:]"


# BPE-style pre-tokenizer pieces: lowercase runs, Capitalized runs, digit
# runs, single punctuation marks. Character classes only — identical
# semantics under Java regex (Spark) and RE2 (DuckDB), no lookaround.
BPE_PIECE_RE = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + two BPE-ish measures.

    ``n_subwords_est`` counts maximal runs of ≤4 chars (len/4 rounded up) — a
    vocabulary-free proxy for BPE token counts. ``n_bpe_pieces`` counts
    pre-tokenizer pieces via :data:`BPE_PIECE_RE` (word/case/digit/punct
    splits, the GPT-2-style first pass before vocabulary merges).
    """
    n_tokens = F.size(tokens(text_col))
    n_chars = F.length(F.col(text_col))
    # ceil(len/4) per token ≈ sum over tokens; computed globally:
    # ceil((chars - spaces)/4) + 0*tokens keeps it one expression.
    non_space = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    bpe_ish = F.ceil(non_space / F.lit(4.0)).cast("long")
    n_pieces = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECE_RE), 0))
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        bpe_ish.alias("n_subwords_est"),
        n_pieces.cast("long").alias("n_bpe_pieces"),
    )


def _micro_half_up(num, den):
    """Exact round-half-up of num/den in 1e-6 units, pure BIGINT arithmetic.

    floor((2*num*1e6 + den) / (2*den)) — ties land on exact integers, and the
    double quotient of two <2^53 longs whose true value is an integer IS that
    integer, so floor() is exact. Avoids float round(), whose half-boundary
    behaviour differs between engines (Spark BigDecimal HALF_UP vs DuckDB
    double rounding) and caused 1-in-1000 value-hash mismatches.

    Zero/NULL denominator → 0 (round 4): under ANSI mode (Spark 4 default)
    the bare division RAISED DIVIDE_BY_ZERO, so one empty document killed
    an entire corpus-profiling job; ``try_divide`` + coalesce defines every
    ratio of an empty doc as 0, mirrored in the oracle's CASE guards
    (suite/text.py)."""
    return F.coalesce(
        F.floor(F.try_divide(2 * num * F.lit(1000000) + den, 2 * den)),
        F.lit(0),
    ).cast("long")


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio, and a
    linear quality score. All rounding is exact integer half-up in 1e-6 units;
    the only float op is one final division by a constant (identical IEEE
    result in any engine), so the output is bit-deterministic."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = F.size(tokens(text_col)).cast("long")
    n_punct = (F.length(t) - F.length(F.regexp_replace(t, PUNCT_PATTERN, ""))).cast("long")
    n_stop = F.regexp_count(t, F.lit(STOPWORD_PATTERN)).cast("long")
    n_nonspace = F.length(F.regexp_replace(t, r"\s+", "")).cast("long")
    punct_micro = _micro_half_up(n_punct, n_chars)
    stop_micro = _micro_half_up(n_stop, n_tokens)
    punct_ratio = punct_micro / F.lit(1000000.0)
    stop_ratio = stop_micro / F.lit(1000000.0)
    avg_token_len = _micro_half_up(n_nonspace, n_tokens) / F.lit(1000000.0)
    # score = min(tokens/100,1)*0.5 + (1-punct_ratio)*0.25 + min(5*stop_ratio,1)*0.25
    # in quarter-micro units: exact integers, then one exact-constant division.
    score_q = (
        2 * F.least(n_tokens * F.lit(10000), F.lit(1000000))
        + (F.lit(1000000) - punct_micro)
        + F.least(stop_micro * F.lit(5), F.lit(1000000))
    )
    score = score_q / F.lit(4000000.0)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_token_len.alias("avg_token_len"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-lexicon language ID: count markers per language, argmax with a
    fixed precedence order (en > es > de > fr) for ties; 'und' when all 0."""
    t = F.col(text_col)
    counts = {lang: F.regexp_count(t, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = precedence
        pred = pred.when(counts[lang] == best, F.lit(lang))
    return df.select(
        F.col(id_col),
        *[counts[lang].cast("long").alias(f"n_{lang}") for lang in LANG_MARKERS],
        pred.alias("lang_pred"),
    )


def fingerprint_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: md5 of normalised text + a 64-bit rolling-hash
    rendition (first 15 hex chars as integer) for compact storage."""
    norm = normalized_text(text_col)
    digest = F.md5(norm)
    return df.select(
        F.col(id_col),
        digest.alias("fingerprint"),
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("fingerprint64"),
    )


def text_profile(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Full per-document text profile — token counts, quality heuristics,
    language ID, and fingerprint — as ONE narrow projection. ``keep``
    columns (e.g. the train/eval split from :func:`train_eval_split`) are
    carried through so curation metadata rides the same single pass.

    This is the shape a 100 TB curation pipeline wants: every metric is a
    map-side built-in expression over the same scan, so profiling an entire
    corpus is a single pass with zero shuffles (vs one scan per metric
    family). Determinism arguments are inherited from the per-family
    helpers (integer micro-arithmetic, no transcendentals, md5-derived
    fingerprints). The computed columns are memoized per (session, text
    column) like the repetition signals — ~0.2s of py4j expression
    construction per invocation is driver overhead, not query cost.
    """
    return df.select(
        F.col(id_col),
        *_profile_columns(text_col),
        *[F.col(c) for c in keep],
    )


_PROFILE_CACHE: dict = {}


def _profile_columns(text_col: str) -> tuple[Column, ...]:
    key = _session_cache_key(text_col, _PROFILE_CACHE)
    hit = _PROFILE_CACHE.get(key) if key is not None else None
    if hit is not None:
        return hit
    t = F.col(text_col)
    n_tokens = F.size(tokens(text_col)).cast("long")
    n_chars = F.length(t).cast("long")
    non_space = F.length(F.regexp_replace(t, r"\s+", ""))
    n_punct = (F.length(t) - F.length(F.regexp_replace(t, PUNCT_PATTERN, ""))).cast("long")
    n_stop = F.regexp_count(t, F.lit(STOPWORD_PATTERN)).cast("long")
    punct_micro = _micro_half_up(n_punct, n_chars)
    stop_micro = _micro_half_up(n_stop, n_tokens)
    score_q = (
        2 * F.least(n_tokens * F.lit(10000), F.lit(1000000))
        + (F.lit(1000000) - punct_micro)
        + F.least(stop_micro * F.lit(5), F.lit(1000000))
    )
    lang_counts = {lang: F.regexp_count(t, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
    best = F.greatest(*lang_counts.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = precedence
        pred = pred.when(lang_counts[lang] == best, F.lit(lang))
    digest = F.md5(normalized_text(text_col))
    cols = (
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.ceil(non_space / F.lit(4.0)).cast("long").alias("n_subwords_est"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_PIECE_RE), 0)).cast("long").alias("n_bpe_pieces"),
        (punct_micro / F.lit(1000000.0)).alias("punct_ratio"),
        (stop_micro / F.lit(1000000.0)).alias("stopword_ratio"),
        (_micro_half_up(non_space.cast("long"), n_tokens) / F.lit(1000000.0)).alias(
            "avg_token_len"
        ),
        (score_q / F.lit(4000000.0)).alias("quality_score"),
        *[lang_counts[lang].cast("long").alias(f"n_{lang}") for lang in LANG_MARKERS],
        pred.alias("lang_pred"),
        digest.alias("fingerprint"),
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long").alias("fingerprint64"),
    )
    if key is not None:
        _PROFILE_CACHE[key] = cols
    return cols


#: Repetition gate thresholds (count-fraction analogues of the Gopher
#: repetition rules, Rae et al. 2021 §A1.1 — public paper). Gopher gates on
#: CHARACTER fractions; these are token-count fractions of the same events,
#: which need no second pass over the text and preserve the ordering on
#: uniform-ish token lengths. Tuned on the fixture corpus to reject the
#: pathologically loopy tail without touching ordinary prose.
REPETITION_THRESHOLDS: dict[str, float] = {
    "top_token_frac": 0.20,
    "top_2gram_frac": 0.18,
    "dup_3gram_frac": 0.18,
    "symbol_word_ratio": 0.10,
}


def _word_grams(toks: Column, n: int) -> Column:
    """Array of word ``n``-grams from a token array (duplicates KEPT — the
    repetition signals need multiplicity). Empty array below ``n`` tokens."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_count(arr: Column) -> Column:
    """Occurrences of the most frequent element (0 for empty arrays).

    array_sort + ONE aggregate fold tracking (prev, current-run, best-run):
    O(n log n) per row, linear lambda evaluations. The naive nested-lambda
    form (count each distinct element with a filter scan) is O(distinct × n)
    *interpreted* evaluations and measured ~75× slower at corpus scale;
    equality of the two constructions is pinned in tests. Entirely JVM-side,
    zero shuffle — the alternative (explode + two groupBys) pays corpus-wide
    shuffles for a per-row metric.
    """
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(F.array_sort(arr), acc0, step, lambda acc: acc["best"])


def _frac(num: Column, den: Column) -> Column:
    """num/den as an exact micro-half-up double; 0.0 when den = 0."""
    return F.when(den > 0, _micro_half_up(num, den) / F.lit(1000000.0)).otherwise(
        F.lit(0.0)
    )


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document repetition signals — the Gopher-style quality gates
    (Rae et al. 2021 §A1.1) a pretraining corpus is filtered on before
    anything else: looping generations, boilerplate, and keyword-stuffed
    spam all light up these columns long before a perplexity model sees
    them.

    Columns: ``top_token_frac`` (occurrences of the most frequent token /
    tokens), ``top_2gram_frac`` (same for word bigrams), ``dup_2gram_frac``
    / ``dup_3gram_frac`` (fraction of n-grams that are repeats of an
    earlier one), ``symbol_word_ratio`` (``#`` and ``...`` marks per
    token), and the composite ``repetitive`` gate at
    :data:`REPETITION_THRESHOLDS`.

    Every signal is an array higher-order expression over ONE tokenisation
    of the text: map-side, zero shuffle, zero Python — corpus cost is pure
    scan bandwidth, and the per-row work is bounded by document length (see
    :func:`_top_count`). All ratios use the exact integer micro-half-up
    arithmetic (:func:`_micro_half_up`), so the declared entry value-hash
    checks bit-for-bit against the DuckDB oracle.

    Measured cost (r15 correction of the round-4 note, which timed the
    count()-pruned plan and so saw none of the per-row work — guide
    §1.4): full materialization of the signals at sf0.1 (5k docs, noop
    sink, 32-way) was 7.3s in the flat one-Project form and is 0.6s in
    the staged form below; the ~0.4s of per-invocation DRIVER expression
    construction (py4j round trips building the fold trees) is memoized
    per session as before. Arrow-vectorizing the fold (VERDICT r3 #5)
    remains not worth a second execution path at this cost.

    Zero-real-token documents (empty, whitespace-only, or NULL text) emit
    ALL-ZERO signals and ``repetitive = false``: whitespace split of ''
    yields the single empty token [''], which would otherwise score
    top_token_frac = 1.0 and misattribute blank docs to the repetition
    gate in curation stats (they belong to the length gate). Mirrored in
    the DuckDB oracle's rep_toks CASE guard (suite/text.py).

    Physical shape (r15, guide §4 duplicated-evaluation class): the token
    and gram ARRAYS are materialized as real columns in chained selects
    before any signal reads them. Higher-order functions are
    CodegenFallback — no codegen subexpression elimination — so a signal
    column referencing the gram EXPRESSION re-derives it per column, and
    a lambda body referencing the token EXPRESSION (``slice(toks, i,
    n)``) re-evaluates the whitespace split PER ELEMENT: O(tokens ×
    doc_length) per gram array. With the arrays as attributes each is
    built exactly once per row and the lambdas read the attribute.
    CollapseProject cannot undo the factoring (non-cheap aliases
    referenced more than once are never inlined). Measured at sf0.1
    (noop sink, 32-way): 7.3s → 0.6s for the signals alone; identical
    values — the declared entry stays value-hash checked.
    """
    stage1, stage2, counts, signals = _staged_repetition_columns(text_col)
    passthrough = [F.col(id_col), *[F.col(k) for k in keep]]
    staged = (
        df.select(*passthrough, *stage1)
        .select("*", *stage2)
        .select(*passthrough, *counts)
    )
    return staged.select(
        F.col(id_col),
        *signals,
        *[F.col(c) for c in keep],
    )


#: built signal Columns memoized per (session, text column name): Columns
#: are immutable unresolved expressions, safe to reuse across queries, and
#: building the two _top_count fold trees costs ~0.4s of py4j round trips
#: per invocation — pure driver overhead the bench/driver/oracle otherwise
#: pay on every call. Keyed by the SparkContext's applicationId — a stable
#: token unique per context — so a restarted JVM never sees a stale py4j
#: handle (round-5 advice fix: keying on id(session) could alias a NEW
#: session onto a dead one's entry after CPython reuses the id). Entries of
#: dead contexts are evicted on the first build under a new context, so the
#: dict never grows past one context's worth of columns.
_REP_SIGNAL_CACHE: dict = {}


def _session_cache_key(text_col: str, cache: dict) -> tuple | None:
    """(applicationId, text_col) cache key, or None when no session is
    active (caller builds uncached). Evicts other contexts' entries."""
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    if sess is None:
        return None
    try:
        app_id = sess.sparkContext.applicationId
    except Exception:
        return None  # context already stopped — don't cache
    for k in [k for k in cache if k[0] != app_id]:
        del cache[k]
    return (app_id, text_col)


def _staged_repetition_columns(text_col: str):
    """The four Column groups of repetition_profile's staged plan —
    memoized per (session, text column) like the old flat signals (the
    two _top_count fold trees cost ~0.4s of py4j round trips to build):

    - stage1: the raw text (carried for the symbol regex) + token array;
    - stage2: bigram/trigram arrays built FROM the token attribute;
    - counts: every non-cheap per-row quantity (folds, distinct sizes,
      symbol count) evaluated exactly once each over the attributes;
    - signals: the six output columns as cheap arithmetic over counts.

    A Column-typed ``text_col`` builds UNCACHED (the r14 flat form's
    tolerance, restored per the r15 advice — memoizing on a Column
    object's identity would never hit anyway).
    """
    key = (
        _session_cache_key(text_col, _REP_SIGNAL_CACHE)
        if isinstance(text_col, str)
        else None
    )
    hit = _REP_SIGNAL_CACHE.get(key) if key is not None else None
    if hit is not None:
        return hit
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.when(c.rlike(r"\S"), tokens(text_col)).otherwise(
        F.array().cast("array<string>")
    )
    stage1 = (c.alias("_rp_text"), toks.alias("_rp_toks"))
    stage2 = (
        _word_grams(F.col("_rp_toks"), 2).alias("_rp_bi"),
        _word_grams(F.col("_rp_toks"), 3).alias("_rp_tri"),
    )
    counts = (
        _top_count(F.col("_rp_toks")).alias("_rp_top_tok"),
        _top_count(F.col("_rp_bi")).alias("_rp_top_bi"),
        F.size("_rp_toks").cast("long").alias("_rp_n_tok"),
        F.size("_rp_bi").cast("long").alias("_rp_n_bi"),
        F.size("_rp_tri").cast("long").alias("_rp_n_tri"),
        F.size(F.array_distinct("_rp_bi")).cast("long").alias("_rp_d_bi"),
        F.size(F.array_distinct("_rp_tri")).cast("long").alias("_rp_d_tri"),
        F.regexp_count(F.col("_rp_text"), F.lit(r"#|\.\.\."))
        .cast("long")
        .alias("_rp_sym"),
    )
    g = REPETITION_THRESHOLDS
    top_token_frac = _frac(F.col("_rp_top_tok"), F.col("_rp_n_tok"))
    top_2gram_frac = _frac(F.col("_rp_top_bi"), F.col("_rp_n_bi"))
    dup_2gram_frac = _frac(F.col("_rp_n_bi") - F.col("_rp_d_bi"), F.col("_rp_n_bi"))
    dup_3gram_frac = _frac(F.col("_rp_n_tri") - F.col("_rp_d_tri"), F.col("_rp_n_tri"))
    symbol_word_ratio = _frac(F.col("_rp_sym"), F.col("_rp_n_tok"))
    repetitive = (
        (top_token_frac > g["top_token_frac"])
        | (top_2gram_frac > g["top_2gram_frac"])
        | (dup_3gram_frac > g["dup_3gram_frac"])
        | (symbol_word_ratio > g["symbol_word_ratio"])
    )
    signals = (
        top_token_frac.alias("top_token_frac"),
        top_2gram_frac.alias("top_2gram_frac"),
        dup_2gram_frac.alias("dup_2gram_frac"),
        dup_3gram_frac.alias("dup_3gram_frac"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        repetitive.alias("repetitive"),
    )
    built = (stage1, stage2, counts, signals)
    if key is not None:
        _REP_SIGNAL_CACHE[key] = built
    return built


#: lambda-bound gate Column memoized per (applicationId, text col) — same
#: rationale as _REP_SIGNAL_CACHE (the fold trees cost ~0.4s of py4j
#: round trips to build)
_REP_GATE_CACHE: dict = {}


def repetitive_gate(text_col: str) -> Column:
    """The composite ``repetitive`` boolean as a FILTER-SAFE Column.

    :func:`repetition_profile`'s alias works in projection context, but a
    filter on it gets the alias SUBSTITUTED into the WHERE clause
    (PushDownPredicates), where Catalyst performs no common-subexpression
    elimination — the tokenization and both _top_count fold trees then
    re-evaluate once per disjunct (the round-5/6 measured trap; see
    bloom.py for the original case). The one sharing construct that
    works in filter context is HOF LAMBDA BINDING: the token array is
    computed ONCE as the single element of a literal array, and every
    signal derives from the bound lambda variable. Measured at sf0.1:
    1.76s → 0.70s for the curation repetition gate, identical rows.

    Gate semantics are identical to ``repetition_profile().repetitive``
    (same empty-token guard: blank docs are NOT repetitive — they belong
    to the length gate).
    """
    key = _session_cache_key(text_col, _REP_GATE_CACHE)
    if key is not None:
        hit = _REP_GATE_CACHE.get(key)
        if hit is not None:
            return hit
    c = F.col(text_col)
    toks = F.when(c.rlike(r"\S"), tokens(text_col)).otherwise(
        F.array().cast("array<string>")
    )
    g = REPETITION_THRESHOLDS

    def _body(t):
        bi = _word_grams(t, 2)
        tri = _word_grams(t, 3)
        n_tok = F.size(t).cast("long")
        return (
            (_frac(_top_count(t), n_tok) > g["top_token_frac"])
            | (_frac(_top_count(bi), F.size(bi).cast("long")) > g["top_2gram_frac"])
            | (
                _frac(
                    F.size(tri).cast("long")
                    - F.size(F.array_distinct(tri)).cast("long"),
                    F.size(tri).cast("long"),
                )
                > g["dup_3gram_frac"]
            )
            | (
                _frac(F.regexp_count(c, F.lit(r"#|\.\.\.")).cast("long"), n_tok)
                > g["symbol_word_ratio"]
            )
        )

    gate = F.element_at(F.transform(F.array(toks), _body), 1)
    if key is not None:
        _REP_GATE_CACHE[key] = gate
    return gate


# PII patterns for free-text scrubbing: character classes + bounded
# quantifiers only — identical semantics under Java regex (Spark) and RE2
# (DuckDB), no lookaround. Order matters: SSN before phone (a 3-2-4 SSN must
# not be half-eaten by the 3-3-4 phone pattern).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    (r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "[PHONE]"),
)


def scrub_pii(col: Column | str, patterns: tuple[tuple[str, str], ...] = PII_PATTERNS) -> Column:
    """Free-text PII scrubbing: replace emails / SSNs / phone numbers with
    typed placeholder tokens — the anonymiser's masking strategies extended
    to unstructured text, the transform every LLM training-data pipeline
    runs before ingestion.

    A chain of built-in regexp_replace calls: map-side, whole-stage
    codegen, zero shuffles — scales as pure scan bandwidth.
    """
    out = F.col(col) if isinstance(col, str) else col
    for pat, token in patterns:
        out = F.regexp_replace(out, pat, token)
    return out


def heavy_hitters(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Corpus-level heavy hitters: the k most frequent whitespace tokens.

    Exact formulation: explode → partial-agg count (map-side combine
    collapses each partition to its distinct tokens before the shuffle) →
    TakeOrderedAndProject top-k (per-partition heaps, no global sort).
    Deterministic tie-break on the token itself. At 100 TB the partial
    aggregation is what keeps the shuffle proportional to |vocabulary|,
    not |tokens|; for a sketched alternative with bounded memory see
    ``DataFrame.freqItems`` (pinned against this exact answer in
    tests/test_suite_ops.py).
    """
    return (
        # r15: explode_outer + isNotNull (see dedup.explode_nonempty)
        df.select(F.explode_outer(tokens(text_col)).alias("term"))
        .where(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(k)
    )


def tfidf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """TF-IDF with a rational idf (n_docs / doc_freq, no logarithm).

    ln() is deliberately avoided: libm vs JVM transcendentals differ in the
    last ulp, which would break cross-engine value-hash checks; the rational
    idf preserves the ranking property (rarer term → larger weight) with only
    exact integer divisions. Shape: one explode (linear in tokens), two hash
    aggregations, one broadcast of the per-term doc-frequency table — no
    driver-side collect, so the construction holds at any corpus size.
    """
    # r15: explode_outer + isNotNull (see dedup.explode_nonempty)
    tok = df.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("term")
    ).where(F.col("term").isNotNull())
    tf_raw = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("term_count"))
    doc_len = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("doc_len"))
    doc_freq = tf_raw.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    return (
        tf_raw.join(doc_len, id_col)
        .join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "term_count",
            "doc_freq",
            F.round(
                (F.col("term_count") / F.col("doc_len"))
                * (F.col("n_docs") / F.col("doc_freq")),
                6,
            ).alias("tfidf"),
        )
    )


def train_eval_split(
    df: DataFrame,
    group_col: str,
    train_pct: int = 90,
    salt: str = "split-v1",
) -> DataFrame:
    """Leakage-safe train/eval assignment for training-corpus curation.

    The split is a deterministic function of the GROUP key (domain, source,
    URL host…), never of the row: every document sharing a key lands on the
    same side, so near-duplicates inside a crawl domain can never straddle
    train and eval — the contamination mode row-wise random splits are
    famously blind to. ``salt`` versions the assignment (a new salt is a
    fresh re-split; the same salt is stable forever, across runs and
    cluster sizes).

    Bucket arithmetic is the engine-portable md5 construction used by the
    corpus fingerprints (hex→decimal via conv/substr), so the whole
    assignment is reproducible in ANSI SQL — the declared ``text_profile``
    entry value-hash checks it against DuckDB. Map-side, zero shuffle.
    """
    if not 0 < train_pct < 100:
        raise ValueError("train_pct must be in (0, 100)")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(group_col))), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    return df.withColumn("split_bucket", bucket).withColumn(
        "split", F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("eval"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_shards: int = 256,
) -> DataFrame:
    """Greedy sequence packing: bin documents into training sequences of at
    most ``budget`` tokens (a doc longer than the budget gets a bin of its
    own) — the batch-construction step of an LLM pretraining pipeline.

    Deterministic at any parallelism: docs are sharded by a hash of the id
    (``n_shards`` deterministic groups, NOT spark partitions), each shard
    is packed greedily in id order inside one applyInPandas group, and the
    emitted ``seq_id`` is ``shard * 2^32 + bin_index``. Re-running on a
    differently-partitioned cluster yields byte-identical packing.

    Scale shape: one shuffle (the groupBy on shard); each shard's state is
    a single running counter, so memory is O(shard rows) and ``n_shards``
    is the parallelism knob. Cross-shard packing loss is bounded by one
    under-filled tail bin per shard.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if budget <= 0:
        raise ValueError("budget must be positive")
    in_fields = {f.name: f for f in df.schema.fields}
    schema = T.StructType(
        [
            in_fields[id_col],
            T.StructField("n_tokens", T.LongType()),
            T.StructField("seq_id", T.LongType()),
            T.StructField("seq_pos", T.IntegerType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        shard = int(pdf["_shard"].iat[0])
        seq_ids, seq_pos = [], []
        bin_idx, filled, pos = 0, 0, 0
        for nt in pdf[n_tokens_col]:
            nt = int(nt)
            if filled > 0 and filled + nt > budget:
                bin_idx, filled, pos = bin_idx + 1, 0, 0
            seq_ids.append(shard * (2**32) + bin_idx)
            seq_pos.append(pos)
            filled += nt
            pos += 1
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "n_tokens": pdf[n_tokens_col].astype("int64"),
                "seq_id": seq_ids,
                "seq_pos": seq_pos,
            }
        )

    sharded = df.select(id_col, n_tokens_col).withColumn(
        "_shard", F.pmod(F.hash(F.col(id_col)), F.lit(n_shards))
    )
    return sharded.groupBy("_shard").applyInPandas(pack, schema)


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_common: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: which train docs share word ``n``-grams
    with which eval docs — the leakage check every training-corpus build
    runs before a model ever sees the data (the n-gram-overlap method of
    the GPT-3/PaLM decontamination appendices, n≈8-13).

    Returns (train_id, eval_id, n_common, contamination): ``n_common``
    distinct shared n-grams, ``contamination`` = the fraction of the eval
    doc's distinct n-grams found in that train doc (1.0 = the whole eval
    doc is inside the train doc), rounded to 6dp. Rows below
    ``min_common`` are dropped.

    100 TB design: the eval side is a benchmark — thousands of docs, not
    billions — so with ``broadcast_eval`` (default) its inverted index
    broadcasts and the train side NEVER shuffles: scan → map-side shingle
    explode → broadcast-hash join → partial agg. The train corpus being
    the 100 TB side costs one pass of scan bandwidth. Set
    ``broadcast_eval=False`` only for eval sets too big to broadcast
    (then it's a standard shuffle join on the shingle).
    """
    from database_anonymiser_spark.operators.dedup import (
        explode_nonempty,
        shingle_array,
    )

    # r15: explode_nonempty, not bare explode — a plain explode of the
    # shingle chain makes Catalyst infer size(chain)>0 and push the whole
    # chain into the scan stage, where it re-evaluated twice per row on
    # the scan's task count (measured: ~8s of this operator's 9s at
    # sf0.1 sat in that inferred filter)
    tr = explode_nonempty(
        shingle_array(train, id_col, text_col, n).select(
            F.col(id_col).alias("train_id"), "shingle_arr"
        ),
        "shingle_arr", "shingle", "train_id",
    )
    ev_arr = shingle_array(eval_df, id_col, text_col, n)
    ev = explode_nonempty(
        ev_arr.select(F.col(id_col).alias("eval_id"), "shingle_arr"),
        "shingle_arr", "shingle", "eval_id",
    )
    ev_sz = ev_arr.select(
        F.col(id_col).alias("eval_id"), F.size("shingle_arr").alias("_n_eval")
    )
    if broadcast_eval:
        ev, ev_sz = F.broadcast(ev), F.broadcast(ev_sz)
    common = (
        tr.join(ev, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    return common.join(ev_sz, "eval_id").select(
        "train_id",
        "eval_id",
        "n_common",
        F.round(F.col("n_common") / F.col("_n_eval"), 6).alias("contamination"),
    )


#: C4 line-keep rule (Raffel et al. 2020 §2.2): a line survives when it has
#: ≥ C4_MIN_LINE_WORDS words and ends in terminal punctuation. Doc-level:
#: pages containing curly braces or the phrase "lorem ipsum" are flagged as
#: boilerplate (code / placeholder pages).
C4_MIN_LINE_WORDS = 3
C4_TERMINAL_RE = r'[.!?"]\s*$'


def c4_clean(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """C4-style line-level cleaning signals + cleaned text — the classic
    pretraining-corpus scrub between raw crawl and the document-level gates
    (quality/repetition): per LINE keep only real sentences (≥
    :data:`C4_MIN_LINE_WORDS` words, terminal punctuation); per DOC flag
    code/boilerplate pages ('{' / 'lorem ipsum').

    Entirely map-side array expressions over one split of the text — zero
    shuffle, zero Python; every condition is a character-class regex with
    identical semantics under Java regex and RE2, so the packed
    ``text_profile`` columns value-hash check against the DuckDB oracle
    (suite/text.py). Columns: ``c4_n_lines``, ``c4_kept_lines``,
    ``c4_boilerplate``, ``c4_clean_fingerprint`` (md5 of the cleaned text —
    pins the exact reconstructed document without hauling it through the
    compare), ``c4_text`` (the cleaned document, for pipeline use).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r"\S")
        & (F.size(F.split(F.trim(ln), r"\s+")) >= C4_MIN_LINE_WORDS)
        & ln.rlike(C4_TERMINAL_RE),
    )
    cleaned = F.array_join(kept, "\n")
    boiler = c.contains("{") | F.lower(c).contains("lorem ipsum")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("c4_n_lines"),
        F.size(kept).cast("long").alias("c4_kept_lines"),
        boiler.alias("c4_boilerplate"),
        F.md5(cleaned).alias("c4_clean_fingerprint"),
        cleaned.alias("c4_text"),
        *[F.col(x) for x in keep],
    )


#: Linear quality-classifier weights, integer micro-units. Fixed, public,
#: in-source — the classifier is a deterministic stand-in for the
#: fastText/logistic quality filters the published pipelines train
#: (CCNet Wenzek et al. 2019; LLaMA's Wikipedia-reference classifier):
#: same feature set and decision shape, reproducible weights instead of
#: an opaque model binary. Score = Σ wᵢ·featᵢ(micro) / 1e7 ∈ ~[-0.5, 0.7];
#: downstream thresholding is order-equivalent to the sigmoid the trained
#: models apply (monotone transform), so no transcendental enters the path.
QUALITY_CLF = {
    "len_sat": 2,        # × min(n_tokens·1000, 1e6): longer docs, saturating at 1000 tokens
    "punct": -1,         # × punct_micro: punctuation-dense pages penalized
    "stop": 3,           # × min(stop_micro·5, 1e6): stopword presence marks natural prose
    "len_dev": -1,       # × min(|avglen_micro − 5e6|, 5e6)·1/5: odd token lengths penalized
    "is_en": 1,          # × 1e6 when the marker-lexicon argmax is 'en'
}


def quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep: tuple[str, ...] = (),
    cutoff: float = 0.2,
) -> DataFrame:
    """Deterministic linear quality classifier — the model-based document
    filter of the published curation pipelines (CCNet's fastText LM filter,
    the LLaMA Wikipedia-reference classifier), rendered as a fixed-weight
    linear model over the engine's deterministic profile features so the
    whole path is value-hash reproducible cross-engine (no model binary, no
    transcendentals: integer micro-arithmetic + one exact constant divide).

    Output: (id, qc_score DOUBLE, qc_keep BOOLEAN[, keep...]) — qc_score is
    the raw linear score (monotone in the sigmoid the trained twins emit),
    qc_keep = qc_score >= cutoff.

    100 TB shape: one map-side projection over the scan, zero shuffles,
    whole-stage codegen end to end — composes into curate_corpus's single
    profiling pass.
    """
    from database_anonymiser_spark.operators.dedup import tokens

    t = F.col(text_col)
    n_tokens = F.size(tokens(text_col)).cast("long")
    n_chars = F.length(t).cast("long")
    n_punct = (F.length(t) - F.length(F.regexp_replace(t, PUNCT_PATTERN, ""))).cast("long")
    n_stop = F.regexp_count(t, F.lit(STOPWORD_PATTERN)).cast("long")
    n_nonspace = F.length(F.regexp_replace(t, r"\s+", "")).cast("long")
    punct_micro = _micro_half_up(n_punct, n_chars)
    stop_micro = _micro_half_up(n_stop, n_tokens)
    avglen_micro = _micro_half_up(n_nonspace, n_tokens)
    lang_counts = {lang: F.regexp_count(t, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
    best = F.greatest(*lang_counts.values())
    is_en = ((best > 0) & (lang_counts["en"] == best)).cast("long")
    w = QUALITY_CLF
    logit_micro = (
        F.lit(w["len_sat"]) * F.least(n_tokens * F.lit(1000), F.lit(1_000_000))
        + F.lit(w["punct"]) * punct_micro
        + F.lit(w["stop"]) * F.least(stop_micro * F.lit(5), F.lit(1_000_000))
        + F.lit(w["len_dev"])
        * F.floor(
            F.least(
                F.abs(avglen_micro - F.lit(5_000_000)), F.lit(5_000_000)
            )
            / F.lit(5)
        ).cast("long")
        + F.lit(w["is_en"]) * is_en * F.lit(1_000_000)
    )
    score = (logit_micro / F.lit(10_000_000.0)).alias("qc_score")
    return df.select(
        F.col(id_col),
        score,
        (logit_micro >= F.lit(int(cutoff * 10_000_000))).alias("qc_keep"),
        *[F.col(c) for c in keep],
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Fixed-size overlapping document chunking — the window splitter every
    RAG index and long-document training pipeline runs before embedding
    (LangChain/LlamaIndex token splitters, the Pile's context windows):
    chunks of ``chunk_tokens`` whitespace tokens advancing by
    ``chunk_tokens - overlap``, so consecutive chunks share ``overlap``
    tokens and no token is dropped. Documents at or under one window yield
    exactly one chunk (the whole doc).

    Output: (id, chunk_idx, chunk_text, chunk_id) — chunk_id is the md5 of
    "id:idx:text", a stable global key for downstream embedding/dedup
    joins however the corpus is repartitioned.

    100 TB shape: one map-side projection (sequence + slice + array_join
    inside whole-stage codegen, posexplode generator) — no shuffle, no
    Python; output volume is corpus tokens × (1 + overlap/stride).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    from database_anonymiser_spark.operators.dedup import tokens

    tok_df = df.select(F.col(id_col), tokens(text_col).alias("_t"))
    # chunk starts: 1, 1+stride, ... while start <= max(size - overlap, 1)
    # — the last window may be short but never empty, and a doc within one
    # window produces the single start 1.
    chunks = F.expr(
        f"transform(sequence(1, greatest(size(_t) - {overlap}, 1), {stride}), "
        f"s -> array_join(slice(_t, s, {chunk_tokens}), ' '))"
    )
    # r15: posexplode_outer + isNotNull (see dedup.explode_nonempty) —
    # keeps the tokenize+slice chain out of the inferred scan filter
    out = tok_df.select(
        F.col(id_col), F.posexplode_outer(chunks).alias("chunk_idx", "chunk_text")
    ).where(F.col("chunk_text").isNotNull())
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.md5(
            F.concat_ws(":", F.col(id_col).cast("string"), F.col("chunk_idx"), F.col("chunk_text"))
        ).alias("chunk_id"),
    )


#: char-bigram LM alphabet: a-z, space, and '_' (everything else folds to
#: '_') — 28 symbols, so the model is ≤ 784 cells however large the corpus
LM_ALPHABET_SIZE = 28


def char_bigram_lm(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained character-bigram LM quality score — the LM-filter
    class of CCNet/Dolma (there a KenLM 5-gram perplexity; here the
    smallest model with the same shape: P(c2|c1) with add-one smoothing
    over a 28-symbol alphabet) rendered in the engine's exact-integer
    convention so scores value-hash check cross-engine.

    Text folds to lowercase with non-[a-z ] mapped to '_'; the model is
    the corpus's bigram transition table; a document's score is the MEAN
    transition probability of its bigrams in micro-ints:
    ``prob_micro(c1c2) = (cnt(c1c2)+1)*1e6 div (cnt(c1·)+28)`` and
    ``lm_mean_prob = (Σ prob_micro) div n_bigrams / 1e6``. The arithmetic
    mean of transition probabilities is monotone with fluency in the same
    direction as (negated) perplexity but stays in integer space —
    log-domain bits-per-char would hinge on cross-engine ``log`` ulps.
    Natural running text rides high-frequency transitions; junk (random
    chars, tables of symbols) rides smoothed near-zero ones.

    Returns (id, lm_bigrams, lm_mean_prob); documents with <2 normalized
    chars get (0, 0.0). 100 TB shape: the TRAIN pass is one bounded
    aggregate (≤784 cells, partial-aggregated map-side — the model, like
    the IVF codebook, is data-size-independent); the SCORE pass explodes
    bigrams map-side, broadcast-joins the 784-row model, and aggregates
    once per document — one shuffle on the doc id, nothing driver-side.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "_")
    base = df.select(F.col(id_col), norm.alias("_n"))
    grams = base.select(
        id_col,
        # r15: explode_outer + isNotNull — bare explode makes Catalyst
        # infer size(...)>0 and push the normalization regex into the
        # scan stage twice per row (see dedup.explode_nonempty)
        F.explode_outer(
            F.when(
                F.length("_n") >= 2, F.sequence(F.lit(1), F.length("_n") - 1)
            ).otherwise(F.array())
        ).alias("_i"),
        F.col("_n"),
    ).where(F.col("_i").isNotNull()).select(
        id_col, F.expr("substring(_n, _i, 2)").alias("_bg")
    )
    counts = grams.groupBy("_bg").agg(F.count(F.lit(1)).alias("_cnt"))
    tots = counts.groupBy(F.substring("_bg", 1, 1).alias("_c1")).agg(
        F.sum("_cnt").alias("_tot")
    )
    model = counts.join(
        tots, F.substring(counts["_bg"], 1, 1) == tots["_c1"]
    ).select(
        "_bg",
        F.expr(f"(_cnt + 1) * 1000000 div (_tot + {LM_ALPHABET_SIZE})").alias(
            "_prob_micro"
        ),
    )
    scored = (
        grams.join(F.broadcast(model), "_bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("lm_bigrams"),
            F.expr("sum(_prob_micro) div count(1)").alias("_mean_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("lm_bigrams"), F.lit(0)).alias("lm_bigrams"),
            (F.coalesce(F.col("_mean_micro"), F.lit(0)) / 1_000_000.0).alias(
                "lm_mean_prob"
            ),
        )
    )
