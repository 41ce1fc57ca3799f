"""Declared dedup queries over ``documents`` (SURVEY.md §2 extensions).

The MinHash/SimHash oracles reproduce the engine's exact hash construction
(md5 → base-16 → mod 2^31-1 → universal hash family) in ANSI SQL, so even
the sketch-based dedup paths are full value-hash checked — not rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark.operators import dedup as D
from database_anonymiser_spark.operators import graph as G
from database_anonymiser_spark.suite.base import load, register

# shared oracle CTE: distinct word 3-gram shingles per doc
_SHINGLES_CTE = r"""
tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS i
  FROM documents
), sh AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
)
"""

_JACCARD_CTE = (
    _SHINGLES_CTE
    + r"""
, sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS common
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         round(common / (sa.n + sb.n - common), 6) AS jaccard
  FROM pairs
  JOIN sizes sa ON pairs.id_a = sa.doc_id
  JOIN sizes sb ON pairs.id_b = sb.doc_id
)
"""
)


@register(
    "dedup_exact",
    r"""
    WITH doc_branch AS (
      SELECT 'doc' AS method, text, min(doc_id) AS doc_id,
             CAST(count(*) AS BIGINT) AS n
      FROM documents
      GROUP BY text
    ),
    lines AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos,
             unnest(string_split(text, chr(10))) AS ln
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, pos, ln,
             trim(regexp_replace(lower(ln), '\s+', ' ', 'g')) AS key
      FROM lines
    ),
    hot AS (
      SELECT key FROM keyed
      WHERE regexp_matches(key, '\S')
      GROUP BY key
      HAVING count(DISTINCT doc_id) >= 2
    ),
    kept AS (
      SELECT k.* FROM keyed k
      WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.key = k.key)
    ),
    reasm AS (
      SELECT doc_id,
             string_agg(ln, chr(10) ORDER BY pos) AS text,
             CAST(count(*) AS BIGINT) AS kept_n
      FROM kept GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id,
             CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines
      FROM documents
    ),
    line_branch AS (
      SELECT 'line' AS method, coalesce(r.text, '') AS text, t.doc_id,
             t.n_lines - coalesce(r.kept_n, 0) AS n
      FROM tot t LEFT JOIN reasm r USING (doc_id)
    ),
    best_branch AS (
      SELECT 'best' AS method, text, doc_id, n FROM (
        SELECT text, doc_id,
               CAST(count(*) OVER (PARTITION BY lang, source) AS BIGINT) AS n,
               row_number() OVER (
                 PARTITION BY lang, source
                 ORDER BY n_chars DESC NULLS LAST, doc_id ASC
               ) AS rn
        FROM documents
      ) WHERE rn = 1
    )
    SELECT * FROM doc_branch UNION ALL SELECT * FROM line_branch
    UNION ALL SELECT * FROM best_branch
    """,
    tags=("dedup",),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup at BOTH granularities, tagged and unioned (round 4):
    'doc' = whole-document exact dedup (groupBy text, keep min id);
    'line' = cross-document line dedup (operators/dedup.py::line_dedup —
    the RefinedWeb/CCNet boilerplate scrub: any normalized line shared by
    ≥2 documents is stripped from all of them, documents reassembled in
    original line order). Both branches value-hash checked."""
    docs = load(spark, sf_dir, "documents")
    doc_branch = D.exact_dedup(docs, ["text"], "doc_id").select(
        F.lit("doc").alias("method"),
        "text",
        "doc_id",
        F.col("dup_count").cast("long").alias("n"),
    )
    line_branch = D.line_dedup(docs, "doc_id", "text", min_docs=2).select(
        F.lit("line").alias("method"),
        "text",
        "doc_id",
        F.col("n_removed").alias("n"),
    )
    # 'best' (round 9): quality-aware survivor selection — keep the
    # LONGEST doc per (lang, source) group, ties -> smallest id
    # (operators/dedup.py::best_dedup: single-aggregation struct argmax,
    # no window; the oracle replays it as DESC NULLS LAST row_number)
    best_branch = D.best_dedup(
        docs, ["lang", "source"], "doc_id", "n_chars", keep_cols=("text",)
    ).select(
        F.lit("best").alias("method"),
        "text",
        "doc_id",
        F.col("dup_count").cast("long").alias("n"),
    )
    return doc_branch.unionByName(line_branch).unionByName(best_branch)


# dedup_fingerprint retired as a DECLARED entry (round 5 consolidation —
# the driver's gate checks the 50 alphabetically-first queries): its exact
# output (md5 of normalized text) ships inside text_profile's fingerprint /
# fingerprint64 columns, which the text_profile oracle value-hash checks
# with the identical SQL. operators/dedup.py::fingerprint remains the
# operator surface and stays pytest-covered.


# capped chain over the SAME tok/sh CTEs (no duplicate CTE names)
_CAPPED_CHAIN = r"""
dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
shc AS (
  SELECT sh.doc_id, sh.shingle
  FROM sh JOIN dfreq ON sh.shingle = dfreq.shingle
  WHERE dfreq.df <= 25
),
csizes AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
cpairs AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS common
  FROM shc x JOIN shc y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
cjac AS (
  SELECT id_a, id_b,
         round(common / (sa.n + sb.n - common), 6) AS jaccard
  FROM cpairs
  JOIN csizes sa ON cpairs.id_a = sa.doc_id
  JOIN csizes sb ON cpairs.id_b = sb.doc_id
)
"""


@register(
    "dedup_jaccard",
    f"""
    WITH RECURSIVE {_JACCARD_CTE}, {_CAPPED_CHAIN},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM jac WHERE jaccard >= 0.5
      UNION ALL
      SELECT id_b, id_a FROM jac WHERE jaccard >= 0.5
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    sh5 AS (
      SELECT DISTINCT a.doc_id,
             a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS shingle
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                 JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
                 JOIN tok d ON a.doc_id = d.doc_id AND d.i = a.i + 3
                 JOIN tok e ON a.doc_id = e.doc_id AND e.i = a.i + 4
    ),
    split AS (
      SELECT doc_id,
             (('0x' || substr(md5('split-v1' || source), 1, 15))::BIGINT) % 100 AS b
      FROM documents
    ),
    trsh AS (SELECT sh5.* FROM sh5 JOIN split USING (doc_id) WHERE b < 90),
    evsh AS (SELECT sh5.* FROM sh5 JOIN split USING (doc_id) WHERE b >= 90),
    evsz AS (SELECT doc_id, count(*) AS n FROM evsh GROUP BY doc_id),
    contam AS (
      SELECT t.doc_id AS id_a, e.doc_id AS id_b, count(*) AS c
      FROM trsh t JOIN evsh e ON t.shingle = e.shingle GROUP BY 1, 2
    )
    SELECT 'all' AS variant, id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
    UNION ALL
    SELECT 'df_capped' AS variant, id_a, id_b, jaccard FROM cjac WHERE jaccard >= 0.5
    UNION ALL
    SELECT 'cluster' AS variant, id AS id_a, min(lbl) AS id_b,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM reach GROUP BY id
    UNION ALL
    SELECT 'contam' AS variant, c2.id_a, c2.id_b, round(c2.c / z.n, 6) AS jaccard
    FROM contam c2 JOIN evsz z ON c2.id_b = z.doc_id
    """,
    tags=("dedup", "skew", "graph", "decontam"),
)
def dedup_jaccard(spark, sf_dir):
    """Inverted-index n-gram Jaccard pairs plus their transitive closure,
    three variants tagged and unioned:

    - 'all': every pair at jaccard ≥ 0.5 (full inverted index);
    - 'df_capped': the max_df hot-shingle skew guard, df ≤ 25 — the 100 TB
      formulation: the pair-exploding stopword shingles never reach the
      self-join; the drop-set is tiny by construction, one df-count
      shuffle plus a broadcast anti join;
    - 'cluster': connected components over the 'all' pairs — (member id,
      cluster id) with cluster id = min member, the duplicate-GROUP shape
      a curation pipeline dedups by (operators/graph.py: min-label
      propagation with pointer-jumping shortcuts, O(log diameter)
      rounds). The oracle reproduces the closure with a recursive CTE, so
      the distributed iteration is value-hash checked cross-engine;
    - 'contam': benchmark decontamination — the leakage-safe train/eval
      split (same md5-bucket-by-source assignment text_profile checks),
      then 5-gram overlap train→eval via a broadcast inverted index: the
      eval side broadcasts so the train corpus never shuffles (id_a =
      train doc, id_b = eval doc, jaccard = fraction of the eval doc's
      5-grams present in the train doc).
    """
    from database_anonymiser_spark.operators import text as TX

    docs = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    every = pairs.select(F.lit("all").alias("variant"), "id_a", "id_b", "jaccard")
    capped = D.jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=25
    ).select(F.lit("df_capped").alias("variant"), "id_a", "id_b", "jaccard")
    clusters = G.connected_components(pairs).select(
        F.lit("cluster").alias("variant"),
        F.col("id").alias("id_a"),
        F.col("cluster_id").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    split = TX.train_eval_split(docs, "source")
    contam = TX.ngram_contamination(
        split.where(F.col("split") == "train"),
        split.where(F.col("split") == "eval"),
        "doc_id",
        "text",
        n=5,
    ).select(
        F.lit("contam").alias("variant"),
        F.col("train_id").alias("id_a"),
        F.col("eval_id").alias("id_b"),
        F.col("contamination").alias("jaccard"),
    )
    return every.unionByName(capped).unionByName(clusters).unionByName(contam)


def _minhash_oracle() -> str:
    sig_exprs = ",\n    ".join(
        f"min((x * {a} + {b}) % {D.MERSENNE_P}) AS mh_{i}"
        for i, (a, b) in enumerate(D.HASH_FAMILY)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b0} AS band_id, "
        f"mh_{b0}::VARCHAR || '_' || mh_{b0 + 1}::VARCHAR AS band_key FROM sig"
        for b0 in range(0, len(D.HASH_FAMILY), 2)
    )
    return f"""
    WITH {_JACCARD_CTE},
    hx AS (
      SELECT doc_id,
             (('0x' || substr(md5(shingle), 1, 15))::BIGINT) % {D.MERSENNE_P} AS x
      FROM sh
    ),
    sig AS (SELECT doc_id, {sig_exprs} FROM hx GROUP BY doc_id),
    bands AS ({band_selects}),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l
      JOIN bands r ON l.band_id = r.band_id AND l.band_key = r.band_key
                  AND l.doc_id < r.doc_id
    )
    SELECT cand.id_a, cand.id_b, jac.jaccard
    FROM cand JOIN jac ON cand.id_a = jac.id_a AND cand.id_b = jac.id_b
    WHERE jac.jaccard >= 0.5
    """


def _simhash_oracle() -> str:
    votes = ",\n    ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(D.SIMHASH_BITS)
    )
    bits = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {2**i} ELSE 0 END" for i in range(D.SIMHASH_BITS)
    )
    return rf"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      FROM documents
    ),
    h AS (
      SELECT doc_id, (('0x' || substr(md5(w), 1, 15))::BIGINT) % {D.MERSENNE_P} AS h
      FROM tok
    ),
    v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM v
    """


def _minhash_simhash_oracle() -> str:
    """minhash pairs + simhash signatures, tagged and unioned onto
    (method, id_a, id_b, jaccard): 'minhash' rows are the verified LSH
    pairs; 'simhash' rows carry the per-doc 64-bit signature in id_b
    (jaccard NULL) — packed because the driver's gate checks the 50
    alphabetically-first entries."""
    return f"""
    SELECT 'minhash' AS method, id_a, id_b, jaccard FROM ({_minhash_oracle()})
    UNION ALL
    SELECT 'simhash' AS method, doc_id AS id_a, simhash AS id_b,
           CAST(NULL AS DOUBLE) AS jaccard
    FROM ({_simhash_oracle()})
    """


@register("dedup_minhash", _minhash_simhash_oracle(), tags=("dedup", "sketch"))
def dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup pairs + SimHash signatures, tagged and unioned
    (round-5 consolidation; both sketch-dedup operators, one documents
    scan each):

    - 'minhash': banded-LSH candidates verified with exact n-gram Jaccard
      (operators/dedup.py::minhash_lsh_pairs) — (id_a, id_b, jaccard);
    - 'simhash': the 64-bit majority-vote token-hash signature per doc
      (operators/dedup.py::simhash) — (doc_id, signature) carried as
      (id_a, id_b) with jaccard NULL.

    Both oracles reproduce the engine's exact md5 hash constructions, so
    the packed entry stays fully value-hash checked."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, rows_per_band=2, threshold=0.5
    ).select(F.lit("minhash").alias("method"), "id_a", "id_b", "jaccard")
    sh = D.simhash(docs, "doc_id", "text").select(
        F.lit("simhash").alias("method"),
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    return pairs.unionByName(sh)


# dedup_simhash is packed into dedup_minhash (round-5 consolidation).
