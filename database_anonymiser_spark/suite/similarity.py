"""Declared similarity-search queries over ``embeddings`` (SURVEY.md §2 ext).

The oracles rebuild the exact-decimal dot products with unnest+subscripts —
scores are bit-identical to the Spark zip_with/aggregate construction (see
operators/similarity.py for the determinism argument).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark.operators import similarity as SIM
from database_anonymiser_spark.suite.base import load, register

_QUERY_VEC_ID = 0

# x is widened float→DOUBLE before any decimal cast: DuckDB's FLOAT→DECIMAL
# rounds the float's shortest decimal repr, while Spark (and DuckDB's
# DOUBLE→DECIMAL) round the exact binary value — going through DOUBLE makes
# both engines bit-identical.
_UNNEST_CTE = """
v AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
"""


@register(
    "sim_topk_bruteforce",
    f"""
    WITH {_UNNEST_CTE},
    q AS (SELECT x AS qx, i FROM v WHERE vec_id = {_QUERY_VEC_ID}),
    dots AS (
      SELECT v.vec_id,
             CAST(sum(CAST(v.x AS DECIMAL(18,6)) * CAST(q.qx AS DECIMAL(18,6))) AS DOUBLE) AS dot,
             CAST(sum(CAST(v.x AS DECIMAL(18,6)) * CAST(v.x AS DECIMAL(18,6))) AS DOUBLE) AS na
      FROM v JOIN q USING (i)
      GROUP BY v.vec_id
    ),
    qn AS (
      SELECT CAST(sum(CAST(qx AS DECIMAL(18,6)) * CAST(qx AS DECIMAL(18,6))) AS DOUBLE) AS nb
      FROM q
    ),
    exact AS (
      SELECT 'exact' AS method, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
      FROM dots, qn
      WHERE vec_id != {_QUERY_VEC_ID}
      ORDER BY cosine DESC, vec_id
      LIMIT 10
    ),
    mi AS (
      SELECT vec_id, i, CAST(CAST(x AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS a
      FROM v
    ),
    am AS (SELECT vec_id, max(abs(a)) AS amax FROM mi GROUP BY vec_id),
    qv AS (
      SELECT vec_id, i,
             CASE WHEN amax = 0 THEN 0
                  WHEN a < 0 THEN -CAST(floor((2 * 127 * (-a) + amax) / (2.0 * amax)) AS BIGINT)
                  ELSE CAST(floor((2 * 127 * a + amax) / (2.0 * amax)) AS BIGINT)
             END AS qa
      FROM mi JOIN am USING (vec_id)
    ),
    qq AS (SELECT i, qa AS qb FROM qv WHERE vec_id = {_QUERY_VEC_ID}),
    qdots AS (
      SELECT v.vec_id,
             sum(v.qa * q.qb) AS dot,
             sum(v.qa * v.qa) AS na
      FROM qv v JOIN qq q USING (i)
      GROUP BY v.vec_id
    ),
    qqn AS (SELECT sum(qb * qb) AS nb FROM qq),
    int8 AS (
      -- zero-norm guard mirrors quantized_cosine/int8_topk: an all-zero
      -- vector scores NULL and ranks LAST (both engines' desc default) —
      -- explicit here because DuckDB's double 0/0 happens to be NULL too
      SELECT 'int8' AS method, vec_id,
             CASE WHEN na = 0 OR nb = 0 THEN NULL
                  ELSE round(dot / (sqrt(na) * sqrt(nb)), 6) END AS cosine
      FROM qdots, qqn
      WHERE vec_id != {_QUERY_VEC_ID}
      ORDER BY cosine DESC, vec_id
      LIMIT 10
    )
    SELECT * FROM exact UNION ALL SELECT * FROM int8
    """,
    tags=("similarity",),
)
def sim_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-k plus the int8 compressed-domain top-k (round 3),
    tagged and unioned: the 'int8' branch quantizes every vector to
    array<tinyint> (4× smaller; exact integer construction in
    operators/similarity.py::quantize_embeddings) and scores with pure-
    BIGINT dots — the oracle reproduces the quantization AND the integer
    scoring, so the whole compressed path is value-hash checked."""
    emb = load(spark, sf_dir, "embeddings")
    exact = SIM.brute_force_topk(
        emb, "vec_id", "embedding", query_id=_QUERY_VEC_ID, k=10
    ).select(F.lit("exact").alias("method"), "vec_id", "cosine")
    int8 = SIM.int8_topk(
        emb, "vec_id", "embedding", query_id=_QUERY_VEC_ID, k=10
    ).select(F.lit("int8").alias("method"), "vec_id", "cosine")
    return exact.unionByName(int8)


def _cosine_lsh_pair_ctes(threshold: float = 0.5, n_planes: int = 16, rows_per_band: int = 4, dim: int = 64) -> str:
    """Reproduce cosine_lsh_pairs' full construction in ANSI SQL: the
    integer-quantized hyperplane sign bits, the banding, the candidate join,
    and the exact-decimal cosine verification — so even the LSH blocking is
    value-hash checked (the same precedent as the dedup_minhash oracle).
    Returns the CTE chain (starting with ``WITH``, ending with ``scored`` =
    the thresholded pairs) so both sim_cosine_pairs and the dedup_semantic
    closure build on the identical pair set."""
    planes = SIM.int_planes(dim, n_planes)
    dots = ",\n             ".join(
        f"sum(CAST(x AS DECIMAL(18,6)) * ({planes[p]})[i]) AS d{p}"
        for p in range(n_planes)
    )
    sig_bits = ", ".join(
        f"CASE WHEN d{p} > 0 THEN 1 ELSE 0 END AS sb{p}" for p in range(n_planes)
    )
    bands = " UNION ALL ".join(
        f"SELECT vec_id, {b0} AS band_id, "
        + " || '_' || ".join(
            f"sb{i}::VARCHAR" for i in range(b0, min(b0 + rows_per_band, n_planes))
        )
        + " AS band_key FROM sig"
        for b0 in range(0, n_planes, rows_per_band)
    )
    return f"""
    WITH {_UNNEST_CTE},
    dots AS (
      SELECT vec_id,
             {dots}
      FROM v GROUP BY vec_id
    ),
    sig AS (SELECT vec_id, {sig_bits} FROM dots),
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
      FROM bands l
      JOIN bands r ON l.band_id = r.band_id AND l.band_key = r.band_key
                  AND l.vec_id < r.vec_id
    ),
    nsq AS (
      SELECT vec_id,
             CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS nsq
      FROM v GROUP BY vec_id
    ),
    pd AS (
      SELECT c.id_a, c.id_b,
             CAST(sum(CAST(a.x AS DECIMAL(18,6)) * CAST(b.x AS DECIMAL(18,6))) AS DOUBLE) AS dot
      FROM cand c
      JOIN v a ON a.vec_id = c.id_a
      JOIN v b ON b.vec_id = c.id_b AND b.i = a.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT id_a, id_b, round(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) AS cosine
      FROM pd JOIN nsq na ON pd.id_a = na.vec_id JOIN nsq nb ON pd.id_b = nb.vec_id
      WHERE round(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) >= {threshold}
    )"""


#: spherical-k-means shape for the packed 'assign' branch (round 9):
#: small K and unrolled iterations keep the oracle SQL compact; the
#: operator default (16 clusters, 5 iters) is the same code path.
_KM_CLUSTERS = 4
_KM_ITER = 2


def _kmeans_ctes(n_clusters: int = _KM_CLUSTERS, n_iter: int = _KM_ITER) -> str:
    """Replay train_spherical_kmeans + the final assignment in ANSI SQL —
    the full exact-integer Lloyd loop, unrolled: micro-int vectors (the
    same decimal(18,6) cast as every other oracle), init = the K
    lowest-id vectors unit-normalized to micro-ints, per-iteration exact
    BIGINT argmax-dot assignment (ties → lower cid via row_number), exact
    HUGEINT component sums, re-unitization with the IDENTICAL float op
    sequence as operators/similarity.py::_unit_micro (one int→double
    conversion, one IEEE divide, one half-away rounding — bit-equal cross
    engine), and empty/zero-sum clusters carrying the previous centroid.
    Builds on the ``v`` unnest CTE; ends with ``kaf`` = (vec_id, cid,
    dot) of the final assignment."""

    def norm(a, S):
        val = (
            f"(CAST(CAST({a} AS HUGEINT) * 1000000 AS DOUBLE)"
            f" / sqrt(CAST({S} AS DOUBLE)))"
        )
        return (
            f"CASE WHEN {S} = 0 THEN CAST({a} AS BIGINT) ELSE "
            f"CAST(floor(abs({val}) + 0.5) AS BIGINT)"
            f" * (CASE WHEN {val} >= 0 THEN 1 ELSE -1 END) END"
        )

    parts = [
        f"""
    kmi AS (
      SELECT vec_id, i, CAST(CAST(x AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS a
      FROM v
    ),
    kinit AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_clusters})
    ),
    kr0 AS (SELECT s.cid, m.i, m.a FROM kinit s JOIN kmi m USING (vec_id)),
    kc0 AS (
      SELECT r.cid, r.i, {norm('r.a', 't.S')} AS c
      FROM kr0 r JOIN (
        SELECT cid, sum(CAST(a AS HUGEINT) * a) AS S FROM kr0 GROUP BY cid
      ) t USING (cid)
    )"""
    ]
    prev = "kc0"
    for t in range(1, n_iter + 1):
        parts.append(
            f""",
    kd{t} AS (
      SELECT m.vec_id, c.cid, sum(m.a * c.c) AS dot
      FROM kmi m JOIN {prev} c USING (i) GROUP BY 1, 2
    ),
    ka{t} AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
        FROM kd{t}
      ) WHERE rn = 1
    ),
    ks{t} AS (
      SELECT a.cid, m.i, sum(CAST(m.a AS HUGEINT)) AS s
      FROM ka{t} a JOIN kmi m USING (vec_id) GROUP BY 1, 2
    ),
    kn{t} AS (
      SELECT t.cid, t.i, {norm('t.s', 'u.S')} AS c
      FROM ks{t} t JOIN (
        SELECT cid, sum(s * s) AS S FROM ks{t} GROUP BY cid
      ) u USING (cid)
      WHERE u.S <> 0
    ),
    kc{t} AS (
      SELECT p.cid, p.i, coalesce(n.c, p.c) AS c
      FROM {prev} p LEFT JOIN kn{t} n ON n.cid = p.cid AND n.i = p.i
    )"""
        )
        prev = f"kc{t}"
    parts.append(
        f""",
    kdf AS (
      SELECT m.vec_id, c.cid, sum(m.a * c.c) AS dot
      FROM kmi m JOIN {prev} c USING (i) GROUP BY 1, 2
    ),
    kaf AS (
      SELECT vec_id, cid, dot FROM (
        SELECT vec_id, cid, dot,
               row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
        FROM kdf
      ) WHERE rn = 1
    )"""
    )
    return "".join(parts)


def _cosine_lsh_oracle(threshold: float = 0.5, n_planes: int = 16, rows_per_band: int = 4, dim: int = 64) -> str:
    """Pairs + SemDeDup closure, tagged and unioned: 'pair' rows are the
    thresholded LSH pairs; 'cluster' rows close them with a recursive CTE
    into the per-vector (cluster id, survivor) verdict — the same
    closure-check precedent as dedup_jaccard's 'cluster' variant. Packed
    into ONE entry because the driver's gate checks the 50 alphabetically-
    first queries()."""
    ctes = _cosine_lsh_pair_ctes(threshold, n_planes, rows_per_band, dim).replace(
        "WITH ", "WITH RECURSIVE ", 1
    )
    return f"""
    {ctes},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM scored
      UNION ALL
      SELECT id_b, id_a FROM scored
    ),
    reach(id, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ),
    lab AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
    {_kmeans_ctes()}
    SELECT 'pair' AS variant, id_a, id_b, cosine FROM scored
    UNION ALL
    SELECT 'cluster' AS variant, e.vec_id AS id_a,
           coalesce(lab.cluster_id, e.vec_id) AS id_b,
           CASE WHEN coalesce(lab.cluster_id, e.vec_id) = e.vec_id
                THEN 1.0 ELSE 0.0 END AS cosine
    FROM embeddings e LEFT JOIN lab ON lab.id = e.vec_id
    UNION ALL
    SELECT 'assign' AS variant, vec_id AS id_a, CAST(cid AS BIGINT) AS id_b,
           round(CAST(dot AS DOUBLE) / 1000000000000.0, 6) AS cosine
    FROM kaf
    """


@register("sim_cosine_pairs", _cosine_lsh_oracle(), tags=("similarity", "dedup", "graph"))
def sim_cosine_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate detection (the 5th dedup family) PLUS
    its SemDeDup-style closure (the 6th — semantic duplicates n-gram
    operators cannot see), tagged and unioned:

    - 'pair': hyperplane-LSH blocked cosine pairs — map-side signatures →
      banded candidate join → exact-cosine verify. No CartesianProduct in
      the plan (plan-asserted); recall vs brute force pinned in
      tests/test_suite_ops.py.
    - 'cluster': operators/similarity.py::semantic_dedup (Abbas et al.
      2023 shape) — the pairs' transitive closure via distributed
      min-label propagation, one row per vector: (id_a = vec_id, id_b =
      cluster id, cosine = 1.0 when the vector is its cluster's canonical
      survivor). The oracle rebuilds the identical pair set (shared CTE
      generator) and closes it with a recursive CTE, so the composed LSH
      blocking + exact-decimal verify + distributed closure + survivor
      assembly is value-hash checked end to end.

    - 'assign' (round 9): operators/similarity.py::semantic_clusters —
      the SemDeDup/Sorscher cluster-partitioning stage — as (vec_id,
      cluster id, winning dot/1e12): the EXACT-INTEGER spherical k-means
      (_KM_CLUSTERS=4 clusters, _KM_ITER=2 unrolled Lloyd iterations at
      the declared shape) whose full training loop + assignment the
      oracle replays CTE-for-CTE (round-8 verdict #3 — the one §2.13
      operator pair that was pytest-only).

    Declared at the scale-shaped parameterization (16 planes, 4-bit bands →
    16 buckets per band); the log₂(n) band-width scaling law is asserted in
    tests/test_suite_ops.py::test_lsh_candidates_scale_subquadratically."""
    emb = load(spark, sf_dir, "embeddings")
    # one LSH pass feeds BOTH variants: the pair set is checkpointed (the
    # closure's own first materialization, same as dedup_jaccard's CC) and
    # the 'pair' branch re-emits it instead of re-running the bucket scoring
    raw = SIM.cosine_lsh_pairs(
        emb, "vec_id", "embedding", threshold=0.5, n_planes=16, rows_per_band=4
    ).localCheckpoint(eager=True)
    pairs = raw.select(F.lit("pair").alias("variant"), "id_a", "id_b", "cosine")
    sem = SIM.semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.5, pairs=raw
    ).select(
        F.lit("cluster").alias("variant"),
        F.col("vec_id").alias("id_a"),
        F.col("cluster_id").alias("id_b"),
        F.col("kept").cast("double").alias("cosine"),
    )
    assigned = SIM.semantic_clusters(
        emb, "vec_id", "embedding",
        n_clusters=_KM_CLUSTERS, n_iter=_KM_ITER, with_dot=True,
    ).select(
        F.lit("assign").alias("variant"),
        F.col("vec_id").alias("id_a"),
        F.col("cluster_id").cast("long").alias("id_b"),
        F.round(F.col("cluster_dot").cast("double") / F.lit(1e12), 6).alias(
            "cosine"
        ),
    )
    return pairs.unionByName(sem).unionByName(assigned)


#: query ids for the packed bulk-kNN branch of sim_topk_ann
_KNN_QUERY_IDS = (0, 7, 42)

#: metadata predicate for the packed filtered-search branch
_FILTER_LABEL = 3

#: product-quantization shape for the packed 'pq' branch: 8 subspaces of
#: 8 dims, 16 codewords each — 64 float32 → 8 small ints per vector
_PQ_M_SUB = 8
_PQ_K_SUB = 16

#: ADC shortlist size for the pq branch's exact re-rank stage (round 8:
#: 25x k, the measured 0.8-recall point on the bench fixture)
_PQ_REFINE_K = 250


def _ann_oracle(
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 6,
    n_flip: int = 1,
    refine_k: int = _PQ_REFINE_K,
) -> str:
    """Reproduce all THREE nearest-neighbour paths in ANSI SQL.
    "Approximate" means recall < 1 vs brute force — the plan each path
    actually runs is fully deterministic, so the oracle rebuilds it
    end-to-end: the LSH signature (int-quantized planes → exact-decimal
    sign bits → bucket) with the multi-probe XOR expansion (≤ ``n_flip``
    flipped bits), the IVF codebook (lowest-id vectors → exact-decimal
    argmax assignment → probed lists), and — round 4 — the bulk kNN-join
    (exact per-query top-k over the whole corpus for a small query block),
    all re-ranked with the exact-decimal cosine and explicit (cosine DESC,
    vec_id ASC) top-k tie-breaks."""
    from itertools import combinations

    masks = [0] + [
        sum(1 << b for b in bits)
        for f in range(1, n_flip + 1)
        for bits in combinations(range(n_planes), f)
    ]
    planes = SIM.int_planes(dim, n_planes)
    sig_dots = ",\n             ".join(
        f"sum(CAST(x AS DECIMAL(18,6)) * ({planes[p]})[i]) AS d{p}"
        for p in range(n_planes)
    )
    sig_expr = " + ".join(
        f"(CASE WHEN d{p} > 0 THEN {2 ** p} ELSE 0 END)" for p in range(n_planes)
    )
    return f"""
    WITH {_UNNEST_CTE},
    q AS (SELECT x AS qx, i FROM v WHERE vec_id = {_QUERY_VEC_ID}),
    nsq AS (
      SELECT vec_id,
             CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS nsq
      FROM v GROUP BY vec_id
    ),
    qdots AS (
      SELECT v.vec_id,
             CAST(sum(CAST(v.x AS DECIMAL(18,6)) * CAST(q.qx AS DECIMAL(18,6))) AS DOUBLE) AS dot
      FROM v JOIN q USING (i) GROUP BY v.vec_id
    ),
    qn AS (SELECT nsq AS nb FROM nsq WHERE vec_id = {_QUERY_VEC_ID}),
    cos AS (
      SELECT d.vec_id, round(d.dot / (sqrt(n.nsq) * sqrt(qn.nb)), 6) AS cosine
      FROM qdots d JOIN nsq n USING (vec_id) CROSS JOIN qn
      WHERE d.vec_id != {_QUERY_VEC_ID}
    ),
    sdots AS (
      SELECT vec_id,
             {sig_dots}
      FROM v GROUP BY vec_id
    ),
    sig AS (SELECT vec_id, {sig_expr} AS sig FROM sdots),
    qsig AS (
      SELECT xor(sig, u.m) AS psig
      FROM sig CROSS JOIN (SELECT unnest([{", ".join(map(str, masks))}]) AS m) u
      WHERE vec_id = {_QUERY_VEC_ID}
    ),
    lsh AS (
      SELECT 'lsh' AS method, CAST({_QUERY_VEC_ID} AS BIGINT) AS query_id,
             c.vec_id, c.cosine
      FROM cos c JOIN sig s ON s.vec_id = c.vec_id
      WHERE s.sig IN (SELECT psig FROM qsig)
      ORDER BY c.cosine DESC, c.vec_id
      LIMIT {k}
    ),
    cent AS (
      SELECT v.vec_id AS cid, v.x AS cx, v.i
      FROM v
      JOIN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_centroids}) cs
        ON v.vec_id = cs.vec_id
    ),
    ad AS (
      SELECT v.vec_id, c.cid,
             sum(CAST(v.x AS DECIMAL(18,6)) * CAST(c.cx AS DECIMAL(18,6))) AS d
      FROM v JOIN cent c USING (i) GROUP BY v.vec_id, c.cid
    ),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid DESC) AS rn
        FROM ad
      ) t WHERE rn = 1
    ),
    probe AS (
      SELECT cid FROM ad WHERE vec_id = {_QUERY_VEC_ID}
      ORDER BY d DESC, cid ASC LIMIT {n_probe}
    ),
    ivf AS (
      SELECT 'ivf' AS method, CAST({_QUERY_VEC_ID} AS BIGINT) AS query_id,
             c.vec_id, c.cosine
      FROM cos c
      JOIN assigned a ON a.vec_id = c.vec_id
      JOIN probe p ON a.cid = p.cid
      ORDER BY c.cosine DESC, c.vec_id
      LIMIT {k}
    ),
    kq AS (
      SELECT vec_id AS qid, x AS qx, i FROM v
      WHERE vec_id IN ({", ".join(map(str, _KNN_QUERY_IDS))})
    ),
    kdots AS (
      SELECT q.qid, v.vec_id,
             CAST(sum(CAST(v.x AS DECIMAL(18,6)) * CAST(q.qx AS DECIMAL(18,6))) AS DOUBLE) AS dot
      FROM v JOIN kq q USING (i)
      GROUP BY q.qid, v.vec_id
    ),
    kcos AS (
      SELECT d.qid, d.vec_id,
             round(d.dot / (sqrt(n.nsq) * sqrt(qn2.nsq)), 6) AS cosine
      FROM kdots d
      JOIN nsq n ON n.vec_id = d.vec_id
      JOIN nsq qn2 ON qn2.vec_id = d.qid
      WHERE d.vec_id != d.qid
    ),
    knn AS (
      SELECT 'knn' AS method, qid AS query_id, vec_id, cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
        FROM kcos
      ) t WHERE rn <= {k}
    ),
    mi AS (
      SELECT vec_id, i, CAST(CAST(x AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS a
      FROM v
    ),
    am AS (SELECT vec_id, max(abs(a)) AS amax FROM mi GROUP BY vec_id),
    sqv AS (
      SELECT vec_id, i,
             CASE WHEN amax = 0 THEN 0
                  WHEN a < 0 THEN -CAST(floor((2 * 127 * (-a) + amax) / (2.0 * amax)) AS BIGINT)
                  ELSE CAST(floor((2 * 127 * a + amax) / (2.0 * amax)) AS BIGINT)
             END AS qa
      FROM mi JOIN am USING (vec_id)
    ),
    sqq AS (SELECT i, qa AS qb FROM sqv WHERE vec_id = {_QUERY_VEC_ID}),
    sqmem AS (
      SELECT s.vec_id, s.i, s.qa
      FROM sqv s
      JOIN assigned a ON a.vec_id = s.vec_id
      JOIN probe p ON a.cid = p.cid
      WHERE s.vec_id != {_QUERY_VEC_ID}
    ),
    sqd AS (
      SELECT m.vec_id, sum(m.qa * q.qb) AS dot, sum(m.qa * m.qa) AS na
      FROM sqmem m JOIN sqq q USING (i) GROUP BY m.vec_id
    ),
    sqn AS (SELECT sum(qb * qb) AS nb FROM sqq),
    ivf_sq AS (
      SELECT 'ivf_sq' AS method, CAST({_QUERY_VEC_ID} AS BIGINT) AS query_id, vec_id,
             CASE WHEN na = 0 OR nb = 0 THEN NULL
                  ELSE round(dot / (sqrt(na) * sqrt(nb)), 6) END AS cosine
      FROM sqd, sqn
      ORDER BY cosine DESC, vec_id
      LIMIT {k}
    ),
    filtered AS (
      SELECT 'filtered' AS method, CAST({_QUERY_VEC_ID} AS BIGINT) AS query_id,
             c.vec_id, c.cosine
      FROM cos c JOIN embeddings e ON e.vec_id = c.vec_id
      WHERE e.label = {_FILTER_LABEL}
      ORDER BY c.cosine DESC, c.vec_id
      LIMIT {k}
    ),
    cbv AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_PQ_K_SUB}),
    cb AS (
      SELECT dense_rank() OVER (ORDER BY m.vec_id) - 1 AS code, m.i, m.a
      FROM mi m JOIN cbv ON m.vec_id = cbv.vec_id
    ),
    pqd AS (
      SELECT m.vec_id, (m.i - 1) // {dim // _PQ_M_SUB} AS sub, c.code,
             sum((m.a - c.a) * (m.a - c.a)) AS d2
      FROM mi m JOIN cb c ON c.i = m.i
      GROUP BY 1, 2, 3
    ),
    pqc AS (
      SELECT vec_id, sub, code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                     ORDER BY d2 ASC, code ASC) AS rn
        FROM pqd) t WHERE rn = 1
    ),
    pqq AS (SELECT i, a AS qa FROM mi WHERE vec_id = {_QUERY_VEC_ID}),
    pql AS (
      SELECT (c.i - 1) // {dim // _PQ_M_SUB} AS sub, c.code,
             sum(c.a * q.qa) AS dp, sum(c.a * c.a) AS n2
      FROM cb c JOIN pqq q USING (i) GROUP BY 1, 2
    ),
    pqs AS (
      SELECT kk.vec_id, sum(l.dp) AS dot, sum(l.n2) AS na
      FROM pqc kk JOIN pql l ON l.sub = kk.sub AND l.code = kk.code
      GROUP BY 1
    ),
    pqn AS (SELECT sum(qa * qa) AS nb FROM pqq),
    pq_short AS (
      SELECT vec_id,
             CASE WHEN na = 0 OR nb = 0 THEN NULL
                  ELSE round(dot / (sqrt(na) * sqrt(nb)), 6) END AS adc
      FROM pqs, pqn
      WHERE vec_id != {_QUERY_VEC_ID}
      ORDER BY adc DESC, vec_id
      LIMIT {refine_k}
    ),
    pq AS (
      SELECT 'pq' AS method, CAST({_QUERY_VEC_ID} AS BIGINT) AS query_id,
             c.vec_id, c.cosine
      FROM cos c JOIN pq_short s ON s.vec_id = c.vec_id
      ORDER BY c.cosine DESC, c.vec_id
      LIMIT {k}
    )
    SELECT * FROM lsh UNION ALL SELECT * FROM ivf UNION ALL SELECT * FROM knn
    UNION ALL SELECT * FROM ivf_sq UNION ALL SELECT * FROM filtered
    UNION ALL SELECT * FROM pq
    """


@register("sim_topk_ann", _ann_oracle(), tags=("similarity", "approx"))
def sim_topk_ann(spark, sf_dir):
    """All the nearest-neighbour lookup paths, tagged and unioned:
    MULTI-PROBE hyperplane-LSH bucketed top-k (home bucket + every
    1-bit-flip neighbour bucket — Lv et al. VLDB'07; recall vs
    single-probe pinned in tests/test_suite_ops.py), IVF probed-list
    top-k, and — round 4 — the bulk kNN-join
    (operators/similarity.py::knn_join, the kNN-graph construction shape:
    broadcast-closed query block, partition-local BLAS top-k with
    exact-decimal rescore, shuffle independent of corpus size) over a
    3-query block. Every path's plan is deterministic — the oracle
    reproduces the LSH bucketing, the XOR probe expansion, the IVF
    codebook/assignment/probe construction, and the per-query exact top-k
    — so this entry is value-hash checked like every other similarity
    query.

    Round 5 adds the FOURTH branch, 'ivf_sq': the persisted IVF+SQ index
    path (operators/similarity.py::ivf_int8_index → ivf_int8_topk — the
    FAISS IVF+scalar-quantizer composition a real ANN user runs against a
    stored index). The oracle reuses the ivf branch's decimal
    assignment/probe CTEs and the int8 branch's quantization CTEs, adding
    only the compressed-domain integer scoring over the probed lists —
    the composed index-build → probed-query path is now value-hash
    checked end-to-end, not just its two pieces. Round 5 adds the FIFTH
    branch, 'filtered': metadata-filtered vector search (predicate + exact
    top-k — see the inline comment for why brute force is the correct
    baseline and how the 100 TB path partitions the index by the filter
    column). (The index builder's
    coarse argmax is float64 without the decimal near-tie rescore —
    legitimate for an approximate structure; on the fixture the top-2
    assignment dots are separated by ~10 orders of magnitude more than
    float64 error, so the decimal oracle assignment is identical.)"""
    emb = load(spark, sf_dir, "embeddings")
    qid = F.lit(_QUERY_VEC_ID).cast("long")
    lsh = SIM.lsh_bucket_topk(
        emb, "vec_id", "embedding", query_id=_QUERY_VEC_ID, k=10, n_flip=1
    ).select(F.lit("lsh").alias("method"), qid.alias("query_id"), "vec_id", "cosine")
    ivf = SIM.ivf_topk(
        emb, "vec_id", "embedding", query_id=_QUERY_VEC_ID, k=10, n_probe=6
    ).select(
        F.lit("ivf").alias("method"), qid.alias("query_id"), "vec_id", "cosine"
    )
    knn = SIM.knn_join(
        emb,
        emb.where(F.col("vec_id").isin(*_KNN_QUERY_IDS)),
        "vec_id",
        "embedding",
        k=10,
    ).select(
        F.lit("knn").alias("method"),
        "query_id",
        F.col("neighbour_id").alias("vec_id"),
        "cosine",
    )
    # training-free codebook (the 16 lowest-id vectors — what the oracle's
    # cent CTE reproduces); 16 rows is the one legitimate collect, it IS
    # the coarse-quantizer model
    cent_rows = (
        emb.orderBy("vec_id").limit(16).select("vec_id", "embedding").collect()
    )
    centroids = [(int(r[0]), [float(x) for x in r[1]]) for r in cent_rows]
    index = SIM.ivf_int8_index(emb, "vec_id", "embedding", centroids)
    ivf_sq = SIM.ivf_int8_topk(
        index, emb, "vec_id", "embedding", query_id=_QUERY_VEC_ID,
        centroids=centroids, k=10, n_probe=6,
    ).select(
        F.lit("ivf_sq").alias("method"), qid.alias("query_id"), "vec_id", "cosine"
    )
    # FIFTH branch (round 5) — metadata-FILTERED vector search, the hybrid
    # predicate + top-k lookup every real vector store serves: restrict the
    # corpus to label = _FILTER_LABEL (the predicate pushes to the parquet
    # scan; the query vector rides along so the 1-row broadcast still
    # resolves), exact partition-local top-k on what remains. Brute force
    # is the CORRECT baseline here: post-filtering an ANN result
    # under-fills k when probe lists mix labels, so filtered search
    # degrades to exact scan-and-score unless the index is partitioned by
    # the filter column. That indexed path EXISTS as of round 8 —
    # VersionedAnnIndex.rebuild(meta_cols=("label",)) clusters index
    # files by label and query(where={"label": v}) file-prunes to the
    # band, int8-scores it and exact-re-ranks (pytest pins it equal to
    # this brute-force branch under refine). The DECLARED branch stays on
    # brute force because its equality with the indexed path holds only
    # while refine_k covers the label band — true at oracle scale,
    # deliberately not promised at every scale.
    flt = SIM.brute_force_topk(
        emb.where(
            (F.col("label") == _FILTER_LABEL) | (F.col("vec_id") == _QUERY_VEC_ID)
        ),
        "vec_id",
        "embedding",
        query_id=_QUERY_VEC_ID,
        k=10,
    ).select(F.lit("filtered").alias("method"), qid.alias("query_id"), "vec_id", "cosine")
    # SIXTH branch (round 5) — product quantization with ADC scoring
    # (operators/similarity.py::pq_index/pq_topk, Jégou et al. 2011): 8
    # subspaces × 16 codewords, all arithmetic in exact micro-int space, so
    # the codebook construction, the per-subspace argmin assignment, the
    # dot/norm² lookup tables and the final round-6 cosine are each
    # replayed verbatim by the oracle's BIGINT CTEs. Round 8 adds the
    # TWO-STAGE retrieval (Jégou §V): the ADC pass over-fetches a
    # _PQ_REFINE_K shortlist, re-ranked by the exact-decimal cosine (the
    # oracle's pq_short → cos join) — raw ADC recall@10 was 0.167 on the
    # bench fixture, the refined default is 0.8 (BENCH ann_recall; floors
    # in tests/test_suite_ops.py).
    books = SIM.pq_codebooks(emb, "vec_id", "embedding", m_sub=_PQ_M_SUB, k_sub=_PQ_K_SUB)
    pq = SIM.pq_topk(
        SIM.pq_index(emb, "vec_id", "embedding", books),
        emb,
        "vec_id",
        "embedding",
        query_id=_QUERY_VEC_ID,
        books=books,
        k=10,
        refine_k=_PQ_REFINE_K,
    ).select(F.lit("pq").alias("method"), qid.alias("query_id"), "vec_id", "cosine")
    return (
        lsh.unionByName(ivf)
        .unionByName(knn)
        .unionByName(ivf_sq)
        .unionByName(flt)
        .unionByName(pq)
    )
