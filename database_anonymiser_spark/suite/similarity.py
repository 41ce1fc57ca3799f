"""Declared similarity-search queries over ``embeddings`` (SURVEY.md §2 ext).

The oracles rebuild the exact-decimal dot products with unnest+subscripts —
scores are bit-identical to the Spark zip_with/aggregate construction (see
operators/similarity.py for the determinism argument).
"""

from __future__ import annotations

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
    )
    SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
    FROM dots, qn
    WHERE vec_id != {_QUERY_VEC_ID}
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity",),
)
def sim_topk_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, "vec_id", "embedding", query_id=_QUERY_VEC_ID, k=10)


@register(
    "sim_cosine_pairs",
    f"""
    WITH {_UNNEST_CTE},
    n AS (
      SELECT vec_id,
             CAST(sum(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS nsq
      FROM v GROUP BY vec_id
    ),
    d AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(sum(CAST(a.x AS DECIMAL(18,6)) * CAST(b.x AS DECIMAL(18,6))) AS DOUBLE) AS dot
      FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT id_a, id_b, round(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) AS cosine
      FROM d JOIN n na ON d.id_a = na.vec_id JOIN n nb ON d.id_b = nb.vec_id
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.5
    """,
    tags=("similarity", "dedup"),
)
def sim_cosine_pairs(spark, sf_dir):
    # embedding-cosine near-duplicate detection (the 5th dedup family)
    emb = load(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs(emb, "vec_id", "embedding", threshold=0.5)


@register("sim_topk_lsh", None, tags=("similarity", "approx"))
def sim_topk_lsh(spark, sf_dir):
    """Hyperplane-LSH bucketed top-k (approximate → rows-only oracle; recall
    vs brute force is pinned in tests/test_suite_ops.py)."""
    emb = load(spark, sf_dir, "embeddings")
    return SIM.lsh_bucket_topk(emb, "vec_id", "embedding", query_id=_QUERY_VEC_ID, k=10)


@register("sim_topk_ivf", None, tags=("similarity", "approx"))
def sim_topk_ivf(spark, sf_dir):
    """IVF-style probed-list ANN (approximate → rows-only oracle; recall vs
    brute force is pinned in tests/test_suite_ops.py)."""
    emb = load(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(emb, "vec_id", "embedding", query_id=_QUERY_VEC_ID, k=10)
