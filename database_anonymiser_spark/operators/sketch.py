"""Deterministic sketches — engine-reproducible counterparts of the
probabilistic aggregates.

Spark's production sketches (HLL++ via ``approx_count_distinct``, the GK
quantile sketch via ``approx_percentile``) are the right 100 TB answers —
one pass, bounded memory per group — but their values are engine-internal:
no independent SQL engine reproduces them, so a declared query using them
can never be value-hash checked (they stay pinned by error-bound tests,
tests/test_suite_ops.py). The KMV (k-minimum-values) sketch here is the
deterministic member of the same family: built purely from the engine's
md5→60-bit-int machinery (the exact construction the dedup/split/sampling
operators already oracle-check), its estimate is a pure function of the
data — bit-identical in any engine.

Bar-Yossef et al., "Counting distinct elements in a data stream" (RANDOM
2002): with hashes uniform on [0, M), the k-th smallest distinct hash h(k)
estimates the distinct count as (k-1)·M / h(k); relative error ~ 1/√k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash space: first 15 md5 hex chars = 60 bits, uniform on [0, 2^60)
KMV_HASH_SPACE = float(2**60)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``key_col`` — deterministic
    and ANSI-SQL-reproducible (value-hash checked in the declared
    ``agg_approx_sketch`` entry).

    Estimator: md5-hash every key to a 60-bit int (uniform), keep each
    group's k-th smallest DISTINCT hash, estimate (k-1)·2⁶⁰ / h(k); a group
    with fewer than k distinct keys reports its exact count (the standard
    small-cardinality exactness of KMV). (k-1)·2⁶⁰ is a float64 LITERAL
    (exactly representable: ≤ 8 significant bits × 2⁶⁰) and the one
    division rounds identically under IEEE in any engine; the estimate is
    rounded to 6dp.

    Scale shape: one shuffle for the (group, hash) distinct (partial
    map-side dedup first), one for the per-group window. The window sorts
    each group's DISTINCT hashes — the price of exact sketch determinism;
    at 100 TB with few groups, production distinct-counting stays HLL
    (``approx_count_distinct``, error-bound-pinned in tests) and this is
    the auditable twin, same as the expression/Arrow twin pairs elsewhere.
    With ``group_cols=()`` the sketch is global and the window is a
    single-task sort over ALL distinct hashes (works, tested — but at
    scale pre-filter with a hash threshold, e.g. ``hv < t·2⁶⁰`` for a
    t chosen from a coarse count, so only candidate minima reach the
    sort; the grouped form is the declared, partitioned path).

    Returns one row per group: (*group_cols, kmv_distinct_est double,
    exact_distinct long).
    """
    gcols = [F.col(c) for c in group_cols]
    hv = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    d = df.select(*gcols, hv.alias("hv")).distinct()
    win = Window.partitionBy(*[F.col(c) for c in group_cols])
    r = d.withColumn("rn", F.row_number().over(win.orderBy("hv"))).withColumn(
        "nd", F.count(F.lit(1)).over(win)
    )
    # try_divide: an all-zero md5 prefix (p ≈ 2⁻⁶⁰ per key) must degrade to
    # NULL, not raise under ANSI mode; DuckDB's /0 is NULL already
    est = F.when(F.col("nd") < k, F.col("nd").cast("double")).otherwise(
        F.round(F.try_divide(F.lit(float((k - 1) * 2**60)), F.col("hv")), 6)
    )
    return r.where(F.col("rn") == F.least(F.lit(k), F.col("nd"))).select(
        *group_cols,
        est.alias("kmv_distinct_est"),
        F.col("nd").alias("exact_distinct"),
    )
