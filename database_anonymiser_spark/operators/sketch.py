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


#: Count-Min defaults: depth 4 × width 1024 → ε ≈ e/w ≈ 0.27% of the
#: stream length per estimate at δ ≈ e^-4
CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_positions(key, depth: int, width: int) -> list:
    """Counter positions of ``key`` for each of the ``depth`` rows: one
    md5 → 60-bit v, Kirsch-Mitzenmacher (h1 + r·h2) % width — the bloom
    filter's exact derivation (operators/bloom.py), so one md5+conv per
    row of input regardless of depth, and any engine with md5 replays it."""
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("cm:"), key.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    h1 = v % F.lit(1 << 30)
    h2 = F.shiftright(v, 30) * F.lit(2) + F.lit(1)
    return [(h1 + F.lit(r) * h2) % F.lit(width) for r in range(depth)]


def count_min_freq(
    df: DataFrame,
    key_col: str,
    probe_keys: list,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Count-Min frequency estimates (Cormode & Muthukrishnan 2005 —
    public knowledge) for ``probe_keys``, next to their exact counts:
    (key string, cm_est long, exact long). The sketch NEVER underestimates
    (est ≥ exact, the one-sided CM guarantee — collisions only add), and
    est ≤ exact + ε·N with probability 1 − δ; both pinned in tests, and
    the whole construction — hash family, counter build, min-of-rows
    probe — is deterministic md5+BIGINT, value-hash checked in the
    declared ``agg_approx_sketch`` 'cm' branch.

    Scale shape: the sketch is one groupBy over (depth × width) BOUNDED
    cells — partial map-side combine collapses each partition to ≤ d·w
    rows before the shuffle, so sketch cost is independent of stream
    length (the entire point at 100 TB: frequency estimates for any key
    from d·w BIGINTs). Probes broadcast-join the tiny cell table; exact
    counts come from one filtered aggregate over just the probed keys."""
    keyed = df.where(F.col(key_col).isNotNull())
    pos = _cm_positions(F.col(key_col), depth, width)
    cells = (
        keyed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(r).alias("r"), pos[r].alias("pos"))
                        for r in range(depth)
                    ]
                )
            ).alias("_c")
        )
        .groupBy(F.col("_c.r").alias("r"), F.col("_c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    probes = spark.createDataFrame([(str(k),) for k in probe_keys], "key string")
    ppos = probes.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), p.alias("pos"))
                    for r, p in enumerate(_cm_positions(F.col("key"), depth, width))
                ]
            )
        ).alias("_c"),
    ).select("key", F.col("_c.r").alias("r"), F.col("_c.pos").alias("pos"))
    est = (
        ppos.join(F.broadcast(cells), ["r", "pos"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_est"))
    )
    exact = (
        keyed.where(F.col(key_col).cast("string").isin([str(k) for k in probe_keys]))
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return est.join(exact, "key", "left").select(
        "key", "cm_est", F.coalesce(F.col("exact"), F.lit(0)).alias("exact")
    )


def hash_sample_quantile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.95),
    k: int = 512,
    round_dp: int = 4,
) -> DataFrame:
    """Deterministic sample-quantile sketch: exact interpolated percentiles
    over the k rows with the SMALLEST md5 key hash — a uniform row sample
    that is a pure function of the data (retry/engine/partitioning
    stable), completing the sketch family's quantile member next to KMV
    (distinct count) and Count-Min (frequency). Sample-quantile error is
    the standard O(1/√k) rank deviation, pinned with slack in tests; the
    PRODUCTION path at 100 TB remains ``approx_percentile`` (GK), whose
    engine-internal values only error-bound tests can check.

    Output: one row per prob — (prob double, q_est double, q_exact
    double); ``q_exact`` is the full-data percentile for the accuracy
    twin. The sample selection reuses the KMV global path's bucketed
    pre-filter (bucket by hv, per-bucket top-k in parallel, bounded final
    rank) so no task ever sorts more than ~buckets·k rows however large
    the input; interpolation parity between Spark ``percentile`` and
    DuckDB ``quantile_cont`` is the agg_orders_stats precedent."""
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("q:"), F.col(key_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    keyed = df.where(F.col(key_col).isNotNull()).select(
        hv.alias("hv"), F.col(key_col).alias("_k"), F.col(value_col).alias("_v")
    )
    num_buckets = 64
    # key tiebreak: a 60-bit hash collision between distinct keys would
    # otherwise make the rank-k boundary engine-dependent
    w_bucket = Window.partitionBy(F.pmod(F.col("hv"), F.lit(num_buckets)))
    cand = keyed.withColumn(
        "_rn1", F.row_number().over(w_bucket.orderBy("hv", "_k"))
    ).where(F.col("_rn1") <= k)
    sample = cand.withColumn(
        "_rn", F.row_number().over(Window.orderBy("hv", "_k"))
    ).where(F.col("_rn") <= k)
    agg_sample = [
        F.round(F.expr(f"percentile(_v, {p})"), round_dp).alias(f"_s{i}")
        for i, p in enumerate(probs)
    ]
    agg_exact = [
        F.round(F.expr(f"percentile({value_col}, {p})"), round_dp).alias(f"_e{i}")
        for i, p in enumerate(probs)
    ]
    s = sample.agg(*agg_sample)
    e = df.where(F.col(key_col).isNotNull()).agg(*agg_exact)
    wide = s.crossJoin(e)
    rows = [
        wide.select(
            F.lit(float(p)).alias("prob"),
            F.col(f"_s{i}").alias("q_est"),
            F.col(f"_e{i}").alias("q_exact"),
        )
        for i, p in enumerate(probs)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


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

    NULL keys are excluded before hashing (``count(DISTINCT x)`` semantics:
    NULL is not a value). Without the filter, md5(NULL)=NULL would survive
    the distinct, inflate nd by one, and — because Spark windows sort NULLS
    FIRST while DuckDB defaults to NULLS LAST — shift the k-th-smallest
    hash differently in the two engines, breaking value-hash parity.

    Scale shape: one shuffle for the (group, hash) distinct (partial
    map-side dedup first), one for the per-group window. The window sorts
    each group's DISTINCT hashes — the price of exact sketch determinism;
    at 100 TB with few groups, production distinct-counting stays HLL
    (``approx_count_distinct``, error-bound-pinned in tests) and this is
    the auditable twin, same as the expression/Arrow twin pairs elsewhere.

    With ``group_cols=()`` the sketch is global; a naive global window
    would single-task-sort ALL distinct hashes. Instead the global path
    runs a two-level candidate pre-filter: hashes are bucketed by
    ``hv % num_buckets``, each bucket keeps its k smallest in a PARALLEL
    per-bucket window, and only those ≤ num_buckets·k survivors reach the
    final global sort — a bounded single task regardless of cardinality.
    This is exact (the true k smallest hashes each rank ≤ k inside their
    own bucket, so the filter can never drop them; when nd < k every hash
    survives because no bucket exceeds k rows) and estimate-free, so it
    needs no coarse-count threshold and no fallback: the result is
    bit-identical to the unfiltered construction by construction.

    Returns one row per group: (*group_cols, kmv_distinct_est double,
    exact_distinct long).
    """
    hv = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    keyed = df.where(F.col(key_col).isNotNull())
    # try_divide: an all-zero md5 prefix (p ≈ 2⁻⁶⁰ per key) must degrade to
    # NULL, not raise under ANSI mode; DuckDB's /0 is NULL already
    def _est(nd, hv_col):
        return F.when(nd < k, nd.cast("double")).otherwise(
            F.round(F.try_divide(F.lit(float((k - 1) * 2**60)), hv_col), 6)
        )

    if group_cols:
        gcols = [F.col(c) for c in group_cols]
        d = keyed.select(*gcols, hv.alias("hv")).distinct()
        win = Window.partitionBy(*[F.col(c) for c in group_cols])
        r = d.withColumn("rn", F.row_number().over(win.orderBy("hv"))).withColumn(
            "nd", F.count(F.lit(1)).over(win)
        )
        return r.where(F.col("rn") == F.least(F.lit(k), F.col("nd"))).select(
            *group_cols,
            _est(F.col("nd"), F.col("hv")).alias("kmv_distinct_est"),
            F.col("nd").alias("exact_distinct"),
        )

    # Global path: bucket → per-bucket top-k (parallel) → bounded final sort.
    d = keyed.select(hv.alias("hv")).distinct()
    num_buckets = 64
    b = d.withColumn("_b", F.pmod(F.col("hv"), F.lit(num_buckets)))
    w_bucket = Window.partitionBy("_b")
    cand = (
        b.withColumn("_rn1", F.row_number().over(w_bucket.orderBy("hv")))
        .withColumn("_bcnt", F.count(F.lit(1)).over(w_bucket))
        .where(F.col("_rn1") <= k)
    )
    # nd = sum of each distinct bucket's full count, recovered from the
    # candidates themselves (the rank-1 row of every non-empty bucket is a
    # candidate) — no second scan of the distinct frame.
    w_all = Window.orderBy("hv").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = cand.withColumn(
        "nd", F.sum(F.when(F.col("_rn1") == 1, F.col("_bcnt"))).over(w_all)
    ).withColumn("rn", F.row_number().over(Window.orderBy("hv")))
    return r.where(F.col("rn") == F.least(F.lit(k), F.col("nd"))).select(
        _est(F.col("nd"), F.col("hv")).alias("kmv_distinct_est"),
        F.col("nd").alias("exact_distinct"),
    )


def _bottom_k_hashes(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """The side's KMV sketch: bottom-k distinct 60-bit md5 hashes of
    ``key_col`` (NULLs excluded), via the same bucketed pre-filter as the
    global :func:`kmv_distinct` path so no single task ever sorts more
    than 64·k candidate rows. Returns a frame of ≤k ``hv`` rows."""
    hv = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    d = df.where(F.col(key_col).isNotNull()).select(hv.alias("hv")).distinct()
    num_buckets = 64
    b = d.withColumn("_b", F.pmod(F.col("hv"), F.lit(num_buckets)))
    cand = b.withColumn(
        "_rn1", F.row_number().over(Window.partitionBy("_b").orderBy("hv"))
    ).where(F.col("_rn1") <= k)
    return (
        cand.withColumn("rn", F.row_number().over(Window.orderBy("hv")))
        .where(F.col("rn") <= k)
        .select("hv")
    )


def kmv_set_ops(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    k: int = 256,
    audit: bool = False,
) -> DataFrame:
    """Set-operation estimates over two KMV sketches — the Theta-sketch
    capability (Dasgupta et al., "Theta sketches", and the KMV
    mergeability of Beyer et al. 2007 — public knowledge): estimate
    |A ∪ B|, |A ∩ B| and Jaccard from two bottom-k hash sets WITHOUT
    rescanning either input, the way warehouse sketch columns answer
    cross-table overlap questions.

    Construction (deterministic, ANSI-SQL-replayable — both keys hash
    through the same unprefixed md5 as :func:`kmv_distinct`, so equal
    keys collide across sides by design):

    - UNION: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) —
      the classic KMV merge; estimate (k-1)·2⁶⁰/θ with θ the merged
      k-th smallest (exact count when the merged set has < k hashes,
      which implies BOTH sides were exact).
    - INTERSECTION: ρ = |{h ∈ K_A ∩ K_B : h ≤ θ}| of the θ-truncated
      sketches; Jaccard ≈ ρ/k′ (k′ = min(k, merged size)); |A ∩ B| ≈
      Jaccard · |A ∪ B|-estimate. Error ~1/√k on the Jaccard.

    Returns three rows (op, est[, exact]): op ∈ union/intersect/jaccard.
    ``audit=True`` adds the EXACT values alongside — two full DISTINCT
    aggregates over the raw inputs, the cost a production call at scale
    must never pay (round-7 verdict #4): the default emits only the
    sketch estimates, whose math touches ≤2k merged hash rows after each
    side's bucketed pre-filter (plan-asserted DISTINCT-free in
    tests/test_plans.py). The declared ``agg_approx_sketch`` oracle entry
    runs ``audit=True`` so DuckDB checks est AND exact together.
    """
    ka = _bottom_k_hashes(df_a, key_a, k)
    kb = _bottom_k_hashes(df_b, key_b, k)
    m = ka.unionByName(kb).distinct()
    mr = m.withColumn("rn", F.row_number().over(Window.orderBy("hv"))).withColumn(
        "nm",
        F.count(F.lit(1)).over(
            Window.orderBy("hv").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    theta = mr.where(F.col("rn") == F.least(F.lit(k), F.col("nm"))).select(
        F.col("hv").alias("th"), F.col("nm")
    )
    rho = (
        ka.join(kb, "hv")
        .crossJoin(F.broadcast(theta))
        .where(F.col("hv") <= F.col("th"))
        .agg(F.count(F.lit(1)).alias("rho"))
    )
    if audit:
        a_key = F.col(key_a)
        b_key = F.col(key_b)
        exact_a = df_a.where(a_key.isNotNull()).select(a_key.alias("x")).distinct()
        exact_b = df_b.where(b_key.isNotNull()).select(b_key.alias("x")).distinct()
        exact_u = exact_a.unionByName(exact_b).distinct().count()
        exact_i = exact_a.join(exact_b, "x", "left_semi").count()

    stats = F.broadcast(theta).crossJoin(F.broadcast(rho))
    union_est = F.when(F.col("nm") < k, F.col("nm").cast("double")).otherwise(
        F.round(F.try_divide(F.lit(float((k - 1) * 2**60)), F.col("th")), 6)
    )
    kprime = F.least(F.lit(k), F.col("nm")).cast("double")
    jac = F.col("rho").cast("double") / kprime
    out = stats.select(
        union_est.alias("_u"),
        F.round(jac, 6).alias("_j"),
        (F.col("rho").cast("double") / kprime).alias("_jraw"),
    ).select(
        "_u",
        "_j",
        F.round(F.col("_jraw") * F.col("_u"), 6).alias("_i"),
    )
    if not audit:
        return out.select(
            F.explode(
                F.array(
                    F.struct(F.lit("union").alias("op"), F.col("_u").alias("est")),
                    F.struct(F.lit("intersect").alias("op"), F.col("_i").alias("est")),
                    F.struct(F.lit("jaccard").alias("op"), F.col("_j").alias("est")),
                )
            ).alias("s")
        ).select("s.op", "s.est")
    exact_j = round(exact_i / exact_u, 6) if exact_u else 0.0
    return out.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("union").alias("op"),
                    F.col("_u").alias("est"),
                    F.lit(float(exact_u)).alias("exact"),
                ),
                F.struct(
                    F.lit("intersect").alias("op"),
                    F.col("_i").alias("est"),
                    F.lit(float(exact_i)).alias("exact"),
                ),
                F.struct(
                    F.lit("jaccard").alias("op"),
                    F.col("_j").alias("est"),
                    F.lit(float(exact_j)).alias("exact"),
                ),
            )
        ).alias("s")
    ).select("s.op", "s.est", "s.exact")
