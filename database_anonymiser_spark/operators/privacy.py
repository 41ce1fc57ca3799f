"""Privacy-risk audit operators: k-anonymity, l-diversity, suppression,
generalization.

The reference is an anonymiser (mask strategies over configured columns,
`src/executor/query-builder.ts`); what it never answers is whether the
OUTPUT is safe to release. These operators close that loop with the two
classic release-audit measures (Sweeney 2002, "k-anonymity: a model for
protecting privacy"; Machanavajjhala et al. 2007, "l-diversity"):

- **k-anonymity**: every combination of quasi-identifier values (the
  columns an attacker can link on — zip, age band, segment) must be
  shared by ≥ k rows. :func:`k_anonymity` grades every equivalence
  class; :func:`k_anonymity_summary` collapses the audit to one row a
  release gate can assert on.
- **l-diversity**: a k-anonymous class is still unsafe when everyone in
  it shares the sensitive value (the homogeneity attack) —
  :func:`l_diversity` demands ≥ l DISTINCT sensitive values per class.
- **t-closeness** (round 11; Li, Li & Venkatasubramanian 2007): even a
  diverse class leaks when its sensitive DISTRIBUTION deviates from the
  table's — the skewness attack distinct-l misses (all k rows share a
  RARE value: diverse enough, still disclosing). :func:`t_closeness`
  bounds each class's distance from the global distribution — the
  variational distance for categorical attributes (the paper's equal
  ground-distance EMD), exact-integer tested so the verdict never hangs
  on float association order.
- **entropy / recursive (c,l) l-diversity** (round 11; Machanavajjhala
  2007 §4): :func:`l_diversity_entropy` demands -Σp·ln p ≥ ln(l) (skew
  within the class counts, not just distinctness);
  :func:`l_diversity_recursive` demands r₁ < c·(r_l + … + r_m) over the
  class's sorted value counts (the most frequent value must not dominate
  the tail) — integer-exact.
- **Enforcement**: :func:`suppress_to_k` drops rows of violating classes
  (suppression — the standard minimum-distortion fix);
  :func:`generalize_num` coarsens a numeric column to fixed-width bands;
  :func:`generalize_cat` (round 11) coarsens a categorical column up a
  caller-supplied HIERARCHY (value → parent dict, the DGH ladder of
  Sweeney's original scheme) — both trade precision for bigger classes;
  re-audit after.
- **DP release counts** (round 11; Dwork et al. 2006):
  :func:`dp_noisy_counts` publishes group counts under ε-differential
  privacy — Laplace(1/ε) noise per count (counting queries have
  sensitivity 1), seeded for reproducible releases.

Scale shape: each audit is ONE partial-aggregated groupBy over the quasi
columns (map-side combine; the class table is |classes|-sized, not
|rows|-sized). Enforcement joins the class verdicts back on the quasi
columns — null-safe (NULL quasi values form their own class, exactly SQL
GROUP BY semantics), shuffle-on-quasi with AQE free to broadcast the
class side when it is small. No windows, no collects, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quasi(quasi_cols) -> list[str]:
    cols = list(quasi_cols)
    if not cols:
        raise ValueError("quasi_cols must name at least one column")
    return cols


def k_anonymity(df: DataFrame, quasi_cols, k: int) -> DataFrame:
    """Per-equivalence-class audit: one row per distinct quasi-identifier
    combination with its size and whether it violates k. NULL quasi
    values form their own class (GROUP BY semantics — an attacker can
    link on "field is missing" too)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = _quasi(quasi_cols)
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("class_n"))
        .withColumn("violates", F.col("class_n") < k)
    )


def k_anonymity_summary(df: DataFrame, quasi_cols, k: int) -> dict:
    """The release-gate verdict, one driver-sized dict: class counts,
    rows at risk, and the dataset's ACTUAL k (its smallest class)."""
    classes = k_anonymity(df, quasi_cols, k)
    row = classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("violates"), 1).otherwise(0)).alias(
            "n_violating_classes"
        ),
        F.sum(F.when(F.col("violates"), F.col("class_n")).otherwise(0)).alias(
            "rows_at_risk"
        ),
        F.min("class_n").alias("k_actual"),
        F.sum("class_n").alias("n_rows"),
    ).first()
    d = {name: (int(row[name]) if row[name] is not None else 0)
         for name in row.asDict()}
    d["k_required"] = k
    d["satisfied"] = d["n_violating_classes"] == 0
    return d


def l_diversity(
    df: DataFrame, quasi_cols, sensitive_col: str, l_required: int
) -> DataFrame:
    """Per-class distinct-sensitive-value audit (distinct l-diversity):
    a class where everyone shares the sensitive value leaks it even at
    high k. NULL sensitive values do not count toward diversity
    (count(DISTINCT) SQL semantics — "unknown" is not a disclosure)."""
    if l_required < 1:
        raise ValueError("l_required must be >= 1")
    cols = _quasi(quasi_cols)
    if sensitive_col in cols:
        raise ValueError("sensitive_col cannot also be a quasi-identifier")
    return (
        df.groupBy(*cols)
        .agg(
            F.count(F.lit(1)).alias("class_n"),
            F.countDistinct(sensitive_col).alias("distinct_sensitive"),
        )
        .withColumn("violates", F.col("distinct_sensitive") < l_required)
    )


def t_closeness(
    df: DataFrame, quasi_cols, sensitive_col: str, t: float
) -> DataFrame:
    """Per-class t-closeness audit for a CATEGORICAL sensitive attribute
    (Li et al. 2007): the distance between the class's sensitive
    distribution P and the table-wide distribution Q must be ≤ t. With
    equal ground distances the paper's EMD is the variational distance
    ½·Σ|p_v − q_v| (values absent from the class contribute q_v).

    Exactness: the distance is a ratio of INTEGERS — ½·Σ|c_v·N − g_v·n|
    / (n·N) with c_v the class count, g_v the global count, n the class
    size, N the table size — so ``t_num`` (the integer numerator
    Σ|c_v·N − g_v·n| + Σ_absent g_v·n) is emitted alongside the float
    ``t_distance`` and the violation test compares integers against
    2·t·n·N: no float-association drift, cross-engine checkable.

    Scale shape: one groupBy(quasi, sensitive) count, one |values|-sized
    global aggregate broadcast onto it, one groupBy(quasi) reduce — the
    class-value table is |classes × values-present|-sized, never
    |rows|-sized. NULL sensitive values are excluded from both
    distributions (consistent with :func:`l_diversity`)."""
    if not 0 < t <= 1:
        raise ValueError("t must be in (0, 1]")
    cols = _quasi(quasi_cols)
    if sensitive_col in cols:
        raise ValueError("sensitive_col cannot also be a quasi-identifier")
    base = df.where(F.col(sensitive_col).isNotNull())
    glob = base.groupBy(sensitive_col).agg(F.count(F.lit(1)).alias("_g"))
    cv = base.groupBy(*cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    joined = cv.join(F.broadcast(glob), sensitive_col)
    # per class: n = Σc_v, present-value Σ|c_v·N − g_v·n| and Σg_v; the
    # absent-value tail is (N − Σ_present g_v)·n. N rides as a literal
    # from one 1-row aggregate (driver-sized, like MERGE's bounds read).
    n_total = base.count()
    per = joined.groupBy(*cols).agg(
        F.sum("_c").alias("class_n"),
        F.sum("_g").alias("_g_present"),
        # |c_v·N − g_v·n| needs n, unknown until this reduce — carry the
        # pairs through a second pass instead: aggregate the value list
        F.collect_list(F.struct("_c", "_g")).alias("_pairs"),
    )
    pair_term = F.aggregate(
        "_pairs",
        F.lit(0).cast("long"),
        lambda acc, p: acc + F.abs(
            p["_c"] * F.lit(n_total) - p["_g"] * F.col("class_n")
        ),
    )
    absent_term = (F.lit(n_total) - F.col("_g_present")) * F.col("class_n")
    return (
        per.withColumn("t_num", (pair_term + absent_term).cast("long"))
        .withColumn(
            "t_distance",
            F.col("t_num")
            / (F.lit(2.0) * F.col("class_n") * F.lit(float(n_total))),
        )
        .withColumn(
            "violates",
            F.col("t_num").cast("double")
            > F.lit(2.0 * t * n_total) * F.col("class_n"),
        )
        .drop("_pairs", "_g_present")
    )


def t_closeness_ordered(
    df: DataFrame, quasi_cols, sensitive_col: str, t: float
) -> DataFrame:
    """t-closeness for an ORDERED (numeric) sensitive attribute — the
    paper's second distance (Li et al. 2007 §3, "ordered distance"): EMD
    over the value ordering, D = (1/(m−1))·Σᵢ|Σ_{j≤i}(p_j − q_j)| with
    the m global distinct values sorted. Unlike the categorical
    variational distance, adjacency matters: a class of THREE ADJACENT
    low incomes is farther from a uniform global than three scattered
    ones (0.375 vs 0.167 in the paper's example — pinned by test).

    Exactness: with p_j = c_j/n and q_j = g_j/N the numerator
    Σᵢ|CumCᵢ·N − CumGᵢ·n| is an INTEGER; ``t_num`` is emitted alongside
    the float ``t_distance`` (= t_num / ((m−1)·n·N)) and the violation
    compares integers against t·(m−1)·n·N.

    Scale shape: the per-class cumulative needs every class × every
    global value (absent values carry 0 mass but nonzero cumulative) —
    a |classes| × |values| grid, bounded by the sensitive DOMAIN (small
    by definition for a release-audited attribute: diagnoses, income
    bands), never by rows: one groupBy(quasi, sensitive), one broadcast
    of the |values| global histogram, one window cumsum per class over
    its |values| rows."""
    if not 0 < t <= 1:
        raise ValueError("t must be in (0, 1]")
    from pyspark.sql import Window

    cols = _quasi(quasi_cols)
    if sensitive_col in cols:
        raise ValueError("sensitive_col cannot also be a quasi-identifier")
    base = df.where(F.col(sensitive_col).isNotNull())
    n_total = base.count()
    glob = base.groupBy(sensitive_col).agg(F.count(F.lit(1)).alias("_g"))
    m = glob.count()
    cv = base.groupBy(*cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    classes = cv.groupBy(*cols).agg(F.sum("_c").alias("class_n"))
    if m <= 1:
        # a single-value domain: every distribution IS the global one
        return (
            classes.withColumn("t_num", F.lit(0).cast("long"))
            .withColumn("t_distance", F.lit(0.0))
            .withColumn("violates", F.lit(False))
        )
    # the classes × values grid: absent (class, value) pairs get zero
    # mass; the grid is |classes|·|values| rows — domain-bounded.
    # NULL-SAFE quasi join (round 12, advice): a class whose quasi value
    # is NULL is a real equivalence class (GROUP BY semantics) — plain
    # '=' would never match it to its own cv counts and falsely flag it;
    # eqNullSafe mirrors the SQL oracle's IS NOT DISTINCT FROM.
    cvr = cv.select(
        *[F.col(c).alias(f"_cv_{i}") for i, c in enumerate(cols)],
        F.col(sensitive_col).alias("_cv_s"),
        "_c",
    )
    cond = F.col(sensitive_col) == F.col("_cv_s")  # non-null by filter
    for i, c in enumerate(cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"_cv_{i}"))
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .join(cvr, cond, "left")
        .withColumn("_c", F.coalesce(F.col("_c"), F.lit(0)))
        .drop("_cv_s", *[f"_cv_{i}" for i in range(len(cols))])
    )
    w = Window.partitionBy(*cols).orderBy(sensitive_col)
    cum = grid.select(
        *cols,
        "class_n",
        sensitive_col,
        F.sum("_c").over(w).alias("_cum_c"),
        F.sum("_g").over(w).alias("_cum_g"),
    )
    per = (
        cum.withColumn(
            "_rn",
            F.row_number().over(w),
        )
        .where(F.col("_rn") < m)  # the last cumulative is always 0 diff
        .groupBy(*cols)
        .agg(
            F.first("class_n").alias("class_n"),
            F.sum(
                F.abs(
                    F.col("_cum_c") * F.lit(n_total)
                    - F.col("_cum_g") * F.col("class_n")
                )
            ).alias("t_num"),
        )
    )
    denom = float(max(m - 1, 1)) * float(n_total)
    return (
        per.withColumn(
            "t_distance",
            F.col("t_num") / (F.lit(denom) * F.col("class_n")),
        )
        .withColumn(
            "violates",
            F.col("t_num").cast("double")
            > F.lit(float(t) * denom) * F.col("class_n"),
        )
    )


def l_diversity_entropy(
    df: DataFrame, quasi_cols, sensitive_col: str, l_required: float
) -> DataFrame:
    """Entropy l-diversity (Machanavajjhala 2007 §4.1): each class's
    sensitive-value entropy −Σ p_v·ln p_v must be ≥ ln(l) — unlike
    distinct-l this penalizes SKEW (99 of 100 rows sharing one value has
    100 distinct-diversity... of 2, but entropy ≈ 0.06). One
    groupBy(quasi, sensitive) + one groupBy(quasi); NULL sensitive
    excluded."""
    if l_required < 1:
        raise ValueError("l_required must be >= 1")
    import math

    cols = _quasi(quasi_cols)
    if sensitive_col in cols:
        raise ValueError("sensitive_col cannot also be a quasi-identifier")
    cv = (
        df.where(F.col(sensitive_col).isNotNull())
        .groupBy(*cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per = cv.groupBy(*cols).agg(
        F.sum("_c").alias("class_n"),
        F.sum(F.col("_c") * F.log(F.col("_c"))).alias("_clogc"),
    )
    # −Σ(c/n)·ln(c/n) = ln(n) − (Σ c·ln c)/n — one pass, no p column
    return (
        per.withColumn(
            "entropy",
            F.log(F.col("class_n")) - F.col("_clogc") / F.col("class_n"),
        )
        .withColumn("violates", F.col("entropy") < math.log(l_required))
        .drop("_clogc")
    )


def l_diversity_recursive(
    df: DataFrame, quasi_cols, sensitive_col: str, c: float, l_required: int
) -> DataFrame:
    """Recursive (c, l)-diversity (Machanavajjhala 2007 §4.2): with the
    class's sensitive-value counts sorted r₁ ≥ r₂ ≥ …, require
    r₁ < c·(r_l + r_{l+1} + … + r_m) — the most frequent value must not
    dominate the tail beyond factor c. Integer-exact (counts and the
    tail sum are integers; the c comparison is one multiply). A class
    with fewer than l distinct values violates (empty tail). One
    groupBy(quasi, sensitive) + a per-class sort of its ≤|values| counts
    — array ops over a values-sized list, never a row-level window."""
    if l_required < 1:
        raise ValueError("l_required must be >= 1")
    if c <= 0:
        raise ValueError("c must be positive")
    cols = _quasi(quasi_cols)
    if sensitive_col in cols:
        raise ValueError("sensitive_col cannot also be a quasi-identifier")
    cv = (
        df.where(F.col(sensitive_col).isNotNull())
        .groupBy(*cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per = cv.groupBy(*cols).agg(
        F.sum("_c").alias("class_n"),
        F.reverse(F.array_sort(F.collect_list("_c"))).alias("_desc"),
    )
    tail = F.aggregate(
        F.slice(
            F.col("_desc"),
            l_required,
            F.greatest(
                F.size("_desc") - F.lit(l_required - 1), F.lit(0)
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        per.withColumn("r1", F.col("_desc")[0])
        .withColumn("tail_sum", tail)
        .withColumn(
            "violates",
            F.col("r1").cast("double") >= F.lit(float(c)) * F.col("tail_sum"),
        )
        .drop("_desc")
    )


def suppress_to_k(df: DataFrame, quasi_cols, k: int) -> DataFrame:
    """ENFORCE k-anonymity by suppression: drop every row whose
    equivalence class is smaller than k. The surviving frame is
    k-anonymous on ``quasi_cols`` by construction (re-auditable with
    :func:`k_anonymity`). Null-safe join: NULL-quasi rows suppress or
    survive as one class, never leak through the join."""
    cols = _quasi(quasi_cols)
    keep = (
        k_anonymity(df, cols, k)
        .where(~F.col("violates"))
        .select(*cols)
    )
    cond = None
    for c in cols:
        eq = df[c].eqNullSafe(keep[c])
        cond = eq if cond is None else cond & eq
    return df.join(keep, cond, "left_semi")


def generalize_num(col, width: float):
    """Fixed-width numeric generalization: the band's lower bound
    (floor(x / width) · width) — the classic coarsening that ENLARGES
    equivalence classes so suppression destroys fewer rows. A column
    expression (pure map-side); NULL stays NULL."""
    if width <= 0:
        raise ValueError("width must be positive")
    c = col if not isinstance(col, str) else F.col(col)
    return F.floor(c / F.lit(width)) * F.lit(width)


def generalize_cat(col, hierarchy: dict, default=None):
    """Hierarchy-driven categorical generalization (round 11 — the DGH
    ladder of Sweeney's k-anonymity scheme): map each value one level UP
    its caller-supplied taxonomy (``{'BUILDING': 'CONSUMER', ...}``).
    Values absent from the hierarchy take ``default`` (a literal; None =
    keep the original value — partial hierarchies generalize what they
    know). A pure map-side column expression (one literal MAP lookup, no
    join, no Python); NULL stays NULL. Apply repeatedly with the next
    level's dict to climb the ladder; re-audit after each step."""
    if not hierarchy:
        raise ValueError("hierarchy must map at least one value")
    c = col if not isinstance(col, str) else F.col(col)
    m = F.create_map(
        *[F.lit(x) for kv in hierarchy.items() for x in kv]
    )
    fallback = F.lit(default) if default is not None else c
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.coalesce(m[c], fallback)
    )


def anonymize_to_k(
    df: DataFrame,
    quasi_spec: dict,
    k: int,
    max_suppress_frac: float = 0.05,
) -> tuple[DataFrame, list[dict]]:
    """Datafly-style k-anonymization (Sweeney 1998/2002's greedy
    algorithm): GENERALIZE quasi-identifiers step by step until at most
    ``max_suppress_frac`` of the rows sit in sub-k classes, then
    SUPPRESS the remainder — the output is k-anonymous by construction.

    ``quasi_spec`` maps each quasi column to its generalization LADDER:
    a list of steps, each either a positive number (numeric band width
    for :func:`generalize_num` — widths should grow up the ladder) or a
    dict (hierarchy for :func:`generalize_cat`); an empty list pins the
    column (linkable but not generalizable). Each round greedily
    generalizes the column with the MOST DISTINCT VALUES among those
    with ladder steps left (Sweeney's heuristic), exactly one step.

    Returns ``(anonymized_df, steps)`` where ``steps`` records the audit
    trail (column, step index, distinct counts, rows then at risk) — the
    release report a compliance review wants next to the data.

    Scale shape per round: one distinct-count aggregate over the quasi
    columns + one k-audit groupBy — both |classes|-sized; the
    generalizations themselves are map-side column expressions layered
    on the SAME frame (no intermediate materialization). The loop is
    driver-side and bounded by the total ladder length (Σ|steps| ≤ a
    handful), never by the data."""
    if not 0 <= max_suppress_frac <= 1:
        raise ValueError("max_suppress_frac must be in [0, 1]")
    cols = _quasi(list(quasi_spec))
    for c, ladder in quasi_spec.items():
        for s in ladder:
            if not isinstance(s, dict) and (
                not isinstance(s, (int, float)) or s <= 0
            ):
                raise ValueError(
                    f"ladder step for {c!r} must be a width or a hierarchy dict"
                )
    cur = df
    level = {c: 0 for c in cols}
    steps: list[dict] = []
    n_rows = df.count()
    while True:
        audit = k_anonymity(cur, cols, k)
        at_risk = audit.agg(
            F.sum(F.when(F.col("violates"), F.col("class_n")).otherwise(0))
        ).first()[0] or 0
        if n_rows == 0 or at_risk <= max_suppress_frac * n_rows:
            break
        candidates = [c for c in cols if level[c] < len(quasi_spec[c])]
        if not candidates:
            break  # ladders exhausted: suppression takes the rest
        distinct = cur.agg(
            *[F.countDistinct(c).alias(c) for c in candidates]
        ).first()
        target = max(candidates, key=lambda c: (distinct[c], c))
        step = quasi_spec[target][level[target]]
        if isinstance(step, dict):
            cur = cur.withColumn(target, generalize_cat(target, step))
        else:
            cur = cur.withColumn(
                target, generalize_num(target, float(step))
            )
        level[target] += 1
        steps.append(
            {
                "column": target,
                "step": level[target],
                "distinct_before": int(distinct[target]),
                "rows_at_risk_before": int(at_risk),
            }
        )
    out = suppress_to_k(cur, cols, k)
    return out, steps


#: micro-bucket count for the DP hash-uniform — 5e5 distinct Laplace
#: magnitudes per sign, plenty for a release histogram, and an exactly
#: representable rational so Spark and an ANSI oracle compute the SAME
#: double before the (deterministic) log
_DP_MICRO = 1_000_000


def _dp_uniform(group_cols, seed: int, salt: str) -> F.Column:
    """Deterministic uniform in (0, 1) that is a PURE FUNCTION of
    (group key, seed) — the repo's determinism idiom (md5 → hex → conv,
    cf. ``operators/sampling.py``), never ``F.rand`` and never
    ``spark_partition_id``: the same release re-run under any
    partitioning, DOP, or engine yields the same noise (round-12 advice:
    ``F.rand(seed)`` is only per-partition-deterministic). NULL key
    components hash as a sentinel distinct from the empty string."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in group_cols
    ]
    h = F.md5(F.concat_ws("\x1f", F.lit(f"{salt}:{seed}"), *parts))
    k = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % F.lit(_DP_MICRO)
    return (k.cast("double") + F.lit(0.5)) / F.lit(float(_DP_MICRO))


def _laplace(u: F.Column, b: float) -> F.Column:
    """Laplace(b) noise by inverse CDF from a uniform in (0, 1):
    −b·sgn(u−½)·ln(1−2|u−½|). The micro-bucketed u keeps the argument
    ≥ 1/MICRO, so the log is always finite."""
    c = u - F.lit(0.5)
    return (
        -F.lit(float(b))
        * F.signum(c)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    )


def dp_noisy_counts(
    df: DataFrame, group_cols, epsilon: float, seed: int = 0
) -> DataFrame:
    """ε-differentially-private group counts (Dwork et al. 2006): the
    release-safe histogram — each group's count plus Laplace(1/ε) noise
    (counting queries have sensitivity 1; disjoint groups share the
    budget, so the whole histogram is ε-DP). Noise derives by inverse
    CDF from a uniform that is a PURE FUNCTION of (group key, seed) —
    md5-hash-based, never ``F.rand`` — so a release is bit-reproducible
    under its recorded seed across partitionings, DOP, and engines
    (auditable; the ``privacy_dp`` suite entry reproduces it in ANSI
    SQL), while remaining DP against anyone without the seed. Emits
    ``noisy_n`` rounded and clamped at 0 (standard post-processing,
    DP-safe). One groupBy; map-side noise; no Python.

    Caveat the caller owns (documented, as in every practical DP
    release): groups whose EXISTENCE is sensitive need a stability-based
    variant (thresholded release); this publishes the counts of the
    groups it is given."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    cols = _quasi(group_cols)
    out = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("true_n"))
    lap = _laplace(_dp_uniform(cols, seed, "dpcount-v1"), 1.0 / float(epsilon))
    return out.withColumn(
        "noisy_n",
        F.greatest(
            F.round(F.col("true_n") + lap).cast("long"), F.lit(0)
        ),
    )


def dp_noisy_sums(
    df: DataFrame,
    group_cols,
    value_col: str,
    lo: float,
    hi: float,
    epsilon: float,
    seed: int = 0,
) -> DataFrame:
    """ε-differentially-private group SUMS with contribution clipping
    (the other half of a DP release next to counts): each row's value is
    clipped into [lo, hi] before summing, bounding any ONE row's
    influence, then Laplace((hi−lo)/ε) noise is added per group (the
    replace-one-neighbor sensitivity of a clipped sum; disjoint groups,
    shared budget). Noise is the same seeded-hash construction as
    :func:`dp_noisy_counts` — a pure function of (group, seed), DOP- and
    engine-invariant. Emits ``clipped_sum`` (the exact pre-noise sum —
    for the auditor holding the seed) and ``noisy_sum``. NULL values
    contribute nothing (sum semantics). One groupBy, map-side clip +
    noise, no Python."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    cols = _quasi(group_cols)
    if value_col in cols:
        raise ValueError("value_col cannot also be a group column")
    clipped = F.least(
        F.greatest(F.col(value_col), F.lit(lo)), F.lit(hi)
    )
    out = df.groupBy(*cols).agg(F.sum(clipped).alias("clipped_sum"))
    lap = _laplace(
        _dp_uniform(cols, seed, "dpsum-v1"), (float(hi) - float(lo)) / float(epsilon)
    )
    return out.withColumn("noisy_sum", F.col("clipped_sum") + lap)
