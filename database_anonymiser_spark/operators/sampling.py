"""Deterministic sampling / mixture construction for training corpora.

The reference has no sampling operators (SURVEY.md §2 — training-pipeline
extension). A training-data build needs to hit a TARGET MIXTURE over
sources/domains: downsample the over-represented ones, repeat ("epoch")
the scarce high-quality ones. Doing that with ``rand()`` or
``TABLESAMPLE`` is wrong at scale — resampled on every retry, stage
re-execution, or engine change. Everything here derives from md5 of the
ROW KEY, so the decision for a given row is a pure function of
(salt, id): stable across runs, partitionings, engines (reproducible in
ANSI SQL — the declared ``sample_scan`` entry hash-checks it), and
map-side (zero shuffle, the sample IS the scan filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def _bucket(id_col: str, salt: str) -> F.Column:
    """Uniform micro-bucket in [0, 1e6) from md5(salt || id) — the same
    hex→decimal conv construction as the dedup fingerprints, so any
    engine with md5 reproduces it."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % _MICRO
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed on ``id_col``.

    A map-side filter — at 100 TB the sample costs one scan with the
    predicate pushed down; no seed state, no shuffle, retry-stable.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(_bucket(id_col, salt) < int(round(fraction * _MICRO)))


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Per-group sampling rates in one pass — the data-mixing operator.

    ``rates[g]`` is the expected copies per row of group ``g``: 0.25
    downsamples to a quarter, 1.0 passes through, 2.5 UPSAMPLES — every
    row appears twice plus a deterministic half gets a third copy.
    Groups absent from ``rates`` use ``default_rate``. Output adds
    ``copy_idx`` (0-based repeat index) so downstream shuffling/packing
    can salt per copy instead of seeing byte-identical rows.

    Row count per group is rate·n ± the binomial-free hash error (no
    randomness — the SAME rows are chosen every run). The rate lookup is
    a literal map (``create_map``), the copy fan-out is
    ``posexplode(array_repeat(...))`` — all map-side, zero shuffle, zero
    Python; the whole operator rides the scan at any scale.
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("rates must be >= 0")
    micro = {g: int(round(r * _MICRO)) for g, r in rates.items()}
    pairs = [x for g, m in micro.items() for x in (F.lit(g), F.lit(m))]
    rate_map = F.create_map(*pairs) if pairs else F.create_map()
    microrate = F.coalesce(
        rate_map[F.col(group_col)], F.lit(int(round(default_rate * _MICRO)))
    )
    copies = (
        F.floor(microrate / _MICRO)
        + F.when(_bucket(id_col, salt) < microrate % _MICRO, 1).otherwise(0)
    ).cast("int")
    return (
        df.withColumn("_copies", copies)
        .select(
            *df.columns,
            F.posexplode(F.array_repeat(F.lit(1), F.col("_copies"))).alias(
                "copy_idx", "_one"
            ),
        )
        .drop("_one")
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    target_total: int,
    alpha: float = 0.5,
    salt: str = "temp-mix-v1",
) -> DataFrame:
    """TEMPERATURE-SCALED mixture sampling — the multilingual/multi-source
    rebalancing recipe of GPT-3 / XLM-R / Llama: sample sources with
    probability ∝ n_s^α (α < 1 flattens the size distribution so head
    sources stop dominating while tail sources upsample), targeting
    ``target_total`` output rows overall. α = 1 is proportional
    (no-op mixing), α = 0 is uniform-per-source.

    Derivation (all on the driver, from one K-sized count aggregate):
    integer weights w_s = floor(n_s^α · 1e6), S = Σ w_s (exact integer
    sum — no float-order dependence), per-source micro-rate
    micro_s = (target_total · w_s · 1e6) // (S · n_s) — exact integer
    arithmetic end to end, so the selection is reproducible by ANY
    engine with md5 (the declared-suite oracle reproduces it; α = 0.5
    routes through ``math.sqrt``, IEEE-correctly-rounded in every
    engine, rather than libm ``pow`` whose last ulp is not portable).
    Rates may exceed 1 for scarce sources — :func:`mixture_sample`'s
    expected-copies upsampling applies, with ``copy_idx`` marking
    repeats. Scale shape: the count aggregate is the only job before
    the map-side literal-map filter; nothing else shuffles.
    """
    import math

    if target_total <= 0:
        raise ValueError("target_total must be positive")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return mixture_sample(df, id_col, source_col, {}, 0.0, salt=salt)
    weights = {}
    for s, n in counts.items():
        w = (math.sqrt(n) if alpha == 0.5 else float(n) ** alpha) * _MICRO
        if not math.isfinite(w):
            raise ValueError(
                f"weight n^alpha overflows for source {s!r} "
                f"(n={n}, alpha={alpha}); lower alpha"
            )
        weights[s] = math.floor(w)
    total_w = sum(weights.values())
    rates = {
        s: ((target_total * weights[s] * _MICRO) // (total_w * n)) / _MICRO
        for s, n in counts.items()
    }
    # a NULL source is its own group: literal maps cannot key on NULL,
    # so its rate rides the default (NULL lookups coalesce to it)
    null_rate = rates.pop(None, 0.0)
    return mixture_sample(df, id_col, source_col, rates, null_rate, salt=salt)


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    cluster_col: str,
    budget_per_cluster: int,
    upsample: bool = False,
    salt: str = "cluster-balance-v1",
) -> DataFrame:
    """Flatten a skewed cluster-size distribution toward
    ``budget_per_cluster`` rows per cluster — the rebalancing stage that
    follows :func:`~database_anonymiser_spark.operators.similarity.semantic_clusters`
    (cluster-based pruning keeps coverage of RARE topics instead of
    letting head topics dominate the token budget; Sorscher et al. 2022,
    arXiv:2206.14486 §5 prunes per-cluster for exactly this reason).

    Per-cluster rate = budget / n_c, capped at 1.0 unless ``upsample``
    (then scarce clusters REPEAT — :func:`mixture_sample`'s expected-copies
    semantics, with ``copy_idx`` distinguishing repeats for downstream
    shuffle salting). Output size per cluster is rate·n_c ± hash error,
    i.e. ≈ budget for over-represented clusters and exactly n_c (or
    ≈ budget with upsampling) for scarce ones. Deterministic: the same
    rows survive every run, partitioning, and engine.

    Scale shape: one partial-aggregated groupBy collects K (cluster,
    count) pairs to the driver — K is the number of clusters, the same
    model-sized bounded collect as the codebook itself — then the whole
    sample is :func:`mixture_sample`'s map-side literal-map filter riding
    the scan. Zero shuffles beyond the count aggregate.
    """
    if budget_per_cluster <= 0:
        raise ValueError("budget_per_cluster must be > 0")
    counts = df.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("_n")).collect()
    rates: dict = {}
    for r in counts:
        rate = budget_per_cluster / r["_n"]
        rates[r[cluster_col]] = rate if upsample else min(1.0, rate)
    return mixture_sample(
        df, id_col, cluster_col, rates, default_rate=0.0, salt=salt
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n_per_group: int,
    salt: str = "strat-v1",
    oversample: int = 8,
) -> DataFrame:
    """Exact-size deterministic stratified sample: the ``n_per_group`` rows
    with the SMALLEST md5 bucket (ties broken by id) per stratum — the
    fixed-quota counterpart to :func:`mixture_sample`'s rates (eval-set
    construction, per-domain probes, balanced fine-tuning slices). Pure
    function of (salt, id): retry-stable and engine-reproducible (the
    declared 'stratified' branch of ``sample_scan`` hash-checks it).

    Scale shape: the naive form is one window per group — but a window
    sort puts each ENTIRE stratum in one task, a single-task bottleneck
    for a 10-TB stratum. So, exactly like the KMV global pre-filter
    (operators/sketch.py), a tiny per-group count aggregate picks a hash
    threshold keeping ~``oversample``·n rows per group, broadcast back as
    a MAP-SIDE prefilter before the window. The survivor set under
    ``h < thr`` is a downward-closed prefix of the (h, id) order, so the
    top-n among survivors equals the global top-n whenever survivors ≥ n;
    groups where the binomial tail ever undershoots (astronomically
    unlikely at 8×, but checked, not assumed) fall back to their full
    rows for the window. Both aggregates touch only (group, count) pairs.
    """
    if n_per_group <= 0:
        raise ValueError("n_per_group must be > 0")
    from pyspark.sql.window import Window

    h = _bucket(id_col, salt)
    target = n_per_group * oversample
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gn"))
    thr = (
        F.when(F.col("_gn") <= target, F.lit(_MICRO))
        .otherwise(F.ceil(F.lit(float(_MICRO) * target) / F.col("_gn")).cast("long"))
        .alias("_thr")
    )
    # thr = _MICRO for small groups, so h < _thr keeps them whole
    pre = df.join(F.broadcast(counts.select(group_col, thr, "_gn")), group_col).where(
        h < F.col("_thr")
    )
    # safety: a group whose prefilter survivors dipped below n (possible
    # only in the far binomial tail) must use its FULL rows — determinism
    # over micro-efficiency. Survivor counts come from COUNTS left-joined
    # to pre's groupBy (coalesced to 0): deriving them from `pre` alone
    # would make a ZERO-survivor stratum vanish from the shortfall set and
    # silently drop the whole stratum (round-5 advice; P ≈ e^-(oversample·n)
    # per large stratum — small, not astronomical, at n_per_group=1).
    surv = pre.groupBy(group_col).agg(F.count(F.lit(1)).alias("_sn"))
    short = (
        counts.join(surv, group_col, "left")
        .select(
            group_col,
            F.coalesce(F.col("_sn"), F.lit(0)).alias("_sn"),
            F.col("_gn"),
        )
        .where((F.col("_sn") < n_per_group) & (F.col("_sn") < F.col("_gn")))
        .select(group_col)
    )
    fallback = df.join(F.broadcast(short), group_col, "left_semi")
    kept = pre.select(*df.columns).join(
        F.broadcast(short), group_col, "left_anti"
    ).unionByName(fallback)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        kept.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_group)
        .select(*df.columns)  # restore input column order (join moved the key)
    )


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    group_col: str,
    budgets: dict[str, int],
    default_budget: int | None = None,
    salt: str = "budget-v1",
) -> DataFrame:
    """Deterministic TOKEN-budget mixture — the form real pretraining
    mixtures are specified in (tokens per source, not documents per
    source): per group, admit documents in md5-hash order until the
    group's token budget is met. The admitting order is a pure function of
    (salt, id) — unbiased, retry-stable, engine-reproducible — and the doc
    that CROSSES the budget is kept (budgets are "at least", so one long
    document cannot starve its group). Groups absent from ``budgets`` get
    ``default_budget``; with ``default_budget=None`` they pass through
    uncapped.

    Shape: one window per group (cumulative token sum in hash order, ROWS
    frame over a unique ordering) — a single shuffle on ``group_col``;
    admitted rows keep all input columns. Value-hash checked as the
    'budget' branch of the declared ``sample_scan`` entry.

    Determinism of the ROWS-frame cumulative sum requires a UNIQUE window
    ordering. Ids are unique in a raw corpus, but :func:`mixture_sample`
    upsampling emits duplicate ids distinguished only by ``copy_idx`` —
    so when a ``copy_idx`` column is present it joins the ordering as the
    tiebreaker (round-5 advice fix: without it, WHICH copy crossed the
    budget boundary depended on partitioning). Inputs with duplicate ids
    and no ``copy_idx`` column are the caller's contract violation.
    """
    if any(b < 0 for b in budgets.values()) or (
        default_budget is not None and default_budget < 0
    ):
        raise ValueError("budgets must be >= 0")
    from pyspark.sql.window import Window

    pairs = [x for g, b in budgets.items() for x in (F.lit(g), F.lit(int(b)))]
    budget_map = F.create_map(*pairs) if pairs else F.create_map()
    budget = budget_map[F.col(group_col)]
    if default_budget is not None:
        budget = F.coalesce(budget, F.lit(int(default_budget)))
    order = [_bucket(id_col, salt), F.col(id_col)]
    if "copy_idx" in df.columns:
        order.append(F.col("copy_idx"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    return (
        df.withColumn("_cum", cum)
        .withColumn("_budget", budget)
        .where(
            F.col("_budget").isNull()
            | ((F.col("_cum") - F.col(tokens_col)) < F.col("_budget"))
        )
        .drop("_cum", "_budget")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    k: int,
    id_col: str,
    salt_partitions: int | None = None,
) -> DataFrame:
    """DOMAIN CAPPING: keep at most ``k`` rows per ``group_col``, the
    highest-``score_col`` ones (ties → smallest ``id_col``) — the
    per-domain contribution cap every web-corpus recipe applies so one
    prolific source cannot dominate the mixture (C4 caps pages per
    domain; Gopher/RefinedWeb cap by registered domain).

    Default (``salt_partitions=None``): one rank window — the shuffle
    carries each group's rows to one reducer where the rank is a
    streaming pass over the sort (Spark windows spill, so it completes
    under any skew), and output ≤ k·|groups| regardless of input skew.

    ``salt_partitions=S`` (round 10) bounds the SKEWED case: a first
    rank window partitioned by (group, hash(id) mod S) splits a hot
    domain's sort across S reducers and keeps each salt's top-k, so the
    final exact window sees at most k·S rows per group instead of the
    domain's full row count (10⁹ rows of one registered domain at
    100 TB now cost S bounded sorts + one k·S-row sort). EXACT by
    construction: every global top-k row is within its own salt's
    top-k, and the (score desc, id) tie-break is a total order, so
    stage 1 never drops a winner — pinned by a parity test. The salt is
    a deterministic function of the row (xxhash64 of ``id_col``), never
    ``spark_partition_id()``, so retries re-derive identical output.
    The price is a second full-data shuffle when the input is NOT
    skewed — which is why it is opt-in (contrast
    :func:`~database_anonymiser_spark.operators.dedup.best_dedup`,
    whose k=1 case collapses to a struct argmax with map-side
    partials).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql.window import Window

    if salt_partitions is not None:
        if salt_partitions < 1:
            raise ValueError("salt_partitions must be >= 1")
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_partitions))
        w1 = Window.partitionBy(group_col, "_salt").orderBy(
            F.col(score_col).desc_nulls_last(), F.col(id_col)
        )
        df = (
            df.withColumn("_salt", salt)
            .withColumn("_rk", F.row_number().over(w1))
            .where(F.col("_rk") <= k)
            .drop("_rk", "_salt")
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )
