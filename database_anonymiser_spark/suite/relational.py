"""Declared relational operators: scans/limits, counts, aggregations, joins,
windows, top-k, set ops (SURVEY.md §2.1, §2.4–§2.8).

Scale notes are attached per query: what Catalyst strategy the plan should
pick and why it survives 100 TB (broadcast dims, partial aggregation,
TakeOrderedAndProject, AQE skew handling).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from database_anonymiser_spark.suite.base import dsum, dsum_sql, load, register

STAR_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

# ---------------------------------------------------------------- scans / limits


@register(
    "sample_scan",
    """
    SELECT kind, c_custkey, c_name,
           CAST(NULL AS BIGINT) AS shard, CAST(NULL AS INTEGER) AS pos
    FROM (
    SELECT 'head' AS kind, c_custkey, c_name FROM (
      SELECT c_custkey, c_name FROM customer
      WHERE c_name IS NOT NULL
      ORDER BY c_custkey LIMIT 5
    )
    UNION ALL
    SELECT 'hash_sample' AS kind, c_custkey, c_name FROM customer
    WHERE c_name IS NOT NULL
      AND ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 100 < 5
    UNION ALL
    SELECT 'mixture' AS kind, c_custkey, c_name FROM (
      SELECT c_custkey, c_name,
             unnest(range((micro // 1000000)
                          + CASE WHEN bucket < micro % 1000000 THEN 1 ELSE 0 END))
      FROM (
        SELECT c_custkey, c_name,
               CASE c_mktsegment WHEN 'BUILDING' THEN 1500000
                                 WHEN 'AUTOMOBILE' THEN 250000
                                 ELSE 100000 END AS micro,
               ('0x' || substr(md5('mix-v1' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                 % 1000000 AS bucket
        FROM customer
      )
    )
    UNION ALL
    SELECT 'temperature' AS kind, c_custkey, c_name FROM (
      SELECT c_custkey, c_name,
             unnest(range((micro // 1000000)
                          + CASE WHEN bucket < micro % 1000000 THEN 1 ELSE 0 END))
      FROM (
        SELECT c.c_custkey, c.c_name,
               CAST((450 * w.w * 1000000) // (w.s_w * w.n) AS BIGINT) AS micro,
               ('0x' || substr(md5('temp-mix-v1' || CAST(c.c_custkey AS VARCHAR)), 1, 15))::BIGINT
                 % 1000000 AS bucket
        FROM customer c
        JOIN (
          SELECT c_mktsegment, n,
                 CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w,
                 sum(CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT))
                   OVER () AS s_w
          FROM (SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1)
        ) w ON w.c_mktsegment IS NOT DISTINCT FROM c.c_mktsegment
      )
    )
    UNION ALL
    SELECT 'stratified' AS kind, c_custkey, c_name FROM (
      SELECT c_custkey, c_name,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY ('0x' || substr(md5('strat-v1' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                          % 1000000, c_custkey
             ) AS rn
      FROM customer
    ) WHERE rn <= 7
    UNION ALL
    SELECT 'cluster_balance' AS kind, c_custkey, c_name FROM (
      SELECT c.c_custkey, c.c_name,
             CAST(round(least(1.0, CAST(200 AS DOUBLE) / n.n) * 1000000) AS BIGINT) AS micro,
             ('0x' || substr(md5('cluster-balance-v1' || CAST(c.c_custkey AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 AS bucket
      FROM customer c
      JOIN (SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1) n
        ON n.c_mktsegment IS NOT DISTINCT FROM c.c_mktsegment
    ) WHERE (micro // 1000000) + CASE WHEN bucket < micro % 1000000 THEN 1 ELSE 0 END >= 1
    UNION ALL
    SELECT 'budget' AS kind, c_custkey, c_name FROM (
      SELECT c_custkey, c_name, cost, budget,
             sum(cost) OVER (PARTITION BY c_mktsegment ORDER BY h, c_custkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (
        SELECT c_custkey, c_name, c_mktsegment,
               CAST(length(c_name) AS BIGINT) AS cost,
               CASE c_mktsegment WHEN 'BUILDING' THEN 400
                                 WHEN 'AUTOMOBILE' THEN 200 END AS budget,
               ('0x' || substr(md5('budget-v1' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                 % 1000000 AS h
        FROM customer WHERE c_name IS NOT NULL
      )
    ) WHERE budget IS NULL OR cum - cost < budget
    UNION ALL
    SELECT 'domain_cap' AS kind, c_custkey, c_name FROM (
      SELECT c_custkey, c_name,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC NULLS LAST, c_custkey
             ) AS rn
      FROM customer
    ) WHERE rn <= 9
    )
    UNION ALL
    SELECT 'shard' AS kind, c_custkey, c_name, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, c_custkey)
                - 1 AS INTEGER) AS pos
    FROM (
      SELECT c_custkey, c_name,
             ('0x' || substr(md5('shard-v1' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
               % 8 AS shard,
             ('0x' || substr(md5('shard-v1#ord' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
               AS ord
      FROM customer
    )
    """,
    tags=("scan", "filter", "sample", "export"),
)
def sample_scan(spark, sf_dir):
    """S3 sample-limit + P4 null-filter + deterministic sampling/mixing.

    'head' is the config-preview limit (TakeOrderedAndProject: per-partition
    heaps, no global sort; IsNotNull pushed to the scan — plan-asserted).
    'hash_sample' is a ~5% key-hash sample — the reproducible sampling
    idiom for 100 TB pipelines: unlike rand()/TABLESAMPLE it is stable
    across runs, engines, partitionings and retries, and it is a map-side
    filter (no shuffle, no seed state).
    'mixture' is the data-mixing operator (operators/sampling.py): per-
    group target rates in one pass — BUILDING upsampled 1.5× (every row
    once, a deterministic half twice), AUTOMOBILE down to 0.25, the rest
    to 0.1 — rate lookup via a literal map, copy fan-out via
    posexplode(array_repeat), all map-side; the oracle reproduces the
    bucket arithmetic and the copy fan-out with unnest(range(...)).
    'temperature' (round 10, operators/sampling.py::temperature_mixture)
    is α-scaled source rebalancing (GPT-3/XLM-R/Llama: sample sources
    ∝ n^α, α=0.5 flattens the size distribution) targeting 450 rows:
    integer weights w = floor(sqrt(n)·1e6) (sqrt is IEEE
    correctly-rounded in every engine), integer weight sum, integer
    micro-rate — the whole derivation is exact cross-engine, and the
    oracle reproduces selection AND upsampling fan-out
    (unnest(range(copies))) bit-for-bit.
    'stratified' (round 5, operators/sampling.py::stratified_sample) is
    the exact-quota counterpart: the 7 smallest-hash customers per market
    segment — eval-set construction. At scale the window is preceded by a
    broadcast hash-threshold prefilter (KMV-style) so no stratum ever
    sorts whole in one task; the oracle is the plain ROW_NUMBER form the
    prefilter provably equals.
    'cluster_balance' (round 9, operators/sampling.py::
    cluster_balanced_sample) flattens a skewed cluster-size distribution
    toward a fixed per-cluster budget (here 200 rows per market segment —
    the Sorscher-style rebalancing stage that follows semantic_clusters):
    per-cluster rate = min(1, budget/n_c) derived from a one-pass count
    aggregate, then mixture_sample's md5-bucket filter under its own
    salt; the oracle recomputes the counts, the capped micro-rate (same
    double op order: divide, cap, x1e6, round) and the bucket filter.
    'domain_cap' (round 9, operators/sampling.py::cap_per_group) is
    the per-domain contribution cap (the C4/Gopher/RefinedWeb
    pages-per-domain rule): the 9 highest-balance customers per market
    segment, ties -> smallest key; one rank window, output bounded by
    k x |groups| regardless of skew.
    'shard' (round 9, operators/export.py::shard_assign) is the
    training-shard export's deterministic global shuffle under the
    md5 family: every row's (shard, within-shard position) at 8 shards
    — the exact placement export_training_shards writes (the writer
    realizes the order via sortWithinPartitions inside its one write
    shuffle; the rank window here exists only for the oracle). Other
    kinds carry NULL shard/pos.
    'budget' is token-budget sampling (round 4,
    operators/sampling.py::token_budget_sample) — the form real
    pretraining mixtures are specified in (tokens per source): admit docs
    in md5-hash order until each group's budget is met (cost here =
    name length as the token stand-in; BUILDING 400, AUTOMOBILE 200,
    others uncapped), one window per group, the crossing doc kept.
    """
    df = load(spark, sf_dir, "customer")
    head = (
        df.where(F.col("c_name").isNotNull())
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(5)
        .select(F.lit("head").alias("kind"), "c_custkey", "c_name")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    sampled = (
        df.where(F.col("c_name").isNotNull() & (bucket < 5))
        .select(F.lit("hash_sample").alias("kind"), "c_custkey", "c_name")
    )
    from database_anonymiser_spark.operators import sampling as SA

    mixed = SA.mixture_sample(
        df.select("c_custkey", "c_name", "c_mktsegment"),
        "c_custkey",
        "c_mktsegment",
        {"BUILDING": 1.5, "AUTOMOBILE": 0.25},
        default_rate=0.1,
    ).select(F.lit("mixture").alias("kind"), "c_custkey", "c_name")
    # 'temperature' (round 10, operators/sampling.py::temperature_mixture):
    # GPT-3/XLM-R/Llama α-sampling — sources sampled ∝ n^α (α=0.5),
    # targeting 450 rows; exact integer micro-rates from isqrt-grid
    # weights, so the oracle reproduces the selection bit-for-bit
    tempered = SA.temperature_mixture(
        df.select("c_custkey", "c_name", "c_mktsegment"),
        "c_custkey",
        "c_mktsegment",
        target_total=450,
    ).select(F.lit("temperature").alias("kind"), "c_custkey", "c_name")
    stratified = SA.stratified_sample(
        df.select("c_custkey", "c_name", "c_mktsegment"),
        "c_custkey",
        "c_mktsegment",
        7,
    ).select(F.lit("stratified").alias("kind"), "c_custkey", "c_name")
    balanced = SA.cluster_balanced_sample(
        df.select("c_custkey", "c_name", "c_mktsegment"),
        "c_custkey",
        "c_mktsegment",
        budget_per_cluster=200,
    ).select(F.lit("cluster_balance").alias("kind"), "c_custkey", "c_name")
    budgeted = SA.token_budget_sample(
        df.where(F.col("c_name").isNotNull())
        .select("c_custkey", "c_name", "c_mktsegment")
        .withColumn("_cost", F.length("c_name").cast("long")),
        "c_custkey",
        "_cost",
        "c_mktsegment",
        {"BUILDING": 400, "AUTOMOBILE": 200},
        default_budget=None,
    ).select(F.lit("budget").alias("kind"), "c_custkey", "c_name")
    # 'domain_cap' (round 9, operators/sampling.py::cap_per_group): the
    # per-domain contribution cap (C4/Gopher cap pages per domain) — keep
    # the 9 highest-balance customers per market segment, ties -> min key
    capped = SA.cap_per_group(
        df.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
        "c_mktsegment",
        "c_acctbal",
        9,
        "c_custkey",
    ).select(F.lit("domain_cap").alias("kind"), "c_custkey", "c_name")
    # 'shard' (round 9, operators/export.py::shard_assign): the
    # training-shard export's deterministic global shuffle — md5-family
    # shard id + dense within-shard position, the exact placement
    # export_training_shards writes (rank materialized only for the
    # oracle; production exports realize the order via
    # sortWithinPartitions inside the write shuffle, no window)
    from pyspark.sql import Window as _W

    from database_anonymiser_spark.operators.export import shard_assign

    assigned = shard_assign(
        df.select("c_custkey", "c_name"), "c_custkey", 8, hash_family="md5"
    )
    w = _W.partitionBy("shard").orderBy("_ord", "c_custkey")
    sharded = assigned.select(
        F.lit("shard").alias("kind"),
        "c_custkey",
        "c_name",
        "shard",
        (F.row_number().over(w) - 1).cast("int").alias("pos"),
    )
    pad = lambda b: b.withColumn(
        "shard", F.lit(None).cast("long")
    ).withColumn("pos", F.lit(None).cast("int"))
    return (
        pad(head).unionByName(pad(sampled))
        .unionByName(pad(mixed))
        .unionByName(pad(tempered))
        .unionByName(pad(stratified))
        .unionByName(pad(balanced))
        .unionByName(pad(budgeted))
        .unionByName(pad(capped))
        .unionByName(sharded)
    )


_ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
)

# The 4 tables surviving the fixed config's enabled + denylist filters
# (orders disabled; lineitem/part denylisted) — a constant of the config,
# so the oracle asserts the planner's filter semantics as literal rows.
_PLAN_SURVIVORS_SQL = " UNION ALL ".join(
    f"SELECT 'plan_survivor' AS kind, 'public.{t}' AS table_name, "
    "CAST(NULL AS VARCHAR) AS column_name, CAST(NULL AS INTEGER) AS ordinal, "
    "CAST(NULL AS VARCHAR) AS data_type, CAST(NULL AS VARCHAR) AS type_group, "
    "CAST(NULL AS BOOLEAN) AS nullable"
    for t in ("region", "nation", "customer", "supplier")
)


@register(
    "catalog_scan",
    # The column rows come from DuckDB's information_schema over the same
    # registered views; DuckDB's type names map 1:1 to Spark simpleStrings
    # on this fixture, and the engine's 7-group mapping is a CASE away — so
    # even catalog introspection is value-hash checked cross-engine.
    f"""
    SELECT 'column' AS kind, table_name, column_name,
           CAST(ordinal_position AS INTEGER) AS ordinal,
           CASE data_type
             WHEN 'BIGINT' THEN 'bigint'
             WHEN 'INTEGER' THEN 'int'
             WHEN 'DOUBLE' THEN 'double'
             WHEN 'VARCHAR' THEN 'string'
             WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
             WHEN 'FLOAT[]' THEN 'array<float>'
           END AS data_type,
           CASE
             WHEN data_type IN ('BIGINT', 'INTEGER', 'DOUBLE') THEN 'NUMBER'
             WHEN data_type = 'VARCHAR' THEN 'STRING'
             WHEN data_type = 'TIMESTAMP' THEN 'DATE'
             ELSE 'OTHER'
           END AS type_group,
           is_nullable = 'YES' AS nullable
    FROM information_schema.columns
    WHERE table_name IN ({", ".join(f"'{t}'" for t in _ALL_TABLES.split())})
    UNION ALL
    {_PLAN_SURVIVORS_SQL}
    """,
    tags=("scan", "catalog", "plan"),
)
def catalog_scan(spark, sf_dir):
    """S1/S2 catalog-as-DataFrame + P2/P3 plan filtering, tagged and
    unioned.

    'column' rows are the full column catalog (metadata-only — parquet
    footers, no row data, safe at any scale), checked against DuckDB's
    information_schema over the same files with a 1:1 type-name mapping;
    'plan_survivor' rows are the tables that survive the enabled-flag +
    denylist filters for a fixed config (P2/P3), which the oracle encodes
    as the expected literal set.
    """
    from database_anonymiser_spark.catalog import ParquetCatalog
    from database_anonymiser_spark.config import config_from_dict
    from database_anonymiser_spark.planner import build_plan

    cols = ParquetCatalog(spark, sf_dir).columns_df().select(
        F.lit("column").alias("kind"), "*"
    )
    cfg = config_from_dict(
        {
            "version": 1,
            "reviewed": True,
            "scope": {"schema": "public", "denylist": ["lineitem", "public.part"]},
            "column_strategy": {"c_name": "HASH_SHA256"},
            "rules": [
                {"table": f"public.{t}", "enabled": t != "orders", "columns": []}
                for t in STAR_TABLES
            ],
        }
    )
    plan = build_plan(cfg)
    survivors = spark.createDataFrame(
        [(t.table,) for t in plan.tables], "table_name string"
    ).select(
        F.lit("plan_survivor").alias("kind"),
        "table_name",
        F.lit(None).cast("string").alias("column_name"),
        F.lit(None).cast("int").alias("ordinal"),
        F.lit(None).cast("string").alias("data_type"),
        F.lit(None).cast("string").alias("type_group"),
        F.lit(None).cast("boolean").alias("nullable"),
    )
    return cols.unionByName(survivors)


# ---------------------------------------------------------------- counts (A1/A2)


def _counts_union(spark, sf_dir):
    dfs = []
    for t in STAR_TABLES:
        dfs.append(
            load(spark, sf_dir, t)
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(t).alias("table_name"), "n_rows")
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


_COUNTS_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS table_name, count(*) AS n_rows FROM {t}" for t in STAR_TABLES
)


@register(
    "count_rows",
    # CAST to BIGINT: DuckDB's sum(BIGINT) yields HUGEINT (int128), which
    # hash-mismatches Spark's int64 even when values agree.
    f"""
    SELECT table_name, CAST(sum(n_rows) AS BIGINT) AS n_rows
    FROM ({_COUNTS_SQL})
    GROUP BY ROLLUP (table_name)
    """,
    tags=("agg",),
)
def count_rows(spark, sf_dir):
    # A1 per-table counts + A2 grand total (the reference's reduce-sum,
    # main.ts:80-83) in one ROLLUP: 7 per-table rows + 1 total row
    # (table_name NULL). count(*) answers from parquet footer statistics —
    # no data scan at any scale.
    return (
        _counts_union(spark, sf_dir)
        .rollup("table_name")
        .agg(F.sum("n_rows").alias("n_rows"))
    )


# ---------------------------------------------------------------- aggregations


@register(
    "agg_orders_stats",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS dist_custs,
           count(*) AS n_orders,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_orders_stats(spark, sf_dir):
    """countDistinct + exact interpolated percentiles in one groupBy.

    Catalyst expands the distinct aggregation into a two-phase plan (Expand
    + partial agg) — at scale the pre-aggregation keeps the shuffle bounded.
    The exact percentile (both engines: linear interpolation over the sorted
    values) is the small-group path; the 100 TB variant is the GK sketch,
    declared as agg_approx_sketch. (The plain groupBy-agg shape is proven by
    tpch_q1, which subsumes the former agg_group.)
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("dist_custs"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
    )


_MULTIDIM_BODY = f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
"""

_GROUPING_SETS_SQL = f"""
    SELECT 'gsets' AS gset, * FROM ({_MULTIDIM_BODY}
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()))
"""


@register(
    "agg_multidim",
    f"""
    SELECT 'cube' AS gset, * FROM ({_MULTIDIM_BODY} GROUP BY CUBE (l_returnflag, l_linestatus))
    UNION ALL
    SELECT 'rollup' AS gset, * FROM ({_MULTIDIM_BODY} GROUP BY ROLLUP (l_returnflag, l_linestatus))
    UNION ALL
    {_GROUPING_SETS_SQL}
    """,
    tags=("agg", "sql"),
)
def agg_multidim(spark, sf_dir):
    """Multi-dimensional grouping surface: CUBE, ROLLUP and GROUPING SETS
    results, tagged and unioned — one entry proves all three shapes.

    Scale: the naive formulation unions three separate aggregations, which
    is THREE full scans of the fact table. The cube is the superset of
    every grouping set, so this computes ONE cube (one scan, one Expand ×4,
    one partial-then-final aggregate) and derives the rollup and
    grouping-sets rows by filtering the already-tiny cube output on
    grouping_id — gid 0=(rf,ls), 1=(rf), 2=(ls), 3=(); rollup and the
    declared sets ((rf,ls),(rf),()) are both gid ∈ {0,1,3}. That the
    dedicated .rollup() / GROUPING SETS operators produce exactly these
    derived rows is pinned in tests/test_suite_ops.py.
    """
    li = load(spark, sf_dir, "lineitem")
    cube = li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
        F.grouping_id().alias("_gid"),
    )
    # fan each cube row out to its grouping families with one explode — no
    # union, no cache, ONE aggregation in the whole plan (plan-asserted)
    tags = F.when(
        F.col("_gid").isin(0, 1, 3),
        F.array(F.lit("cube"), F.lit("rollup"), F.lit("gsets")),
    ).otherwise(F.array(F.lit("cube")))
    return cube.select(
        F.explode(tags).alias("gset"), "l_returnflag", "l_linestatus", "n", "sum_qty"
    )


_KMV_K = 256
_CM_D, _CM_W = 4, 1024
_CM_PROBES = tuple(range(1, 11)) + (99999999,)  # last one absent from orders
_Q_K = 512


@register(
    "agg_approx_sketch",
    f"""
    WITH h AS (
      SELECT DISTINCT o_orderstatus,
             ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM orders
      WHERE o_custkey IS NOT NULL
    ), r AS (
      SELECT o_orderstatus, hv,
             row_number() OVER (PARTITION BY o_orderstatus ORDER BY hv) AS rn,
             count(*) OVER (PARTITION BY o_orderstatus) AS nd
      FROM h
    ),
    kmv AS (
      SELECT 'kmv' AS sketch, o_orderstatus AS key,
             CASE WHEN nd < {_KMV_K} THEN CAST(nd AS DOUBLE)
                  ELSE round({float((_KMV_K - 1) * 2**60)} / hv, 6) END AS est,
             CAST(nd AS DOUBLE) AS exact
      FROM r WHERE rn = least({_KMV_K}, nd)
    ),
    rs AS (SELECT unnest(range(0, {_CM_D})) AS r),
    cmv AS (
      SELECT ('0x' || substr(md5('cm:' || CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS v
      FROM orders WHERE o_custkey IS NOT NULL
    ),
    cells AS (
      SELECT r, ((v % 1073741824) + r * ((v >> 30) * 2 + 1)) % {_CM_W} AS pos,
             count(*) AS cnt
      FROM cmv, rs GROUP BY 1, 2
    ),
    probes AS (SELECT unnest([{", ".join(f"'{k}'" for k in _CM_PROBES)}]) AS key),
    ppos AS (
      SELECT key, r,
             (((('0x' || substr(md5('cm:' || key), 1, 15))::BIGINT) % 1073741824)
              + r * (((('0x' || substr(md5('cm:' || key), 1, 15))::BIGINT) >> 30) * 2 + 1))
             % {_CM_W} AS pos
      FROM probes, rs
    ),
    pest AS (
      SELECT p.key, min(coalesce(c.cnt, 0)) AS cm_est
      FROM ppos p LEFT JOIN cells c ON c.r = p.r AND c.pos = p.pos
      GROUP BY 1
    ),
    pexact AS (
      SELECT CAST(o_custkey AS VARCHAR) AS key, count(*) AS exact
      FROM orders
      WHERE CAST(o_custkey AS VARCHAR) IN ({", ".join(f"'{k}'" for k in _CM_PROBES)})
      GROUP BY 1
    ),
    cm AS (
      SELECT 'cm' AS sketch, e.key, CAST(e.cm_est AS DOUBLE) AS est,
             CAST(coalesce(x.exact, 0) AS DOUBLE) AS exact
      FROM pest e LEFT JOIN pexact x ON x.key = e.key
    ),
    qh AS (
      SELECT ('0x' || substr(md5('q:' || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT AS hv,
             o_orderkey AS k2, o_totalprice AS v
      FROM orders WHERE o_orderkey IS NOT NULL
    ),
    qsamp AS (
      SELECT v FROM (SELECT v, row_number() OVER (ORDER BY hv, k2) AS rn FROM qh) t
      WHERE rn <= {_Q_K}
    ),
    qx AS (
      SELECT round(quantile_cont(o_totalprice, 0.5), 4) AS e50,
             round(quantile_cont(o_totalprice, 0.95), 4) AS e95
      FROM orders WHERE o_orderkey IS NOT NULL
    ),
    qs AS (
      SELECT round(quantile_cont(v, 0.5), 4) AS s50,
             round(quantile_cont(v, 0.95), 4) AS s95
      FROM qsamp
    ),
    q AS (
      SELECT 'q' AS sketch, '0.5' AS key, s50 AS est, e50 AS exact FROM qs, qx
      UNION ALL
      SELECT 'q' AS sketch, '0.95' AS key, s95 AS est, e95 AS exact FROM qs, qx
    ),
    sha AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM orders WHERE o_custkey IS NOT NULL
    ),
    shb AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM customer WHERE c_custkey IS NOT NULL
    ),
    ska AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM sha) t
            WHERE rn <= {_KMV_K}),
    skb AS (SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM shb) t
            WHERE rn <= {_KMV_K}),
    sm AS (SELECT DISTINCT hv FROM (SELECT hv FROM ska UNION ALL SELECT hv FROM skb) t),
    smr AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn, count(*) OVER () AS nm FROM sm),
    stheta AS (SELECT hv AS th, nm FROM smr WHERE rn = least({_KMV_K}, nm)),
    srho AS (
      SELECT CAST(count(*) AS BIGINT) AS rho
      FROM ska JOIN skb USING (hv), stheta WHERE ska.hv <= stheta.th
    ),
    sstats AS (
      SELECT CASE WHEN t.nm < {_KMV_K} THEN CAST(t.nm AS DOUBLE)
                  ELSE round({float((_KMV_K - 1) * 2**60)} / t.th, 6) END AS u,
             CAST(r.rho AS DOUBLE) / CAST(least({_KMV_K}, t.nm) AS DOUBLE) AS jraw,
             round(CAST(r.rho AS DOUBLE) / CAST(least({_KMV_K}, t.nm) AS DOUBLE), 6) AS j
      FROM stheta t, srho r
    ),
    sexact AS (
      SELECT CAST(u_cnt AS DOUBLE) AS xu, CAST(i_cnt AS DOUBLE) AS xi,
             round(CAST(i_cnt AS DOUBLE) / CAST(u_cnt AS DOUBLE), 6) AS xj
      FROM (
        SELECT
          (SELECT count(*) FROM (
             SELECT o_custkey AS x FROM orders WHERE o_custkey IS NOT NULL
             UNION SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL) t) AS u_cnt,
          (SELECT count(DISTINCT o_custkey) FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS i_cnt
      ) t
    ),
    setops AS (
      SELECT 'setops' AS sketch, 'union' AS key, u AS est, xu AS exact FROM sstats, sexact
      UNION ALL
      SELECT 'setops', 'intersect', round(jraw * u, 6), xi FROM sstats, sexact
      UNION ALL
      SELECT 'setops', 'jaccard', j, xj FROM sstats, sexact
    )
    SELECT * FROM kmv UNION ALL SELECT * FROM cm UNION ALL SELECT * FROM q
    UNION ALL SELECT * FROM setops
    """,
    tags=("agg", "sketch"),
)
def agg_approx_sketch(spark, sf_dir):
    """Sketch family, in the engine's twin pattern — three deterministic,
    ANSI-SQL-reproducible sketches tagged and unioned:

    - 'kmv': per-group KMV distinct count (operators/sketch.py::
      kmv_distinct — Bar-Yossef et al. 2002: k-th smallest 60-bit md5
      hash → (k-1)·2⁶⁰/h(k)).
    - 'cm' (round 5): Count-Min point-frequency estimates
      (operators/sketch.py::count_min_freq — Cormode & Muthukrishnan
      2005) for a fixed probe-key set incl. one absent key; the sketch is
      d×w BOUNDED counter cells (partial map-side combine → cost
      independent of stream length), the hash family is the bloom
      filter's one-md5 Kirsch-Mitzenmacher derivation, and est ≥ exact
      (one-sided CM guarantee) is pinned in tests along with the ε·N
      bound.
    - 'q' (round 5): hash-sample quantile sketch
      (operators/sketch.py::hash_sample_quantile) — exact interpolated
      percentiles over the 512 smallest-hash rows (a deterministic
      uniform sample; KMV-style bucketed prefilter so no task sorts the
      full input), with the full-data percentile as the accuracy twin.

    Both constructions are pure md5+BIGINT, so the whole entry — including
    every hash collision — is value-hash checked against DuckDB. The
    PRODUCTION sketches (HLL++ approx_count_distinct, GK
    approx_percentile), whose engine-internal values no oracle can
    reproduce, remain error-bound-pinned in tests/test_suite_ops.py."""
    from database_anonymiser_spark.operators.sketch import (
        count_min_freq,
        hash_sample_quantile,
        kmv_distinct,
    )

    o = load(spark, sf_dir, "orders")
    kmv = kmv_distinct(o, "o_custkey", group_cols=("o_orderstatus",), k=_KMV_K).select(
        F.lit("kmv").alias("sketch"),
        F.col("o_orderstatus").alias("key"),
        F.col("kmv_distinct_est").alias("est"),
        F.col("exact_distinct").cast("double").alias("exact"),
    )
    cm = count_min_freq(
        o, "o_custkey", list(_CM_PROBES), depth=_CM_D, width=_CM_W
    ).select(
        F.lit("cm").alias("sketch"),
        "key",
        F.col("cm_est").cast("double").alias("est"),
        F.col("exact").cast("double").alias("exact"),
    )
    # third member (round 5): hash-sample quantile sketch — exact
    # interpolated percentiles over the 512 smallest-hash rows; the
    # full-data percentile rides along as the accuracy twin
    q = hash_sample_quantile(
        o, "o_orderkey", "o_totalprice", probs=(0.5, 0.95), k=_Q_K
    ).select(
        F.lit("q").alias("sketch"),
        F.col("prob").cast("string").alias("key"),
        F.col("q_est").alias("est"),
        F.col("q_exact").alias("exact"),
    )
    # fourth member (round 6): Theta-style SET OPERATIONS over two KMV
    # sketches — |orders.custkeys ∪ customer.custkeys|, the intersection
    # and the Jaccard, estimated from two bottom-k hash sets without
    # rescanning either table (operators/sketch.py::kmv_set_ops; exact
    # values ride along as the audit twin)
    from database_anonymiser_spark.operators.sketch import kmv_set_ops

    so = kmv_set_ops(
        o, "o_custkey", load(spark, sf_dir, "customer"), "c_custkey", k=_KMV_K,
        audit=True,  # the oracle checks est AND exact; production default skips both DISTINCTs
    ).select(
        F.lit("setops").alias("sketch"),
        F.col("op").alias("key"),
        "est",
        "exact",
    )
    return kmv.unionByName(cm).unionByName(q).unionByName(so)


# ---------------------------------------------------------------- joins


@register(
    "join_broadcast",
    f"""
    SELECT r.r_name, count(*) AS n_customers, {dsum_sql('c.c_acctbal')} AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("join",),
)
def join_broadcast(spark, sf_dir):
    # Star join: both dims broadcast (nation 25 rows, region 5) — zero
    # shuffle of the fact side; the only shuffle is the 5-group aggregate.
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal"))
    )


@register(
    "join_sortmerge",
    f"""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           {dsum_sql('CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l.l_discount AS DECIMAL(18,4))', 6)} AS revenue
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("join",),
)
def join_sortmerge(spark, sf_dir):
    # Fact-to-fact equi-join: at 100 TB this is the shuffle that matters —
    # both sides hash-partition on orderkey (co-partitioned, no skew: keys
    # are unique on the build side); AQE handles residual skew.
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(18,6)")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


@register(
    "join_outer",
    """
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def join_outer(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("n_orders"))
    )


@register(
    "join_semi_anti",
    """
    SELECT 'semi' AS op, c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_semi_anti(spark, sf_dir):
    # EXISTS (left_semi) and NOT EXISTS (left_anti) over the same key,
    # tagged and unioned. Neither join materialises the probe side's
    # payload — at scale the shuffle carries keys only.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("op"), "c_custkey", "c_name")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("op"), "c_custkey", "c_name")
    )
    return semi.unionByName(anti)


@register(
    "join_range",
    """
    SELECT o.o_orderkey, count(*) AS n_shipped_30d
    FROM orders o
    JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
    tags=("join",),
)
def join_range(spark, sf_dir):
    # Equi + range residual: Catalyst keeps the hash join on orderkey and
    # evaluates the range as a join filter — never a nested-loop blowup.
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAY"))
    )
    return o.join(li, cond).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_shipped_30d"))


# ---------------------------------------------------------------- windows


@register(
    "window_pack",
    """
    WITH d AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_num,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    )
    SELECT o_orderkey, o_custkey, day_num,
           row_number() OVER w1 AS rn,
           rank() OVER w1 AS rnk,
           lead(o_orderkey) OVER w1 AS next_orderkey,
           ntile(4) OVER w1 AS spend_quartile,
           CAST(sum(price) OVER w2 AS DOUBLE) AS running_spend,
           datediff('day',
                    CAST(lag(o_orderdate) OVER w3 AS DATE),
                    CAST(o_orderdate AS DATE)) AS days_since_prev,
           CAST(sum(price) OVER w4 AS DOUBLE) AS rolling_7d_spend,
           CAST(sum(price) OVER w5 AS DOUBLE) AS ma3_spend
    FROM d
    WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w4 AS (PARTITION BY o_custkey ORDER BY day_num
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
           w5 AS (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "timeseries"),
)
def window_pack(spark, sf_dir):
    """The full window-function surface in one query over ``orders``:
    ranking (row_number/rank), navigation (lead/lag), distribution (ntile),
    a ROWS running sum, a value-based RANGE frame (7-day rolling spend),
    and a bounded ROWS sliding frame (3-row moving sum — round 4; sum not
    mean so the exact-decimal determinism argument carries unchanged).

    Every window partitions by o_custkey, so Catalyst plans ONE shuffle —
    the four differently-ordered Window nodes share the same exchange and
    just re-sort within partitions. Orders carry the unique o_orderkey
    tie-break (deterministic); sums run in exact decimal
    (partition-order independent — see base.dsum).
    """
    df = load(spark, sf_dir, "orders")
    d = df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias(
            "day_num"
        ),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        "o_totalprice",
    )
    w1 = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w2 = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w3 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w4 = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-6, 0)
    w5 = Window.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-2, 0)
    return d.select(
        "o_orderkey",
        "o_custkey",
        "day_num",
        F.row_number().over(w1).alias("rn"),
        F.rank().over(w1).alias("rnk"),
        F.lead("o_orderkey").over(w1).alias("next_orderkey"),
        F.ntile(4).over(w1).alias("spend_quartile"),
        F.sum("price").over(w2).cast("double").alias("running_spend"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag("o_orderdate").over(w3).cast("date")
        ).alias("days_since_prev"),
        F.sum("price").over(w4).cast("double").alias("rolling_7d_spend"),
        F.sum("price").over(w5).cast("double").alias("ma3_spend"),
    )


# ---------------------------------------------------------------- sorts / top-k


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort",),
)
def topk_orders(spark, sf_dir):
    # Catalyst compiles orderBy+limit to TakeOrderedAndProject: each partition
    # keeps a 10-row heap; no global sort ever materialises. Unique tie-break.
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------- set ops


@register(
    "setop_pack",
    """
    SELECT 'union' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    """,
    tags=("setop",),
)
def setop_pack(spark, sf_dir):
    # UNION (distinct), INTERSECT, EXCEPT over the same key sets, tagged and
    # unioned. Each set op is a hash aggregate / left-semi-anti under the
    # hood — one shuffle per branch on the (narrow) key column.
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    union = c.union(s).distinct().select(F.lit("union").alias("op"), "nationkey")
    inter = c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey")
    exc = c.subtract(s).select(F.lit("except").alias("op"), "nationkey")
    return union.unionByName(inter).unionByName(exc)
