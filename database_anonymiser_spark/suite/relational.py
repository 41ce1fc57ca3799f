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
    "sample_limit",
    "SELECT * FROM customer ORDER BY c_custkey LIMIT 3",
    tags=("scan",),
)
def sample_limit(spark, sf_dir):
    # S3 with a deterministic ORDER BY (the reference's bare LIMIT is
    # nondeterministic — FIXTURES.md); Catalyst: TakeOrderedAndProject.
    df = load(spark, sf_dir, "customer")
    return df.orderBy("c_custkey").limit(3)


@register(
    "sample_notnull",
    "SELECT c_custkey, c_name FROM customer WHERE c_name IS NOT NULL",
    tags=("scan", "filter"),
)
def sample_notnull(spark, sf_dir):
    # P4; the IsNotNull predicate must reach the parquet scan (PushedFilters).
    df = load(spark, sf_dir, "customer")
    return df.where(F.col("c_name").isNotNull()).select("c_custkey", "c_name")


@register("schema_scan", None, tags=("scan", "catalog"))
def schema_scan(spark, sf_dir):
    # S1/S2 catalog-as-DataFrame; metadata-only (parquet footers), rows-only check.
    from database_anonymiser_spark.catalog import ParquetCatalog

    return ParquetCatalog(spark, sf_dir).columns_df()


@register("plan_filter", None, tags=("plan",))
def plan_filter(spark, sf_dir):
    # P2/P3 as an inspectable DataFrame: which tables survive enabled+denylist.
    from database_anonymiser_spark.config import config_from_dict
    from database_anonymiser_spark.planner import build_plan

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
    return spark.createDataFrame(
        [(t.table,) for t in plan.tables], "table_name string"
    ).orderBy("table_name")


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


@register("count_rows", _COUNTS_SQL, tags=("agg",))
def count_rows(spark, sf_dir):
    # A1: per-table affected-row counts. count(*) answers from parquet
    # footer statistics — no data scan at any scale.
    return _counts_union(spark, sf_dir)


@register(
    "count_total",
    f"SELECT sum(n_rows) AS total_rows FROM ({_COUNTS_SQL})",
    tags=("agg",),
)
def count_total(spark, sf_dir):
    # A2: the reference's reduce-sum over per-table counts (main.ts:80-83).
    return _counts_union(spark, sf_dir).agg(F.sum("n_rows").alias("total_rows"))


# ---------------------------------------------------------------- aggregations


@register(
    "agg_group",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))', 6)} AS sum_disc_price,
           CAST({dsum_sql('l_quantity')} / count(*) AS DOUBLE) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def agg_group(spark, sf_dir):
    """TPC-H Q1 shape: filtered scan → hash aggregate.

    Scale: the shipdate predicate pushes to parquet (row-group pruning); the
    aggregate is partial (map-side) then final — the shuffle carries only
    |groups| × partitions rows. Sums run in exact decimal so results are
    partition-order independent (see base.dsum).
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(18,4)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
            (dsum("l_quantity") / F.count(F.lit(1))).cast("double").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS dist_custs,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_distinct(spark, sf_dir):
    # Catalyst expands distinct aggregation into a two-phase plan (Expand +
    # partial agg); at scale the pre-aggregation keeps the shuffle bounded.
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("dist_custs"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_cube(spark, sf_dir):
    # Grouping-sets surface; Expand multiplies rows 4× before the partial agg,
    # which is the documented cost model for CUBE at any scale.
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
    )


@register("agg_approx_distinct", None, tags=("agg", "sketch"))
def agg_approx_distinct(spark, sf_dir):
    """HLL++ distinct-count sketch — the 100 TB answer to countDistinct.

    Rows-only check (DuckDB's approx_count_distinct uses a different sketch,
    so values legitimately differ); the error bound vs exact is pinned in
    tests/test_suite_ops.py.
    """
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_custs"))
    )


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
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_semi(spark, sf_dir):
    # left_semi never materialises the probe side's payload — at scale the
    # shuffle carries keys only.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


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
    "window_rank",
    """
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def window_rank(spark, sf_dir):
    # Deterministic: the window order has the unique o_orderkey tie-break.
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
    )


@register(
    "window_running_sum",
    """
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark, sf_dir):
    # Running sum in exact decimal → identical across engines and partitionings.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = load(spark, sf_dir, "orders")
    return df.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_lag",
    """
    SELECT o_orderkey, o_custkey,
           datediff('day',
                    CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
                    CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    """,
    tags=("window",),
)
def window_lag(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    df = load(spark, sf_dir, "orders")
    prev = F.lag("o_orderdate").over(w)
    return df.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date")).alias("days_since_prev"),
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
    "setop_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_except(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (set semantics)
