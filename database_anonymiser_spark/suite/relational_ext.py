"""Extended relational surface: as-of join, cross join, rollup, lead/ntile
windows, map functions, and TPC-H-shaped flagship analytics (SURVEY.md §2.5,
§2.6, §2.9 extensions).

The reference has none of these (its SQL surface is catalog scans + UPDATEs);
they complete the capability set BASELINE.json's north star mandates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark.operators.joins import asof_join_all, gap_fill
from database_anonymiser_spark.suite.base import dsum, dsum_sql, load, register

# ---------------------------------------------------------------- as-of join


@register(
    "join_asof",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    bk AS (
      SELECT event_id, user_id, asof_event_id, asof_value FROM (
        SELECT p.event_id, p.user_id,
               v.event_id AS asof_event_id, v.value AS asof_value,
               row_number() OVER (
                 PARTITION BY p.event_id
                 ORDER BY v.ts DESC, v.event_id DESC) AS rn
        FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
      ) WHERE rn = 1
    ),
    fw AS (
      SELECT event_id, user_id, asof_event_id, asof_value, asof_ts FROM (
        SELECT p.event_id, p.user_id,
               v.event_id AS asof_event_id, v.value AS asof_value, v.ts AS asof_ts,
               row_number() OVER (
                 PARTITION BY p.event_id
                 ORDER BY v.ts ASC, v.event_id ASC) AS rn
        FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts >= p.ts
      ) WHERE rn = 1
    ),
    bk2 AS (
      SELECT event_id, user_id, asof_event_id, asof_value, asof_ts FROM (
        SELECT p.event_id, p.user_id,
               v.event_id AS asof_event_id, v.value AS asof_value, v.ts AS asof_ts,
               row_number() OVER (
                 PARTITION BY p.event_id
                 ORDER BY v.ts DESC, v.event_id DESC) AS rn
        FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
      ) WHERE rn = 1
    )
    SELECT 'backward' AS direction, event_id, user_id, asof_event_id, asof_value FROM bk
    UNION ALL
    SELECT 'forward' AS direction, event_id, user_id, asof_event_id, asof_value FROM fw
    UNION ALL
    SELECT 'nearest' AS direction, p.event_id, p.user_id,
           CASE WHEN fw.asof_ts IS NULL
                  OR (bk2.asof_ts IS NOT NULL
                      AND p.ts - bk2.asof_ts <= fw.asof_ts - p.ts)
                THEN bk2.asof_event_id ELSE fw.asof_event_id END AS asof_event_id,
           CASE WHEN fw.asof_ts IS NULL
                  OR (bk2.asof_ts IS NOT NULL
                      AND p.ts - bk2.asof_ts <= fw.asof_ts - p.ts)
                THEN bk2.asof_value ELSE fw.asof_value END AS asof_value
    FROM p
    LEFT JOIN bk2 ON bk2.event_id = p.event_id
    LEFT JOIN fw ON fw.event_id = p.event_id
    UNION ALL
    SELECT 'gapfill' AS direction,
           CAST(epoch(g.bts) AS BIGINT) AS event_id, g.user_id,
           t.asof_event_id, t.asof_value
    FROM (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bts
      FROM (SELECT user_id, date_trunc('day', min(ts)) AS lo, max(ts) AS hi
            FROM v GROUP BY user_id)
    ) g
    LEFT JOIN LATERAL (
      SELECT event_id AS asof_event_id, value AS asof_value
      FROM v WHERE v.user_id = g.user_id AND v.ts <= g.bts
      ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) t ON true
    """,
    tags=("join", "timeseries"),
)
def join_asof(spark, sf_dir):
    """As-of join, all three directions tagged and unioned: each purchase
    event gets the user's latest view at-or-before it (backward), earliest
    view at-or-after it (forward), and whichever is closer (nearest, ties
    backward).

    Scale: union + ordered window = ONE shuffle on user_id for ALL THREE
    directions (r15 — both carry windows stacked on a single exchange,
    directions emitted by a 3-way tag explode); no range-join candidate
    explosion (the oracle's LEFT JOIN + row_number formulation is the
    quadratic plan we specifically avoid). State per key is one carried
    payload — safe at any per-user event volume.
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    # r15 (guide §2.4): the three directions previously paid three
    # exchanges of the same tagged union (and the union of those
    # subtrees does not dedup physically — per-branch pruning defeats
    # ReuseExchange); asof_join_all emits all three from ONE pipeline —
    # one exchange, both carry windows computed once, a 3-way direction
    # explode + CASE instead of a union of clones. Values identical per
    # direction (oracle-checked; pinned in tests/test_suite_ops.py).
    tagged = asof_join_all(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "value"],
        tie_break="event_id",
    ).select("direction", "event_id", "user_id", "asof_event_id", "asof_value")
    # FOURTH branch (round 5) — gap filling: a per-user DAILY grid over
    # each user's view span, LOCF-filled by the as-of-backward join
    # (operators/joins.py::gap_fill — the resample().ffill() shape).
    # event_id carries the bucket's epoch seconds (the entry's schema is
    # BIGINT there). The calendar-aligned grid starts at midnight of each
    # user's first view DAY, so the leading bucket precedes the first
    # observation and carries NULL — the standard LOCF contract. The
    # oracle renders the same grid with generate_series + a LEFT LATERAL
    # top-1.
    gf = gap_fill(
        views, on=["user_id"], ts_col="ts", payload=["event_id", "value"],
        step="1 day", tie_break="event_id",
    ).select(
        F.lit("gapfill").alias("direction"),
        F.unix_timestamp("bucket_ts").alias("event_id"),
        "user_id",
        "asof_event_id",
        "asof_value",
    )
    return tagged.unionByName(gf)


# ---------------------------------------------------------------- cross join


@register(
    "join_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def join_cross(spark, sf_dir):
    # BroadcastNestedLoopJoin — correct only because both sides are tiny
    # dims; the engine never cross-joins fact tables.
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# ---------------------------------------------------------------- TPC-H flagships

_REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))"


def _revenue_col():
    return (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    ).cast("decimal(18,6)")


@register(
    "tpch_q3",
    f"""
    SELECT l.l_orderkey,
           {dsum_sql(_REVENUE_SQL, 6)} AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("flagship", "join", "agg"),
)
def tpch_q3(spark, sf_dir):
    """TPC-H Q3 (shipping priority): selective dim filter → two fact joins →
    agg → top-k.

    Scale: the mktsegment filter makes customer broadcast-able (AQE converts
    at runtime via size stats); orders⋈lineitem shuffles on orderkey; the
    final top-10 is TakeOrderedAndProject (per-partition heaps, no global
    sort). Predicates push to all three parquet scans.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_revenue_col()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5",
    f"""
    SELECT n.n_name, {dsum_sql(_REVENUE_SQL, 6)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("flagship", "join", "agg"),
)
def tpch_q5(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): six-table join, region-filtered.

    Scale: region/nation/supplier broadcast (tiny); customer⋈orders and
    ⋈lineitem shuffle on their keys; Catalyst reorders the join tree under
    CBO/AQE. The c_nationkey = s_nationkey residual rides the supplier join.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue_col()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------- skew-salted join


@register(
    "join_salted",
    f"""
    SELECT s.s_name, count(*) AS n_items, {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
    tags=("join", "skew"),
)
def join_salted(spark, sf_dir):
    """Targeted salted equi-join (hot-key-only spreading — the production
    skew guard): a frequency pass finds keys above the threshold, ONLY
    those spread across salts and replicate the small side's matching rows;
    cold keys join unsalted. Result must equal the plain join — the oracle
    IS the plain join. Salt is a deterministic row hash, so speculative /
    retried tasks salt identically. (Blanket salting — salted_join — is the
    simpler fallback, equivalence-tested in tests/test_suite_ops.py.)"""
    from database_anonymiser_spark.operators.skew import targeted_salted_join

    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = targeted_salted_join(
        li, s, on="l_suppkey", salt=8, hot_threshold=500, salt_cols=("l_quantity",)
    )
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"), dsum("l_quantity").alias("sum_qty")
    )


# ---------------------------------------------------------------- SQL front door


_CTE_SQL = """
    WITH big_spenders AS (
      SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, b.spend
    FROM customer c
    JOIN big_spenders b ON b.o_custkey = c.c_custkey
    WHERE b.spend > (SELECT CAST(avg(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 2
                     FROM orders)
      AND EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
"""


@register("sql_cte_scalar", _CTE_SQL, tags=("sql",))
def sql_cte_scalar(spark, sf_dir):
    """The SQL front door: the engine accepts full ANSI SQL (CTE + scalar
    subquery + correlated EXISTS) over registered views — the oracle IS the
    same SQL text, proving spark.sql and the DataFrame API share one
    Catalyst surface. Scalar subquery executes once (one-row broadcast);
    EXISTS compiles to left-semi."""
    for t in ("customer", "orders", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CTE_SQL)


_Q6_SQL = f"""
    SELECT {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))', 6)} AS metric
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""

_Q14_SQL = f"""
    SELECT 100.00 * {dsum_sql("CASE WHEN p_type LIKE 'ECONOMY%' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4)) END", 6)}
           / {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))', 6)} AS metric
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


@register(
    "tpch_q6_q14",
    f"""
    SELECT 'q6_revenue' AS q, metric FROM ({_Q6_SQL})
    UNION ALL
    SELECT 'q14_promo_revenue' AS q, metric FROM ({_Q14_SQL})
    """,
    tags=("flagship", "agg", "join"),
)
def tpch_q6_q14(spark, sf_dir):
    """TPC-H Q6 + Q14, each a single-row metric, tagged and unioned.

    Q6 (forecast revenue change): pure filter + global agg — the query where
    predicate pushdown IS the plan; all four predicates reach the parquet
    scan, the aggregation is one partial/final pair over survivors.

    Q14 (promo revenue): conditional-ratio aggregation over a fact-dim
    join; part is the small side — broadcast, so the month of lineitem
    never shuffles. (Fixture p_type has no 'PROMO%' values — the promo
    class is 'ECONOMY%'; same LIKE-prefix predicate shape. Both sums run in
    exact decimal; each final division is one IEEE op, identical in both
    engines.)
    """
    li = load(spark, sf_dir, "lineitem")
    rev6 = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_discount").cast("decimal(18,4)")
    ).cast("decimal(18,6)")
    q6 = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev6).cast("double").alias("metric"))
        .select(F.lit("q6_revenue").alias("q"), "metric")
    )
    li14 = li.where(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    )
    q14 = (
        li14.join(F.broadcast(p), li14.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type").like("ECONOMY%"), disc), 6)
                / dsum(disc, 6)
            ).alias("metric")
        )
        .select(F.lit("q14_promo_revenue").alias("q"), "metric")
    )
    return q6.unionByName(q14)


@register(
    "tpch_q18",
    f"""
    SELECT o.o_orderkey, o.o_custkey, {dsum_sql('l.l_quantity')} AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    HAVING {dsum_sql('l.l_quantity')} > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    tags=("flagship", "join", "agg"),
)
def tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): join → agg → HAVING →
    top-k. The HAVING filter runs post-aggregation on the reduced group
    set; the final 20 rows come from per-partition heaps."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------- applyInPandas


@register(
    "pandas_grouped_norm",
    """
    SELECT o_orderkey, o_custkey,
           round(CASE WHEN mx = mn THEN 0.5
                      ELSE (o_totalprice - mn) / (mx - mn) END, 6) AS price_norm
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             min(o_totalprice) OVER (PARTITION BY o_custkey) AS mn,
             max(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
      FROM orders
    )
    """,
    tags=("udf", "pandas"),
)
def pandas_grouped_norm(spark, sf_dir):
    """applyInPandas grouped transform (SURVEY.md §2.11 UDF surface):
    per-customer min-max normalisation — min/max are order-independent (no
    stddev: Welford accumulation is partition-order dependent and would
    break cross-engine hashing), so even the Python path is value-hash
    checked. One shuffle on the grouping key, Arrow both ways."""
    import pandas as pd

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        rng = mx - mn
        out = pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "price_norm": ((pdf["o_totalprice"] - mn) / rng if rng != 0 else 0.5),
            }
        )
        out["price_norm"] = out["price_norm"].round(6)
        return out

    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").applyInPandas(
        norm, "o_orderkey long, o_custkey long, price_norm double"
    )


def _bloom_oracle(m_bits: int = 1 << 16, k: int = 4) -> str:
    """Replay the bloom construction in set form: the bitmap's bit b is set
    iff some build key hashes to b, so membership-against-bitmap ≡
    membership-in-the-distinct-position-set — false positives (distinct
    keys colliding on all k positions) reproduce exactly because the md5
    hash family is identical."""
    # one md5 → 60-bit v, Kirsch-Mitzenmacher (h1 + i*h2) % m — the same
    # derivation operators/bloom.py compiles to Spark expressions
    v_sql = "('0x' || substr(md5('bloom:' || CAST({key} AS VARCHAR)), 1, 15))::BIGINT"
    hash_sql = (
        f"((({v_sql}) % 1073741824) + i * ((({v_sql}) >> 30) * 2 + 1)) % {m_bits}"
    )
    return f"""
    WITH ks AS (SELECT unnest(range(0, {k})) AS i),
    bld AS (
      SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 400000.0
    ),
    bpos AS (
      SELECT DISTINCT {hash_sql.format(key='o_orderkey')} AS p
      FROM bld, ks
    ),
    ppos AS (
      SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
             {hash_sql.format(key='l.l_orderkey')} AS p
      FROM lineitem l, ks
    ),
    miss AS (
      SELECT DISTINCT l_orderkey, l_linenumber
      FROM ppos WHERE NOT EXISTS (SELECT 1 FROM bpos WHERE bpos.p = ppos.p)
    ),
    passed AS (
      SELECT l.l_returnflag
      FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM miss m
                        WHERE m.l_orderkey = l.l_orderkey
                          AND m.l_linenumber = l.l_linenumber)
    ),
    b AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS bloom_rows
          FROM passed GROUP BY l_returnflag),
    e AS (SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS exact_rows
          FROM lineitem l JOIN bld ON l.l_orderkey = bld.o_orderkey
          GROUP BY l.l_returnflag)
    SELECT b.l_returnflag, b.bloom_rows, e.exact_rows
    FROM b JOIN e ON b.l_returnflag = e.l_returnflag
    """


@register("join_bloom", _bloom_oracle(), tags=("join", "scale"))
def join_bloom(spark, sf_dir):
    """Bloom-filter semi-join pruning (operators/bloom.py): the broadcast
    runtime-filter shape made explicit — high-value orders' keys compress
    to an 8 KB bitmap literal; lineitem is reduced MAP-SIDE (the plan is
    Scan → codegen Filter, zero shuffle of the probe side — the property
    the 100 TB fact-reduction case needs). Output: per returnflag the
    bloom-passed row count alongside the exact semi-join count, so the
    (tiny, deterministic) false-positive overhead is itself value-hash
    checked — the oracle replays the identical md5 hash family over the
    position set, reproducing every false positive."""
    from database_anonymiser_spark.operators.bloom import bloom_semi_join
    from database_anonymiser_spark.operators.parallel import scan_floor

    orders = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000.0)
    # r15 (guide §2.5/§6 input-parallelism floor): the fixture is ONE
    # parquet row group, so the md5 probe chain — the query's compute
    # bulk — would evaluate on a single task regardless of core count.
    # The probe FILTER would sink through a bare repartition, so this is
    # scan_floor's cache-barrier form. Projected to the two live columns
    # first so the barrier materializes 2 narrow columns, shared by BOTH
    # branches (the exact twin previously re-scanned the table).
    # Interleaved A/B at sf0.1: probe+agg 3.6s single-task → 1.3s wide.
    # At 100 TB the scan has natural parallelism and the floor is a no-op.
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    li = scan_floor(li, barrier_slot="join_bloom.probe")
    passed = bloom_semi_join(li, "l_orderkey", orders, "o_orderkey")
    bloom_agg = passed.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("bloom_rows")
    )
    # no .distinct() on the build side: left-semi join semantics already
    # deduplicate — the distinct only added an Exchange + HashAggregate
    # pair before the broadcast (guide §2.4, r15)
    exact_agg = (
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_rows"))
    )
    return bloom_agg.join(exact_agg, "l_returnflag")
