"""Second relational extension pack: TPC-H Q1, pivot, grouping sets,
range-frame windows, UDTF-style explode, and null-handling scalars.

All capability extensions over the reference (which has no query surface —
SURVEY.md §2.4-§2.9); every query here is fully DuckDB-oracle checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from database_anonymiser_spark.suite.base import dsum, dsum_sql, load, register


@register(
    "tpch_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))', 6)} AS sum_disc_price,
           CAST(round(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4)) AS DECIMAL(18,6)) * CAST(1.0 + l_tax AS DECIMAL(18,4)) AS DECIMAL(18,10))), 6) AS DOUBLE) AS sum_charge,
           {dsum_sql('l_quantity')} / count(*) AS avg_qty,
           {dsum_sql('l_extendedprice')} / count(*) AS avg_price,
           {dsum_sql('l_discount', 4)} / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("flagship", "agg"),
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary): the canonical scan-heavy aggregation.

    Scale: one pass over lineitem, 4-group output — partial aggregation
    collapses each partition to ≤4 rows before the (trivial) shuffle, so the
    query is pure scan bandwidth at any SF. Averages divide the exact decimal
    sum by the group count (one IEEE op) instead of avg(double), which is
    partition-order dependent.
    """
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc_price = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    )
    charge = disc_price.cast("decimal(18,6)") * (F.lit(1.0) + F.col("l_tax")).cast(
        "decimal(18,4)"
    )
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            # scale-10 sums exceed double's 15-16 significant digits at this
            # magnitude, and DuckDB's int128→double conversion is then off by
            # an ulp vs Spark's BigDecimal — round in decimal space first
            F.round(F.sum(charge.cast("decimal(18,10)")), 6).cast("double").alias("sum_charge"),
            (dsum("l_quantity") / cnt).alias("avg_qty"),
            (dsum("l_extendedprice") / cnt).alias("avg_price"),
            (dsum("l_discount", 4) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_pivot",
    f"""
    SELECT l_returnflag,
           {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
           {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark, sf_dir):
    """Pivot (long → wide): one output column per pivoted key value.

    Scale: with the value list given explicitly, pivot compiles to plain
    conditional aggregation (exactly the oracle SQL) — one shuffle on the
    groupBy key, no second pass to discover distinct pivot values.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_f"),
            F.col("O").alias("qty_o"),
        )
    )


_GROUPING_SETS_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("agg_grouping_sets", _GROUPING_SETS_SQL, tags=("agg", "sql"))
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS through the SQL front door (complements agg_cube /
    agg_rollup, which use the DataFrame API): one shuffle computes all three
    granularities via Catalyst's Expand node, not three scans."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "window_range_frame",
    """
    WITH d AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_num,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    )
    SELECT o_orderkey, o_custkey, day_num,
           CAST(sum(price) OVER (
             PARTITION BY o_custkey ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_7d_spend
    FROM d
    """,
    tags=("window", "timeseries"),
)
def window_range_frame(spark, sf_dir):
    """RANGE-framed window (value-based frame, vs the ROWS frames in
    window_running_sum): 7-day rolling spend per customer.

    Scale: one shuffle on o_custkey, per-partition sort on day_num; the
    range frame is evaluated with a sliding two-pointer pass, not O(n²).
    Peers (same customer, same day) share a frame, so the sum is set-based
    and deterministic; summing in decimal keeps it order-independent.
    """
    o = load(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias(
            "day_num"
        ),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    w = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-6, 0)
    return d.select(
        "o_orderkey",
        "o_custkey",
        "day_num",
        F.sum("price").over(w).cast("double").alias("rolling_7d_spend"),
    )


@register(
    "func_explode",
    r"""
    SELECT doc_id,
           unnest(list_transform(
             string_split_regex(trim(text), '\s+'),
             (x, i) -> struct_pack(pos := CAST(i - 1 AS BIGINT), token := x)
           ), recursive := true)
    FROM documents
    """,
    tags=("function", "udtf"),
)
def func_explode(spark, sf_dir):
    """UDTF surface (SURVEY.md §2.11): posexplode as the built-in generator —
    one input row fans out to one row per token with its 0-based position.

    Scale: generators run inside whole-stage codegen with no shuffle; output
    cardinality is corpus tokens (linear), never materialised on the driver.
    """
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "token"),
    ).withColumn("pos", F.col("pos").cast("long"))


@register(
    "func_null",
    """
    SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) AS disc_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_filled,
           CASE WHEN nullif(l_discount, 0.0) IS NOT NULL THEN 'discounted' ELSE 'full price' END AS disc_label,
           ifnull(nullif(l_tax, 0.0), 0.0) AS tax_or_zero
    FROM lineitem
    """,
    tags=("function", "null"),
)
def func_null(spark, sf_dir):
    """Null-handling scalar pack: nullif / coalesce / nvl2-style labelling /
    ifnull — all Catalyst built-ins folded into one codegen'd projection."""
    li = load(spark, sf_dir, "lineitem")
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_null.alias("disc_or_null"),
        F.coalesce(disc_null, F.lit(-1.0)).alias("disc_filled"),
        F.nvl2(disc_null, F.lit("discounted"), F.lit("full price")).alias("disc_label"),
        F.ifnull(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(0.0)).alias("tax_or_zero"),
    )


@register(
    "tpch_q4",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1994-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("flagship", "join", "agg"),
)
def tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS as a
    left-semi join, then a small group-count. (The fixture lineitem has no
    l_commitdate/l_receiptdate — TESTDATA.md — so the EXISTS predicate is
    l_discount > 0.05 on the same tables; the plan shape is identical.)

    Scale: the date filter prunes orders at the scan; the semi join shuffles
    only (l_orderkey) pairs — lineitem is projected to one column and
    deduplicated by the semi join itself, never materialised wide.
    """
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1994-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q14",
    f"""
    SELECT 100.00 * {dsum_sql("CASE WHEN p_type LIKE 'ECONOMY%' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4)) END", 6)}
           / {dsum_sql('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4))', 6)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
    tags=("flagship", "join", "agg"),
)
def tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promo revenue): conditional-ratio aggregation over a
    fact-dim join. (Fixture p_type has no 'PROMO%' values — the promo class
    is 'ECONOMY%'; same LIKE-prefix predicate shape.)

    Scale: part is the small side — broadcast, so the month of lineitem never
    shuffles; both sums run in exact decimal and the single ratio division is
    one IEEE op, identical in both engines.
    """
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type").like("ECONOMY%"), disc), 6)
                / dsum(disc, 6)
            ).alias("promo_revenue")
        )
    )
