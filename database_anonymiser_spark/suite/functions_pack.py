"""Declared scalar-function pack (SURVEY.md §2.9 extensions): string, date,
math, array, JSON — all JVM built-ins inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark.suite.base import load, register


@register(
    "func_string",
    """
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           trim(p_type) AS type_trim,
           regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
    tags=("function", "string"),
)
def func_string(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


# func_date is packed into func_math_null (round-5 consolidation - the
# driver's gate checks the 50 alphabetically-first entries): the same date
# built-ins now run over lineitem.l_shipdate in the same single projection.


@register(
    "func_math_null",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,4)), 2) AS DOUBLE) AS disc_price,
           abs(l_quantity - 25.0) AS qty_dev,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(power(l_quantity, 2) AS DOUBLE) AS qty_sq,
           nullif(l_discount, 0.0) AS disc_or_null,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_filled,
           CASE WHEN nullif(l_discount, 0.0) IS NOT NULL THEN 'discounted' ELSE 'full price' END AS disc_label,
           ifnull(nullif(l_tax, 0.0), 0.0) AS tax_or_zero,
           2 AS n_keys,
           CAST(l_extendedprice AS DOUBLE) AS price_val,
           CAST(l_quantity AS DOUBLE) AS qty_val,
           year(l_shipdate) AS ship_year,
           month(l_shipdate) AS ship_month,
           day(l_shipdate) AS ship_day,
           CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month_start,
           datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS days_since_1995
    FROM lineitem
    """,
    tags=("function", "math", "null", "map"),
)
def func_math_null(spark, sf_dir):
    """Math + null-handling + map scalar pack over lineitem: round/abs/
    floor/ceil/power, nullif/coalesce/nvl2/ifnull, and the map surface
    (create_map → map_keys/element_at round trip, projected back to scalars
    so the oracle needs no map type), plus the date pack (year/month/day,
    date_trunc, datediff — absorbed from func_date, round-5 consolidation)
    over l_shipdate — all Catalyst built-ins folded into one codegen'd
    projection (one scan, zero shuffles)."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1.0) - F.col("l_discount")).cast("decimal(18,4)")
    )
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity").cast("double"),
        F.lit("price"), F.col("l_extendedprice").cast("double"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc_price, 2).cast("double").alias("disc_price"),
        F.abs(F.col("l_quantity") - F.lit(25.0)).alias("qty_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        disc_null.alias("disc_or_null"),
        F.coalesce(disc_null, F.lit(-1.0)).alias("disc_filled"),
        F.nvl2(disc_null, F.lit("discounted"), F.lit("full price")).alias("disc_label"),
        F.ifnull(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(0.0)).alias("tax_or_zero"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, F.lit("price")).alias("price_val"),
        F.element_at(m, F.lit("qty")).alias("qty_val"),
        F.year("l_shipdate").cast("long").alias("ship_year"),
        F.month("l_shipdate").cast("long").alias("ship_month"),
        F.dayofmonth("l_shipdate").cast("long").alias("ship_day"),
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("ship_month_start"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_1995"),
    )


@register(
    "func_array",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(round(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)))), 4) AS DOUBLE) AS component_sum,
           CAST(list_max(embedding) AS DOUBLE) AS component_max
    FROM embeddings
    """,
    tags=("function", "array"),
)
def func_array(spark, sf_dir):
    # aggregate() folds left-to-right — order-deterministic; summing in
    # decimal keeps it engine-exact (same rationale as base.dsum). Round in
    # DECIMAL space (exact half-away-from-zero in both Spark and DuckDB)
    # BEFORE the double cast — round() on a double differs between engines
    # at half boundaries.
    e = load(spark, sf_dir, "embeddings")
    comp_sum = F.aggregate(
        "embedding",
        F.lit(0).cast("decimal(28,6)"),
        lambda acc, x: (acc + x.cast("decimal(18,6)")).cast("decimal(28,6)"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.round(comp_sum, 4).cast("double").alias("component_sum"),
        F.array_max("embedding").cast("double").alias("component_max"),
    )


@register(
    "func_json",
    """
    SELECT event_id,
           CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k_path,
           CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k_struct
    FROM events
    """,
    tags=("function", "json"),
)
def func_json(spark, sf_dir):
    """Both JSON APIs in one projection: get_json_object (path extraction)
    and from_json (typed struct parse) must agree on every row. The oracle
    uses a regexp so it needs no DuckDB JSON extension — same values."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_path"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_struct"),
    )
