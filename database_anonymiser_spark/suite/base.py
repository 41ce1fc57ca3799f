"""Registry + shared helpers for the declared query suite."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = ()


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under a query name."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, tags=tags)
        return fn

    return deco


_DF_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one fixture table with the engine's parquet repairs.

    Sets the session confs the suite depends on (runtime-settable SQL confs) —
    the driver may hand us a session built without them. The resulting
    DataFrame (an immutable logical plan) is cached per (application, path):
    repeated loads across the suite skip Spark's file-listing + footer
    schema-inference round trip. Keyed by applicationId, not id(session) —
    CPython reuses id() values after GC, so a stopped-and-recreated session
    could alias a dead session's stale py4j plan (the round-4 advice bug
    class fixed in operators/text.py); other applications' entries are
    evicted so the cache never outgrows one session's tables.
    """
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        app_id = None  # context stopped/absent — skip caching
    key = (app_id, sf_dir, table)
    if app_id is not None:
        for k in [k for k in _DF_CACHE if k[0] != app_id]:
            del _DF_CACHE[k]
        hit = _DF_CACHE.get(key)
        if hit is not None:
            return hit
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    from database_anonymiser_spark.catalog import read_parquet_table

    df = read_parquet_table(spark, f"{sf_dir}/{table}.parquet")
    if app_id is not None:
        _DF_CACHE[key] = df
    return df


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent double sum: sum in exact decimal, cast once to double.

    Plain ``sum(double)`` is partition-order dependent (IEEE addition is not
    associative) and would hash-mismatch any oracle; summing in decimal makes
    the result independent of Spark's partitioning/AQE choices at every scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
