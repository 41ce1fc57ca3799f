"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship anonymisation query; ``queries()`` /
``oracle_sql()`` expose the full declared suite from
``database_anonymiser_spark.suite`` (one entry per implemented operator from
SURVEY.md §2; oracle omitted only for genuinely non-SQL-expressible ops —
sketches with engine-specific internals, mapInPandas plumbing, plan/catalog
introspection).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_anonymiser_spark.suite import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full anonymisation pipeline
    over customer (config → plan → type-safety normalize → masked select)."""
    from database_anonymiser_spark.suite.masking import anonymise_customer

    return anonymise_customer(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in sorted(all_queries().items())
        if spec.oracle is not None
    }
