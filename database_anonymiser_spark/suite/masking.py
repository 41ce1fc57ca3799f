"""Declared queries for the masking-strategy operators T1–T7 (SURVEY.md §2.3)
and the end-to-end anonymisation pipeline (the flagship query).

``mask_strategies`` applies every strategy (T1–T7 plus the real-SHA-256
extension) as one narrow projection over ``customer`` — the same single-select
shape the executor compiles a whole-table mask to, so one oracle row checks
the entire strategy compiler. The flagship exercises the real engine path
(plan → type-safety normalize → masked projection), including a deliberate
downgrade (REDACT on a NUMBER column → KEEP).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark import strategies as S
from database_anonymiser_spark.suite.base import load, register


@register(
    "mask_strategies",
    """
    SELECT c_custkey,
           c_name AS keep_name,
           CAST(NULL AS VARCHAR) AS null_mktsegment,
           '***' AS redact_mktsegment,
           md5(coalesce(c_name, '')) AS hash_name,
           sha256(coalesce(c_name, '')) AS sha256_name,
           substr(coalesce(c_name, ''), 1, 4) AS trunc_name,
           md5(coalesce(c_name, '')) || '@example.com' AS email_name,
           CASE WHEN length(c_name) <= 6 THEN '***'
                ELSE substr(c_name, 1, 2) || '***' || substr(c_name, length(c_name) - 1, 2)
           END AS preview_name
    FROM customer
    """,
    tags=("masking",),
)
def mask_strategies(spark, sf_dir):
    """All strategy compilers in one projection (query-builder.ts:21-51):
    T1 KEEP, T2 SET_NULL, T3 REDACT, T4 HASH (md5, faithful) + the
    HASH_SHA256_REAL extension (checked against DuckDB's sha256), T5
    TRUNCATE, T6 EMAIL_FAKE, T7 sample preview.

    Scale: one codegen'd select over the scan — zero shuffles, zero Python;
    identical plan shape to a production whole-table mask.
    """
    df = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return df.select(
        "c_custkey",
        S.keep(name).alias("keep_name"),
        S.set_null(F.col("c_mktsegment"), "string").alias("null_mktsegment"),
        S.redact(F.col("c_mktsegment")).alias("redact_mktsegment"),
        S.hash_md5(name).alias("hash_name"),
        S.hash_sha256(name).alias("sha256_name"),
        S.truncate(name, 4).alias("trunc_name"),
        S.email_fake(name).alias("email_name"),
        S.mask_sample_preview(name).alias("preview_name"),
    )


@register(
    "anonymise_customer",
    """
    SELECT c_custkey,
           md5(coalesce(c_name, '')) AS c_name,
           c_nationkey,
           c_acctbal,
           '***' AS c_mktsegment
    FROM customer
    """,
    tags=("masking", "pipeline"),
)
def anonymise_customer(spark, sf_dir):
    """Flagship: the full engine path (config → plan → normalize → project).

    The config asks for REDACT on c_acctbal (NUMBER) — the type-safety pass
    downgrades it to KEEP exactly like executor.ts:68-73, which the oracle
    encodes by keeping c_acctbal untouched.
    """
    from database_anonymiser_spark.catalog import ParquetCatalog
    from database_anonymiser_spark.config import config_from_dict
    from database_anonymiser_spark.executor import mask_table
    from database_anonymiser_spark.planner import build_plan

    cfg = config_from_dict(
        {
            "version": 1,
            "reviewed": True,
            "scope": {"schema": "public", "denylist": []},
            "column_strategy": {
                "c_name": "HASH_SHA256",
                "c_mktsegment": "REDACT",
                "c_acctbal": "REDACT",  # NUMBER → downgraded to KEEP
            },
            "rules": [
                {
                    "table": "public.customer",
                    "enabled": True,
                    "columns": [
                        {"name": "c_custkey"},
                        {"name": "c_name"},
                        {"name": "c_nationkey"},
                        {"name": "c_acctbal"},
                        {"name": "c_mktsegment"},
                    ],
                }
            ],
        }
    )
    plan = build_plan(cfg)
    catalog = ParquetCatalog(spark, sf_dir)
    masked, _active, _downgrades = mask_table(catalog, plan.tables[0])
    return masked
