"""Declared queries for the masking-strategy operators T1–T7 (SURVEY.md §2.3)
and the end-to-end anonymisation pipeline (the flagship query).

All strategies run over ``customer`` string columns; the flagship exercises
the real engine path (plan → type-safety normalize → masked projection),
including a deliberate downgrade (REDACT on a NUMBER column → KEEP).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_anonymiser_spark import strategies as S
from database_anonymiser_spark.suite.base import load, register


@register(
    "mask_keep",
    "SELECT c_custkey, c_name FROM customer",
    tags=("masking",),
)
def mask_keep(spark, sf_dir):
    df = load(spark, sf_dir, "customer")
    return df.select("c_custkey", S.keep(F.col("c_name")).alias("c_name"))


@register(
    "mask_set_null",
    "SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_mktsegment FROM customer",
    tags=("masking",),
)
def mask_set_null(spark, sf_dir):
    df = load(spark, sf_dir, "customer")
    return df.select("c_custkey", S.set_null(F.col("c_mktsegment"), "string").alias("c_mktsegment"))


@register(
    "mask_redact",
    "SELECT c_custkey, '***' AS c_mktsegment FROM customer",
    tags=("masking",),
)
def mask_redact(spark, sf_dir):
    df = load(spark, sf_dir, "customer")
    return df.select("c_custkey", S.redact(F.col("c_mktsegment")).alias("c_mktsegment"))


@register(
    "mask_hash",
    "SELECT c_custkey, md5(coalesce(c_name, '')) AS c_name_hash FROM customer",
    tags=("masking",),
)
def mask_hash(spark, sf_dir):
    df = load(spark, sf_dir, "customer")
    return df.select("c_custkey", S.hash_md5(F.col("c_name")).alias("c_name_hash"))


@register(
    "mask_truncate",
    "SELECT c_custkey, substr(coalesce(c_name, ''), 1, 4) AS c_name_trunc FROM customer",
    tags=("masking",),
)
def mask_truncate(spark, sf_dir):
    df = load(spark, sf_dir, "customer")
    return df.select("c_custkey", S.truncate(F.col("c_name"), 4).alias("c_name_trunc"))


@register(
    "mask_email_fake",
    "SELECT c_custkey, md5(coalesce(c_name, '')) || '@example.com' AS c_email FROM customer",
    tags=("masking",),
)
def mask_email_fake(spark, sf_dir):
    df = load(spark, sf_dir, "customer")
    return df.select("c_custkey", S.email_fake(F.col("c_name")).alias("c_email"))


@register(
    "mask_sample_preview",
    """
    SELECT c_custkey,
           CASE WHEN length(c_name) <= 6 THEN '***'
                ELSE substr(c_name, 1, 2) || '***' || substr(c_name, length(c_name) - 1, 2)
           END AS c_name_masked
    FROM customer
    """,
    tags=("masking",),
)
def mask_sample_preview(spark, sf_dir):
    df = load(spark, sf_dir, "customer")
    return df.select("c_custkey", S.mask_sample_preview(F.col("c_name")).alias("c_name_masked"))


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
