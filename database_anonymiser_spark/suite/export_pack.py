"""Declared entry for the training-shard export assignment
(operators/export.py) — the deterministic global shuffle under the
cross-engine oracle.

The WRITER half (one-file-per-shard layout, manifest, atomic promote,
verify) is filesystem-effect territory and is pinned in
tests/test_export.py; what the oracle can and should hash-check is the
pure function the writer is built on: shard = md5(salt||id) mod N and
the within-shard position ordered by the second hash. A DuckDB replay of
both proves the export's content placement — which rows land in which
shard, in which order — without materializing files in the gate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from database_anonymiser_spark.operators.export import shard_assign
from database_anonymiser_spark.suite.base import load, register

_N_SHARDS = 8
_SALT = "shard-v1"


@register(
    "shard_export",
    f"""
    SELECT doc_id, shard, CAST(pos AS INTEGER) AS pos FROM (
      SELECT doc_id,
             ('0x' || substr(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % {_N_SHARDS} AS shard,
             row_number() OVER (
               PARTITION BY ('0x' || substr(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                              % {_N_SHARDS}
               ORDER BY ('0x' || substr(md5('{_SALT}#ord' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                        doc_id
             ) - 1 AS pos
      FROM documents
    )
    """,
    tags=("export", "shuffle"),
)
def shard_export(spark, sf_dir):
    """Training-shard assignment over the documents corpus: every doc's
    (shard, within-shard position) under the md5 family at 8 shards —
    the exact placement `export_training_shards` writes.

    The declared query pays the same single hash-partition shuffle as
    the writer (the window's partitionBy on shard), never a global sort;
    `pos` here is the dense rank the writer realizes implicitly via
    ``sortWithinPartitions`` (rank materialized only for the oracle
    comparison — production exports skip the window entirely)."""
    docs = load(spark, sf_dir, "documents")
    a = shard_assign(docs, "doc_id", _N_SHARDS, salt=_SALT, hash_family="md5")
    w = Window.partitionBy("shard").orderBy("_ord", "doc_id")
    return a.select(
        "doc_id", "shard", (F.row_number().over(w) - 1).alias("pos")
    )
