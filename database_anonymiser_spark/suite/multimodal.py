"""Declared multimodal-plumbing queries (SURVEY.md §2 ext).

``mm_binary_meta`` is the built-in-only integrity path (oracle-checked);
``mm_extract_features`` exercises the Arrow/mapInPandas decode plumbing with
the deterministic fake decoder (rows-only — DuckDB has no mapInPandas twin;
the values themselves are pinned in tests/test_suite_ops.py).
"""

from __future__ import annotations

from database_anonymiser_spark.operators import multimodal as MM
from database_anonymiser_spark.suite.base import load, register


@register(
    "mm_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
    tags=("multimodal",),
)
def mm_binary_meta(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return MM.binary_meta(docs, "doc_id", "text")


@register("mm_extract_features", None, tags=("multimodal",))
def mm_extract_features(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    payloads = MM.attach_binary_payload(docs, "doc_id", "text")
    return MM.extract_features(payloads, "doc_id", "payload")
