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


@register(
    "mm_extract_features",
    # Reproduces the Python fake kernels exactly (ASCII fixture text, so
    # character slicing == byte slicing): frame i = payload[i*step:(i+1)*step]
    # with step = max(len//4, 1); features are md5-derived. The whole
    # mapInPandas chain is therefore value-hash checked, not rows-only.
    """
    WITH f AS (
      SELECT doc_id, i AS frame_idx,
             substr(text, i * greatest(length(text) // 4, 1) + 1,
                    greatest(length(text) // 4, 1)) AS chunk
      FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
    ),
    rz AS (
      SELECT doc_id,
             CAST(64 + CAST('0x' || substr(md5(text), 1, 2) AS INTEGER) % 192 AS INTEGER) AS orig_width,
             CAST(64 + CAST('0x' || substr(md5(text), 3, 2) AS INTEGER) % 192 AS INTEGER) AS orig_height,
             CAST(224 AS INTEGER) AS width,
             CAST(224 AS INTEGER) AS height
      FROM documents
    )
    SELECT f.doc_id, frame_idx,
           CAST(length(chunk) AS BIGINT) AS n_bytes,
           ('0x' || substr(md5(chunk), 1, 8))::BIGINT AS checkval,
           CAST(CASE WHEN length(chunk) = 0 THEN -1
                ELSE ascii(substr(chunk, 1, 1)) END AS INTEGER) AS head_byte,
           CAST(64 + ('0x' || substr(md5(chunk), 1, 2))::INTEGER % 192 AS INTEGER) AS fake_width,
           CAST(64 + ('0x' || substr(md5(chunk), 3, 2))::INTEGER % 192 AS INTEGER) AS fake_height,
           rz.orig_width, rz.orig_height, rz.width, rz.height
    FROM f JOIN rz ON f.doc_id = rz.doc_id
    """,
    tags=("multimodal",),
)
def mm_extract_features(spark, sf_dir):
    """The full mapInPandas pipeline chained shuffle-free: 1→N frame
    sampling, then per-frame feature extraction (frame_idx passed through),
    JOINED with the per-doc resize metadata (absorbed from mm_resize_meta,
    round-5 consolidation — the driver's gate checks the 50 alphabetically-
    first entries). The fake-decoder outputs are md5-/byte-arithmetic, so
    both Arrow paths stay value-hash checked against DuckDB."""
    docs = load(spark, sf_dir, "documents")
    payloads = MM.attach_binary_payload(docs, "doc_id", "text")
    frames = MM.sample_frames(payloads, "doc_id", "payload", n_frames=4)
    feats = MM.extract_features(
        frames, "doc_id", "frame_payload", passthrough=("frame_idx",)
    )
    resized = MM.resize_payloads(payloads, "doc_id", "payload", 224, 224).select(
        "doc_id", "orig_width", "orig_height", "width", "height"
    )
    return feats.join(resized, "doc_id")


# mm_resize_meta is packed into mm_extract_features (round-5 consolidation).
