"""Multimodal column plumbing: binary payloads + typed metadata.

Design (SURVEY.md §2 extension; the reference is text/SQL-only): media
travels as an opaque ``binary`` column plus typed metadata columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages. The image/audio libraries aren't in this container, so the decode
kernels are STUBS — ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless the deterministic fake is requested — but the
Spark-side plumbing (schema, batch iteration, partitioning, UDF signatures)
is real and tested.

100 TB posture: binary payloads dominate size → never groupBy/shuffle them;
mapInPandas keeps work partition-local (no shuffle at all), Arrow moves each
batch once, and metadata-only queries prune the binary column at the parquet
scan (column pruning keeps payload IO at zero unless bytes are touched).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checkval", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo payload builder: utf-8 bytes of the text column as the opaque
    binary + typed metadata (media_type, n_bytes). In production the binary
    arrives from the source (parquet/webdataset); only the metadata shape
    matters here."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _imaging():
    """PIL if importable, else None (this container has no imaging libs;
    a real deployment gets the real kernels with zero code changes)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _audio():
    """soundfile if importable, else None."""
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except ImportError:
        return None


def decode_image(data: bytes) -> "object":
    """Real decode when PIL exists (round 10 — was an unconditional
    stub): returns a loaded ``PIL.Image``. Without an imaging library
    the honest ``NotImplementedError`` stands — callers wanting the
    deterministic fake use the feature kernels' default path."""
    img_mod = _imaging()
    if img_mod is None:
        raise NotImplementedError(
            "image decode requires an imaging library at runtime "
            "(pip install pillow); the deterministic fake kernels cover "
            "this container"
        )
    import io

    img = img_mod.open(io.BytesIO(data))
    img.load()
    return img


def decode_audio(data: bytes) -> "object":
    """Real decode when soundfile exists (round 10): returns
    ``(samples ndarray, sample_rate)``. Otherwise the honest stub."""
    sf_mod = _audio()
    if sf_mod is None:
        raise NotImplementedError(
            "audio decode requires an audio library at runtime "
            "(pip install soundfile); the deterministic fake kernels "
            "cover this container"
        )
    import io

    return sf_mod.read(io.BytesIO(data))


def _fake_decode_features(data: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic fake decode: byte stats + pseudo-dimensions derived from
    a stable digest — stands in for (width, height) of a real decoder.

    Every value is md5-/byte-arithmetic so an independent ANSI-SQL engine
    reproduces the whole feature row (checkval is the digest's first 4 bytes
    as an integer, not a crc32 — DuckDB has md5 but no crc32), which is what
    lets the full mapInPandas path be value-hash checked end to end.
    """
    digest = hashlib.md5(data).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    return (
        len(data),
        int.from_bytes(digest[:4], "big"),
        data[0] if data else -1,
        width,
        height,
    )


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    passthrough: tuple[str, ...] = (),
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    Partition-local (zero shuffle); each Arrow batch crosses the JVM↔Python
    boundary exactly once. ``passthrough`` columns (e.g. a frame index when
    chaining after :func:`sample_frames`) are carried through unchanged, so
    per-frame feature extraction composes shuffle-free.

    ``decoder``: ``"fake"`` (default) is the deterministic digest kernel —
    the oracle-checked path that works in any container. ``"image"``
    (round 10) decodes each payload with PIL and reports the REAL
    (width, height) in the same schema slots; it refuses at PLAN time
    when no imaging library is importable (driver-side check — a missing
    executor lib would otherwise surface as a mid-job task failure).
    """
    if decoder not in ("fake", "image"):
        raise ValueError("decoder must be 'fake' or 'image'")
    if decoder == "image" and _imaging() is None:
        raise NotImplementedError(
            "decoder='image' requires an imaging library (pip install "
            "pillow); the deterministic 'fake' kernel covers this container"
        )
    in_fields = {f.name: f for f in df.schema.fields}
    missing = [c for c in passthrough if c not in in_fields]
    if missing:
        raise ValueError(f"passthrough columns not in input: {missing}")
    clashes = sorted({c for c in passthrough} & {f.name for f in FEATURE_SCHEMA.fields})
    if clashes:
        # a silent duplicate-name schema breaks downstream selects (ADVICE r2)
        raise ValueError(f"passthrough columns collide with feature fields: {clashes}")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [in_fields[c] for c in passthrough]
        + [f for f in FEATURE_SCHEMA.fields if f.name != "doc_id"]
    )

    def _real_image_features(data: bytes) -> tuple[int, int, int, int, int]:
        digest = hashlib.md5(data).digest()
        try:
            w, h = decode_image(data).size
        except Exception:
            w = h = -1  # undecodable payload: dims are sentinel, row kept
        return (
            len(data),
            int.from_bytes(digest[:4], "big"),
            data[0] if data else -1,
            int(w),
            int(h),
        )

    kernel = _fake_decode_features if decoder == "fake" else _real_image_features

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [kernel(b if b is not None else b"") for b in pdf[payload_col]]
            out = {"doc_id": pdf[id_col].astype("int64")}
            for c in passthrough:
                out[c] = pdf[c]
            out.update(
                {
                    "n_bytes": pd.Series([f[0] for f in feats], dtype="int64"),
                    "checkval": pd.Series([f[1] for f in feats], dtype="int64"),
                    "head_byte": pd.Series([f[2] for f in feats], dtype="int32"),
                    "fake_width": pd.Series([f[3] for f in feats], dtype="int32"),
                    "fake_height": pd.Series([f[4] for f in feats], dtype="int32"),
                }
            )
            yield pd.DataFrame(out)

    return df.select(id_col, *passthrough, payload_col).mapInPandas(batches, schema)


def binary_meta(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Metadata over the payload with built-ins only (no Python): byte length
    + md5 digest — the query a 100 TB pipeline runs for integrity checks."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("orig_width", T.IntegerType()),
        T.StructField("orig_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 224,
    target_h: int = 224,
    kernel: str = "fake",
) -> DataFrame:
    """Resize plumbing via mapInPandas: decode → resample → re-encode, one
    Arrow crossing per batch, partition-local (zero shuffle).

    ``kernel="fake"`` (default, works anywhere): deterministic
    digest-derived dims + pixel buffer sized w*h*3. ``kernel="pil"``
    (round 10): PIL decode → ``Image.resize`` → PNG re-encode with the
    real original dims; refused at plan time when no imaging library is
    importable. Signatures and batch shape are identical either way.
    """
    if kernel not in ("fake", "pil"):
        raise ValueError("kernel must be 'fake' or 'pil'")
    if kernel == "pil" and _imaging() is None:
        raise NotImplementedError(
            "kernel='pil' requires an imaging library (pip install "
            "pillow); the deterministic 'fake' kernel covers this container"
        )

    def fake_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf_len = target_w * target_h * 3
        for pdf in it:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[payload_col]):
                data = data if data is not None else b""
                digest = hashlib.md5(data).digest()
                ow = 64 + digest[0] % 192
                oh = 64 + digest[1] % 192
                fake_pixels = (digest * (buf_len // len(digest) + 1))[:buf_len]
                rows.append((int(doc_id), fake_pixels, ow, oh, target_w, target_h))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "orig_width", "orig_height", "width", "height"]
            )

    def pil_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[payload_col]):
                data = data if data is not None else b""
                try:
                    img = decode_image(data)
                    ow, oh = img.size
                    buf = io.BytesIO()
                    img.resize((target_w, target_h)).save(buf, format="PNG")
                    payload = buf.getvalue()
                except Exception:
                    payload, ow, oh = b"", -1, -1  # undecodable: sentinel row
                rows.append(
                    (int(doc_id), payload, int(ow), int(oh), target_w, target_h)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "orig_width", "orig_height", "width", "height"]
            )

    batches = fake_batches if kernel == "fake" else pil_batches
    return df.select(id_col, payload_col).mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 4,
) -> DataFrame:
    """Frame sampling plumbing: one video payload row → ``n_frames`` frame
    rows (the 1→N mapInPandas shape a real ffmpeg frame sampler has).

    The fake kernel slices the payload into equal chunks standing in for
    decoded frames; a real sampler seeks keyframes instead. Output rows
    stay on the producing partition — downstream per-frame transforms
    (resize, embed) chain shuffle-free.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[payload_col]):
                data = data if data is not None else b""
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step]
                    rows.append((int(doc_id), i, chunk, len(chunk)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_payload", "frame_bytes"]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


#: byte-histogram embedding bins (256 byte values folded into 32 bins)
HIST_BINS = 32


def byte_histogram_embeddings(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL (not stubbed) content fingerprint over binary payloads: an
    L2-normalized 32-bin byte histogram per payload — the byte-level
    stand-in for a perceptual hash (pHash needs the decoder the container
    lacks; the histogram works on the actual bytes TODAY, and a real
    deployment swaps this map function for pHash/CLIP features with the
    identical Spark plumbing — same schema, same Arrow batching, same
    downstream near-dup machinery).

    Byte-identical payloads map to identical embeddings; re-ordered or
    locally-corrupted copies (the media near-dup classes a crawl sees:
    re-muxed containers, appended metadata) stay high-cosine because the
    byte DISTRIBUTION moves slowly under those edits. Arrow-batched
    mapInPandas, zero shuffle; output (id, embedding array<double>)
    drops straight into the similarity operators."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, data in zip(pdf[id_col], pdf[payload_col]):
                data = data if data is not None else b""
                if data:
                    arr = np.frombuffer(data, dtype=np.uint8)
                    h = np.bincount(arr // (256 // HIST_BINS), minlength=HIST_BINS)
                    h = h.astype(np.float64)
                    n = np.linalg.norm(h)
                    h = h / n if n > 0 else h
                else:
                    h = np.zeros(HIST_BINS)
                out.append((int(doc_id), [round(float(x), 6) for x in h]))
            yield pd.DataFrame(out, columns=["doc_id", "embedding"])

    return df.select(id_col, payload_col).mapInPandas(batches, schema)


def media_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    threshold: float = 0.98,
    use_lsh: bool = False,
) -> DataFrame:
    """Near-duplicate MEDIA pairs: byte-histogram embeddings piped into
    the engine's embedding near-dup operators — the multimodal analogue
    of MinHash document dedup. ``use_lsh=True`` takes the hyperplane-LSH
    blocked path (the 100 TB shape: candidates ∝ collisions, never n²);
    the default exact path keeps the brute-force row-cap safeguard.
    Returns (id_a, id_b, cosine ≥ threshold)."""
    from database_anonymiser_spark.operators.similarity import (
        cosine_lsh_pairs,
        cosine_pairs,
    )

    emb = byte_histogram_embeddings(df, id_col, payload_col)
    if use_lsh:
        return cosine_lsh_pairs(
            emb, "doc_id", "embedding", threshold=threshold, dim=HIST_BINS
        )
    return cosine_pairs(emb, "doc_id", "embedding", threshold=threshold)
