"""Training-shard export (operators/export.py): deterministic assignment,
one-file-per-shard layout, manifest integrity, atomic promote."""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from database_anonymiser_spark.operators.export import (
    MANIFEST_NAME,
    export_training_shards,
    read_shard,
    shard_assign,
    verify_shards,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc text {i} " * (1 + i % 7), 10 * (1 + i % 7)) for i in range(500)],
        "doc_id long, text string, n_tokens long",
    )


def test_shard_assign_deterministic_and_partition_independent(spark, docs):
    a = shard_assign(docs, "doc_id", 8).select("doc_id", "shard", "_ord")
    b = (
        shard_assign(docs.repartition(13), "doc_id", 8)
        .select("doc_id", "shard", "_ord")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    shards = {r["shard"] for r in a.select("shard").distinct().collect()}
    assert shards <= set(range(8)) and len(shards) == 8

    # both families valid; bad family rejected
    x = shard_assign(docs, "doc_id", 8, hash_family="xxhash64")
    assert x.where(~F.col("shard").between(0, 7)).count() == 0
    with pytest.raises(ValueError, match="hash_family"):
        shard_assign(docs, "doc_id", 8, hash_family="sha1")
    with pytest.raises(ValueError, match="n_shards"):
        shard_assign(docs, "doc_id", 0)


def test_export_layout_manifest_and_order(spark, docs, tmp_path):
    out = tmp_path / "export"
    m = export_training_shards(docs, str(out), "doc_id", n_shards=6)
    assert m["n_shards"] == 6 and m["total_rows"] == 500
    # one data file per shard directory (the single-task-per-shard write)
    for k in range(6):
        files = list((out / "data" / f"shard={k}").glob("*.parquet"))
        assert len(files) == 1, f"shard {k}: {files}"
    # manifest on disk equals the returned dict
    assert json.loads((out / MANIFEST_NAME).read_text()) == m
    # within-shard order is the _ord hash order (deterministic shuffle):
    # re-deriving the order from the assignment must match the file order
    got = [r["doc_id"] for r in read_shard(spark, str(out), 3).collect()]
    want = [
        r["doc_id"]
        for r in shard_assign(docs, "doc_id", 6, hash_family="xxhash64")
        .where(F.col("shard") == 3)
        .orderBy("_ord", "doc_id")
        .collect()
    ]
    assert got == want and len(got) > 0
    # verify passes; corrupting a shard fails it
    assert verify_shards(spark, str(out)) == {"ok": True, "mismatched": []}


def test_export_two_runs_identical_content(spark, docs, tmp_path):
    m1 = export_training_shards(docs, str(tmp_path / "a"), "doc_id", n_shards=5)
    m2 = export_training_shards(
        docs.repartition(17), str(tmp_path / "b"), "doc_id", n_shards=5
    )
    assert m1 == m2  # checksums cover full content, so this is content equality


def test_export_token_budget_sizing(spark, docs, tmp_path):
    total = docs.agg(F.sum("n_tokens")).first()[0]
    m = export_training_shards(
        docs,
        str(tmp_path / "t"),
        "doc_id",
        tokens_per_shard=total // 4 - 1,
        n_tokens_col="n_tokens",
    )
    assert m["n_shards"] == 5  # ceil(total / (total//4 - 1)) carries a remainder
    assert sum(s["n_tokens"] for s in m["shards"].values()) == total
    with pytest.raises(ValueError, match="exactly one"):
        export_training_shards(docs, str(tmp_path / "x"), "doc_id")
    with pytest.raises(ValueError, match="n_tokens_col"):
        export_training_shards(
            docs, str(tmp_path / "x"), "doc_id", tokens_per_shard=100
        )


def test_export_atomic_promote_and_overwrite(spark, docs, tmp_path):
    out = tmp_path / "e"
    export_training_shards(docs, str(out), "doc_id", n_shards=3)
    with pytest.raises(FileExistsError):
        export_training_shards(docs, str(out), "doc_id", n_shards=3)
    # overwrite swaps in a complete new export; no .staging/.old residue
    m = export_training_shards(
        docs.where(F.col("doc_id") < 100),
        str(out),
        "doc_id",
        n_shards=3,
        overwrite=True,
    )
    assert m["total_rows"] == 100
    assert verify_shards(spark, str(out))["ok"]
    residue = [p.name for p in tmp_path.iterdir() if p.name != "e"]
    assert residue == []
    # a crashed prior overwrite's leftover .old tree must not block the
    # next overwrite (it is garbage: its export already left `out`)
    (tmp_path / "e.old").mkdir()
    (tmp_path / "e.old" / "junk").write_text("x")
    m2 = export_training_shards(
        docs, str(out), "doc_id", n_shards=3, overwrite=True
    )
    assert m2["total_rows"] == 500 and not (tmp_path / "e.old").exists()


def test_verify_shards_detects_tamper(spark, docs, tmp_path):
    out = tmp_path / "v"
    export_training_shards(docs, str(out), "doc_id", n_shards=4)
    # drop one shard's file: rows/checksum mismatch reported for it
    victim = next((out / "data" / "shard=2").glob("*.parquet"))
    victim.unlink()
    r = verify_shards(spark, str(out))
    assert r["ok"] is False and r["mismatched"] == [2]


def test_curate_then_export_composition(spark, sf_dir, tmp_path):
    """The pipeline seam: curate_corpus's output feeds
    export_training_shards directly (token column included), the manifest
    accounts for every curated row and token, and the landed export
    verifies — the full corpus -> curated shards handoff in one flow."""
    from database_anonymiser_spark.operators.curate import curate_corpus
    from database_anonymiser_spark.suite.base import load

    docs = load(spark, sf_dir, "documents")
    curated = curate_corpus(docs, min_tokens=5, near_dedup=False, decontam_n=None)
    rows = curated.count()
    tokens = curated.agg(F.sum("n_tokens")).first()[0]
    assert rows > 0

    out = tmp_path / "export"
    m = export_training_shards(
        curated,
        str(out),
        "doc_id",
        tokens_per_shard=max(1, tokens // 4),
        n_tokens_col="n_tokens",
    )
    assert m["total_rows"] == rows
    assert sum(s["n_tokens"] for s in m["shards"].values()) == tokens
    assert verify_shards(spark, str(out)) == {"ok": True, "mismatched": []}


def test_export_crash_leaves_no_staging_or_out(spark, docs, tmp_path, monkeypatch):
    """A failure mid-export (here: the manifest aggregate) must leave
    NEITHER a partial out_dir NOR a staging residue — the atomic-promote
    contract under crash."""
    import database_anonymiser_spark.operators.export as E

    def boom(cols):
        raise RuntimeError("mid-export failure")

    monkeypatch.setattr(E, "_row_checksum", boom)
    out = tmp_path / "x"
    with pytest.raises(RuntimeError, match="mid-export"):
        export_training_shards(docs, str(out), "doc_id", n_shards=3)
    assert not out.exists()
    assert list(tmp_path.iterdir()) == []


def test_full_pretraining_pipeline_composition(spark, sf_dir, tmp_path):
    """The COMPLETE pretraining data flow on the real fixture, every
    seam real: curate the corpus -> train a BPE table on the survivors
    -> tokenize with it (real token counts, not the whitespace proxy)
    -> greedily pack into training sequences -> export token-sized
    shards -> re-verify the landed export. Token totals are conserved
    end-to-end and no packed sequence exceeds the budget unless it is
    a single oversized document."""
    from database_anonymiser_spark.operators.curate import curate_corpus
    from database_anonymiser_spark.operators.text import pack_sequences
    from database_anonymiser_spark.operators.tokenizer import apply_bpe, train_bpe
    from database_anonymiser_spark.suite.base import load

    docs = load(spark, sf_dir, "documents")
    curated = curate_corpus(
        docs, min_tokens=5, near_dedup=False, decontam_n=None
    ).select("doc_id", "text")

    merges = train_bpe(curated, "text", 25)
    assert len(merges) == 25
    counted = apply_bpe(curated, "doc_id", "text", merges)
    sized = curated.join(counted, "doc_id")
    total_tokens = sized.agg(F.sum("n_bpe_tokens")).first()[0]
    assert total_tokens > 0

    budget = 512
    packed = pack_sequences(sized, "doc_id", "n_bpe_tokens", budget=budget)
    # packing conserves docs and tokens; bins respect the budget unless
    # a single doc overflows it alone
    assert packed.count() == sized.count()
    per_seq = packed.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("t"), F.count("*").alias("n")
    )
    bad = per_seq.where((F.col("t") > budget) & (F.col("n") > 1)).count()
    assert bad == 0

    enriched = sized.join(
        packed.select("doc_id", "seq_id", "seq_pos"), "doc_id"
    )
    out = tmp_path / "shards"
    m = export_training_shards(
        enriched,
        str(out),
        "doc_id",
        tokens_per_shard=max(1, total_tokens // 5),
        n_tokens_col="n_bpe_tokens",
    )
    assert m["total_rows"] == sized.count()
    assert sum(s["n_tokens"] for s in m["shards"].values()) == total_tokens
    assert verify_shards(spark, str(out)) == {"ok": True, "mismatched": []}


def test_shard_columns_collision_refused(spark):
    """Pre-existing 'shard'/'_ord' columns would be silently overwritten
    (destroying user data the manifest then checksums) — refused loudly."""
    import pytest as _pt

    from database_anonymiser_spark.operators.export import shard_assign

    df = spark.createDataFrame([(1, 0)], "doc_id long, shard long")
    with _pt.raises(ValueError, match="shard"):
        shard_assign(df, "doc_id", 4)
    df2 = spark.createDataFrame([(1, 0)], "doc_id long, _ord long")
    with _pt.raises(ValueError, match="_ord"):
        shard_assign(df2, "doc_id", 4)
