"""Cross-table atomic append (sources/txn.py) — the multi-table
transaction the reference gets from wrapping its run in ONE database
transaction (`src/main.ts:96-117`), rebuilt as a two-phase roll-forward
protocol over per-table commit logs.

Covers: happy path, presumed-abort (undecided staging leaves no trace
and vacuums clean), roll-forward recovery from every crash point after
the decision, per-part idempotency under replay, OCC rebase past a
concurrent writer, and the schema-change refusal.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from database_anonymiser_spark.sources.txn import (
    MultiTableTransaction,
    TransactionAborted,
    _finalize,
    recover,
)
from database_anonymiser_spark.sources.versioned import VersionedTable


def _mk(spark, root, n=10, prefix="a"):
    return VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, f"{prefix}{i}") for i in range(n)], "k long, v string"
        ).coalesce(1),
        key_col="k",
    )


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_txn_commit_is_atomic_across_tables(spark, tmp_path):
    ta = _mk(spark, tmp_path / "a")
    tb = _mk(spark, tmp_path / "b", prefix="b")
    txn = MultiTableTransaction(tmp_path / "a")
    txn.stage_append(ta, spark.createDataFrame([(100, "ax")], "k long, v string"))
    txn.stage_append(tb, spark.createDataFrame([(200, "bx")], "k long, v string"))
    # nothing visible until the decision
    assert ta.snapshot().count() == 10 and tb.snapshot().count() == 10
    versions = txn.commit()
    assert set(versions) == {str(ta.root), str(tb.root)}
    assert ta.snapshot().where("k = 100").count() == 1
    assert tb.snapshot().where("k = 200").count() == 1
    assert ta.commit_op(versions[str(ta.root)]) == "txn_append"
    # manifest consumed; recover is a no-op
    assert recover(tmp_path / "a") == []
    # staged-and-committed files survive vacuum in both modes
    ta.vacuum(orphan_grace_s=0)
    ta.vacuum(retain_versions=1)
    assert ta.snapshot().where("k = 100").count() == 1


def test_txn_abort_and_undecided_crash_leave_no_trace(spark, tmp_path):
    ta = _mk(spark, tmp_path / "a")
    tb = _mk(spark, tmp_path / "b")
    # explicit abort: staged files deleted eagerly
    txn = MultiTableTransaction(tmp_path / "a")
    txn.stage_append(ta, spark.createDataFrame([(101, "x")], "k long, v string"))
    txn.abort()
    assert ta.snapshot().count() == 10
    with pytest.raises(RuntimeError, match="already"):
        txn.commit()
    # undecided crash (stage then vanish): invisible orphans, vacuumable
    txn2 = MultiTableTransaction(tmp_path / "a")
    txn2.stage_append(tb, spark.createDataFrame([(102, "y")], "k long, v string"))
    del txn2  # crash before commit(): no manifest was ever written
    assert tb.snapshot().count() == 10
    assert recover(tmp_path / "a") == []  # nothing decided, nothing done
    assert tb.vacuum(orphan_grace_s=0)  # the staged file is reclaimed
    assert tb.snapshot().count() == 10


def test_txn_roll_forward_from_every_crash_point(spark, tmp_path):
    """Crash after the decision (manifest renamed) but before any /
    some / all parts committed: recover() completes exactly the missing
    parts — no duplicates on replay."""
    ta = _mk(spark, tmp_path / "a")
    tb = _mk(spark, tmp_path / "b")
    txn = MultiTableTransaction(tmp_path / "a")
    txn.stage_append(ta, spark.createDataFrame([(111, "p")], "k long, v string"))
    txn.stage_append(tb, spark.createDataFrame([(222, "q")], "k long, v string"))
    # simulate the crash window: write the manifest WITHOUT finalizing
    d = tmp_path / "a" / "_txn"
    d.mkdir(parents=True, exist_ok=True)
    manifest = d / f"{txn.id}.json"
    manifest.write_text(json.dumps({"id": txn.id, "parts": txn.parts}))

    # crash point 1: nothing finalized — recover commits both
    [res] = recover(tmp_path / "a")
    assert ta.snapshot().where("k = 111").count() == 1
    assert tb.snapshot().where("k = 222").count() == 1
    assert not manifest.exists()

    # crash point 2: one part finalized, manifest still present (replay)
    manifest.write_text(json.dumps({"id": txn.id, "parts": txn.parts}))
    [res2] = recover(tmp_path / "a")
    # idempotent: the already-committed parts are FOUND, not re-applied
    assert res2 == res
    assert ta.snapshot().where("k = 111").count() == 1  # still exactly one
    assert tb.snapshot().where("k = 222").count() == 1


def test_txn_occ_rebase_past_concurrent_writer(spark, tmp_path):
    """A writer landing between stage and finalize costs the txn only a
    version bump — same blind-append rebase as VersionedTable.append."""
    ta = _mk(spark, tmp_path / "a")
    txn = MultiTableTransaction(tmp_path / "a")
    txn.stage_append(ta, spark.createDataFrame([(300, "t")], "k long, v string"))
    ta.append(spark.createDataFrame([(400, "w")], "k long, v string"))  # racer
    versions = txn.commit()
    assert versions[str(ta.root)] == ta.latest_version()
    assert _rows(ta.snapshot().where("k >= 300")) == [(300, "t"), (400, "w")]


def test_txn_schema_change_after_staging_refuses_and_retries(spark, tmp_path):
    """A concurrent schema evolution invalidates the staged files; the
    decided manifest STAYS for the operator, and recovery proceeds once
    the table schema is back to what was validated."""
    ta = _mk(spark, tmp_path / "a")
    txn = MultiTableTransaction(tmp_path / "a")
    txn.stage_append(ta, spark.createDataFrame([(500, "s")], "k long, v string"))
    d = tmp_path / "a" / "_txn"
    d.mkdir(parents=True, exist_ok=True)
    manifest = d / f"{txn.id}.json"
    manifest.write_text(json.dumps({"id": txn.id, "parts": txn.parts}))
    ta.append(
        spark.createDataFrame([(1, "z", 5)], "k long, v string, extra long"),
        merge_schema=True,
    )
    with pytest.raises(TransactionAborted, match="changed schema"):
        recover(tmp_path / "a")
    assert manifest.exists()  # decision record kept for the operator

    # operator resolution here = a fresh coordinator on the ORIGINAL
    # schema is out of scope; simply verify _finalize stays re-entrant
    # after the conflict is cleared by rewriting the validated schema
    parts = json.loads(manifest.read_text())
    parts["parts"][0]["schema"] = None  # operator waives the check
    manifest.write_text(json.dumps(parts))
    [res] = recover(tmp_path / "a")
    assert ta.snapshot().where("k = 500").count() == 1
    # NULL-fill through evolution: the staged file predates 'extra'
    assert ta.snapshot().where("k = 500").first()["extra"] is None


def test_stream_fanout_txn_atomic_and_exactly_once(spark, tmp_path):
    """One stream → two versioned tables, each micro-batch one atomic
    cross-table transaction: both tables advance together, a re-drain
    with no new input adds nothing, and new input flows through."""
    import pyspark.sql.functions as F

    from database_anonymiser_spark.streaming.pipeline import (
        run_stream_fanout_txn,
    )

    in_dir, ck = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame([(i,) for i in range(5)], "id long").coalesce(
        1
    ).write.parquet(in_dir)
    stream = spark.readStream.schema("id long").parquet(in_dir)
    outputs = [
        (
            str(tmp_path / "docs"),
            "id",
            lambda b: b.select("id", (F.col("id") * 10).alias("payload")),
        ),
        (
            str(tmp_path / "vecs"),
            "id",
            lambda b: b.select("id", F.md5(F.col("id").cast("string")).alias("sig")),
        ),
    ]
    run = lambda: run_stream_fanout_txn(
        spark.readStream.schema("id long").parquet(in_dir),
        outputs,
        coordinator=str(tmp_path / "docs"),
        checkpoint=ck,
        sink_name="t1",
    )
    run_stream_fanout_txn(
        stream, outputs, coordinator=str(tmp_path / "docs"), checkpoint=ck,
        sink_name="t1",
    )
    docs = VersionedTable(spark, tmp_path / "docs")
    vecs = VersionedTable(spark, tmp_path / "vecs")
    assert docs.snapshot().count() == 5 and vecs.snapshot().count() == 5
    assert docs.commit_op(docs.latest_version()) == "txn_append"
    # re-drain with no new input: nothing re-delivered
    run()
    assert docs.snapshot().count() == 5 and vecs.snapshot().count() == 5
    # new input flows through both tables atomically
    spark.createDataFrame([(10,), (11,)], "id long").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run()
    assert docs.snapshot().count() == 7 and vecs.snapshot().count() == 7
    assert vecs.snapshot().where("id = 10").count() == 1
    # the epoch witness makes a REPLAYED batch a no-op: re-run the
    # second epoch's transaction by hand with its deterministic id
    from database_anonymiser_spark.sources.txn import _part_committed

    assert _part_committed(docs.root, "t1-00000001", 0) is not None
    assert _part_committed(vecs.root, "t1-00000001", 1) is not None


def test_txn_recover_converges_from_every_partial_state(spark, tmp_path):
    """Enumerate all 4 partial-finalize states of a decided 2-part
    transaction ({} / {0} / {1} / {0,1} already committed, manifest
    present): recover() converges each to the same final state with
    exactly one copy of every part — including the out-of-order {1}
    state a forward finalizer never produces but a recovery crash can."""
    from database_anonymiser_spark.sources.txn import _finalize, _part_committed
    from database_anonymiser_spark.sources.versioned import (
        _FileEntry,
        _commit,
        _list_versions,
    )

    for subset in ([], [0], [1], [0, 1]):
        tag = "".join(map(str, subset)) or "none"
        ta = _mk(spark, tmp_path / f"a{tag}")
        tb = _mk(spark, tmp_path / f"b{tag}")
        txn = MultiTableTransaction(tmp_path / f"a{tag}", txn_id=f"fz-{tag}")
        txn.stage_append(
            ta, spark.createDataFrame([(70, "p")], "k long, v string")
        )
        txn.stage_append(
            tb, spark.createDataFrame([(71, "q")], "k long, v string")
        )
        # decided: manifest on disk, then pre-commit the chosen subset
        d = tmp_path / f"a{tag}" / "_txn"
        d.mkdir(parents=True, exist_ok=True)
        manifest = d / f"{txn.id}.json"
        manifest.write_text(json.dumps({"id": txn.id, "parts": txn.parts}))
        for i, t in ((0, ta), (1, tb)):
            if i in subset:
                part = txn.parts[i]
                _commit(
                    t.root, _list_versions(t.root)[-1] + 1,
                    [_FileEntry(**e) for e in part["entries"]], [],
                    part["key_col"], op="txn_append",
                    meta={"txn": txn.id, "txn_part": i},
                )
        [res] = recover(tmp_path / f"a{tag}")
        assert not manifest.exists()
        assert ta.snapshot().where("k = 70").count() == 1, subset
        assert tb.snapshot().where("k = 71").count() == 1, subset
        assert _part_committed(ta.root, txn.id, 0) == res[str(ta.root)]
        assert _part_committed(tb.root, txn.id, 1) == res[str(tb.root)]


def test_two_interleaved_txns_both_land(spark, tmp_path):
    """Two concurrent transactions over the SAME two tables: blind
    appends never conflict logically, so both roll forward (OCC rebase
    orders them); all four rows present exactly once."""
    ta = _mk(spark, tmp_path / "a")
    tb = _mk(spark, tmp_path / "b")
    t1 = MultiTableTransaction(tmp_path / "a")
    t2 = MultiTableTransaction(tmp_path / "a")
    t1.stage_append(ta, spark.createDataFrame([(81, "p")], "k long, v string"))
    t2.stage_append(ta, spark.createDataFrame([(82, "q")], "k long, v string"))
    t1.stage_append(tb, spark.createDataFrame([(83, "r")], "k long, v string"))
    t2.stage_append(tb, spark.createDataFrame([(84, "s")], "k long, v string"))
    t2.commit()  # decided second-staged first: order is irrelevant
    t1.commit()
    assert _rows(ta.snapshot().where("k >= 80")) == [(81, "p"), (82, "q")]
    assert _rows(tb.snapshot().where("k >= 80")) == [(83, "r"), (84, "s")]


def test_txn_validation_failures_stage_nothing(spark, tmp_path):
    ta = _mk(spark, tmp_path / "a")
    ta.add_constraint("pos", "k >= 0")
    txn = MultiTableTransaction(tmp_path / "a")
    with pytest.raises(Exception, match="pos"):
        txn.stage_append(
            ta, spark.createDataFrame([(-1, "bad")], "k long, v string")
        )
    with pytest.raises(ValueError, match="exact schema match"):
        txn.stage_append(ta, spark.createDataFrame([(1,)], "k long"))
    assert txn.parts == []
    with pytest.raises(ValueError, match="nothing staged"):
        txn.commit()

def test_family_bounds_witness_scan_flat_per_epoch(spark, tmp_path):
    """Single-writer transaction streams tag their txns with a FAMILY:
    the witness scan breaks at the newest same-family witness of a
    different epoch, so a fresh epoch's scan cost stays O(commits per
    epoch) — FLAT as the table's history grows — instead of walking to
    TXN_SCAN_CAP. Replay dedup still finds its own witness; a family
    must never break on OTHER writers' commits interleaved between
    epochs."""
    import database_anonymiser_spark.sources.versioned as V

    mk = lambda lo: spark.createDataFrame(
        [(i, "x") for i in range(lo, lo + 3)], "k long, v string"
    ).coalesce(1)
    a = _mk(spark, tmp_path / "a", n=2)
    b = _mk(spark, tmp_path / "b", n=2, prefix="b")

    for epoch in range(6):
        txn = MultiTableTransaction(
            tmp_path / "a", txn_id=f"fam-{epoch:04d}", family="fam"
        )
        txn.stage_append(a, mk(100 + 10 * epoch))
        txn.stage_append(b, mk(100 + 10 * epoch))
        txn.commit()
        # an unrelated interleaved writer must not break the family scan
        a.append(mk(500 + 10 * epoch))

    from database_anonymiser_spark.sources.txn import _part_committed

    # replay dedup: the last epoch's witnesses are found on both tables
    assert _part_committed(a.root, "fam-0005", 0, family="fam") is not None
    assert _part_committed(b.root, "fam-0005", 1, family="fam") is not None

    # the FLATNESS claim, measured on the scan itself: a fresh
    # (never-committed) epoch is proven absent after O(commits since the
    # previous epoch) reads — the interleaved append (meta-less) is
    # walked over, the previous family witness breaks; without family
    # the same probe walks all the way to history start / the cap
    c0 = V.COMMIT_READS
    assert _part_committed(a.root, "fam-0099", 0, family="fam") is None
    fam_reads = V.COMMIT_READS - c0
    c0 = V.COMMIT_READS
    assert _part_committed(a.root, "fam-0099", 0) is None
    capped_reads = V.COMMIT_READS - c0
    assert fam_reads <= 3, fam_reads  # interleaved append + prior witness
    assert capped_reads == len(a.versions()), capped_reads  # full walk
    assert fam_reads < capped_reads

    assert a.snapshot().count() == 2 + 6 * 3 + 6 * 3  # txns + interleaves
    assert b.snapshot().count() == 2 + 6 * 3
