"""Parquet checkpoint sidecars (round 12 — Delta's parquet checkpoints,
same motivation): the JSON checkpoint keeps every small field (incl. the
head-sniffable eff_ts) while the O(files) live/ever arrays land in a
columnar sidecar — at 10^6 files a JSON live array is hundreds of MB
parsed on every cold replay. v1 (inline-JSON) checkpoints keep reading;
an unreadable v2 sidecar heals via full-log replay, never a silently
empty live set."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

import database_anonymiser_spark.sources.versioned as V
from database_anonymiser_spark.sources.versioned import VersionedTable


def _churn(spark, root, n_commits=None):
    t = VersionedTable.create(
        spark, str(root),
        spark.createDataFrame([(i, float(i)) for i in range(40)], "k long, v double"),
        key_col="k",
    )
    for i in range(n_commits or V.CHECKPOINT_INTERVAL + 1):
        t.append(
            spark.createDataFrame([(1000 + i, -1.0)], "k long, v double")
        )
    return t


def test_checkpoint_writes_parquet_sidecar_and_small_json(spark, tmp_path):
    t = _churn(spark, tmp_path / "t")
    cps = V._list_checkpoints(t.root)
    assert cps
    cp_json = json.loads(V._checkpoint_path(t.root, cps[-1]).read_text())
    # arrays moved out of the JSON; the pointer is present
    assert "live" not in cp_json and "ever" not in cp_json
    assert cp_json["live_parquet"] == f"{cps[-1]:08d}.checkpoint.live"
    side = V._checkpoint_live_path(t.root, cps[-1])
    assert side.exists()
    # the sidecar is NOT named *.parquet: data tooling globbing a table
    # root for data files must never pick up metadata
    assert not side.name.endswith(".parquet")
    # eff_ts still head-sniffs from the (now small) JSON
    assert V._checkpoint_eff(t.root, cps[-1])

    # cold replay through the sidecar equals the incremental state
    V._replay_cache_invalidate(t.root)
    cold = VersionedTable(spark, str(tmp_path / "t"))
    assert cold.row_count() == 40 + V.CHECKPOINT_INTERVAL + 1
    assert cold.snapshot().where("v = -1.0").count() == V.CHECKPOINT_INTERVAL + 1
    # and the checkpoint actually BOUNDS the metadata walk
    c0 = V.COMMIT_READS
    V._replay_cache_invalidate(t.root)
    cold.row_count()
    assert V.COMMIT_READS - c0 <= V.CHECKPOINT_INTERVAL + 1


def test_legacy_inline_checkpoint_still_replays(spark, tmp_path):
    t = _churn(spark, tmp_path / "t")
    cps = V._list_checkpoints(t.root)
    v = cps[-1]
    # rewrite the v2 checkpoint as a v1 (inline arrays, no sidecar) —
    # exactly what a pre-round-12 writer produced
    cp = json.loads(V._checkpoint_path(t.root, v).read_text())
    live, ever, _ = V._checkpoint_arrays(t.root, v, cp)
    cp.pop("live_parquet")
    cp["live"] = live
    cp["ever"] = ever
    V._checkpoint_path(t.root, v).write_text(json.dumps(cp, default=str))
    V._checkpoint_live_path(t.root, v).unlink()
    V._replay_cache_invalidate(t.root)
    cold = VersionedTable(spark, str(tmp_path / "t"))
    assert cold.row_count() == 40 + V.CHECKPOINT_INTERVAL + 1
    # vacuum's ever-set walk reads the inline arrays too
    assert cold.vacuum(dry_run=True) == []


def test_unreadable_sidecar_heals_via_full_replay(spark, tmp_path):
    t = _churn(spark, tmp_path / "t")
    cps = V._list_checkpoints(t.root)
    side = V._checkpoint_live_path(t.root, cps[-1])
    side.write_bytes(b"corrupted")  # torn/eaten sidecar
    V._replay_cache_invalidate(t.root)
    cold = VersionedTable(spark, str(tmp_path / "t"))
    # slow path, never a wrong one: the full log replays, state exact
    assert cold.row_count() == 40 + V.CHECKPOINT_INTERVAL + 1
    assert cold.snapshot().where("k = 1000").count() == 1


def test_erase_removes_superseded_sidecars(spark, tmp_path):
    t = _churn(spark, tmp_path / "t")
    old_cps = V._list_checkpoints(t.root)
    t.erase(F.col("k") == 3)
    # superseded checkpoint sidecars are gone with their JSONs
    for c in old_cps:
        if c < t.latest_version():
            assert not V._checkpoint_path(t.root, c).exists()
            assert not V._checkpoint_live_path(t.root, c).exists()
    # the fresh post-erase checkpoint has a consistent pair
    cps = V._list_checkpoints(t.root)
    assert cps and V._checkpoint_live_path(t.root, cps[-1]).exists()
