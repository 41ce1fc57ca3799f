"""Cross-table ATOMIC APPEND — a multi-table transaction for versioned
tables (round 9).

The reference anonymiser wraps its whole run in ONE database transaction
(`src/main.ts:96-117`: BEGIN → per-table UPDATEs → COMMIT/ROLLBACK) — a
guarantee a directory-per-table commit log cannot give for free. Delta
itself has no multi-table transactions (each `_delta_log` is its own
serialization domain); Iceberg gets them only via a REST catalog's
multi-table commit. This module closes the gap for the one commit class
where it is sound without a central catalog: BLIND APPENDS, with a
two-phase roll-forward protocol (the classic presumed-abort 2PC shape,
with the manifest file as the coordinator's decision record):

1. ``stage_append(table, df)`` — phase 1: the data files are written
   under each table's own ``data/`` directory (INVISIBLE until a commit
   references them — the engine's native write protocol) and their
   entries are held in the transaction, validated against the table's
   schema and CHECK constraints up front. Nothing is visible yet; a
   crash here leaves only unreferenced files, which ``vacuum(None)``
   reclaims as orphans (presumed abort).
2. ``commit()`` — the DECISION POINT: one manifest JSON listing every
   part (table root, file entries, validated schema) is written
   tmp+rename under ``<coordinator>/_txn/<id>.json``. That single atomic
   rename commits the transaction logically.
3. Finalization — roll-forward: each part becomes one ordinary OCC
   append commit (op ``txn_append``) in its table's log, carrying
   ``meta={"txn": id, "txn_part": i}`` as the idempotency witness; the
   manifest is deleted last. A crash ANYWHERE after phase 2 is repaired
   by :func:`recover`, which re-runs finalization: parts whose witness
   already appears in the table's recent log (bounded scan,
   ``TXN_SCAN_CAP``) are skipped, the rest are committed — re-entrant,
   at-most-once per part.

Guarantee and trade: after ``commit()`` returns (or ``recover()``
completes), EVERY table shows its append; with no manifest, NO table
ever will. In the crash window between the manifest rename and the last
part's commit, a reader can observe table A's half without table B's —
atomic durability with roll-forward, not cross-table snapshot isolation
(the price of having no central catalog to swap both pointers in one
CAS; Delta pays the same for its own single-table streaming sinks).
Run ``recover(coordinator)`` at pipeline start, like Delta runs log
recovery on open.

Concurrency: blind appends are the one commit class with an EMPTY read
set, so losing an OCC race to a concurrent writer rebases by re-
committing the same files at the new head (the same auto-retry as
``VersionedTable.append``). The rebase is refused — the conflict
surfaces to the caller / operator — when the winner changed the table's
logged SCHEMA, because the staged files were validated against the old
one (also the same rule as ``append``).

100 TB shape: phase 1 is the only data-sized work and it is a normal
distributed write per table; phase 2 + finalization are O(tables)
tiny-JSON operations, and recovery is O(manifests × TXN_SCAN_CAP)
metadata reads — never a data scan.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import asdict
from pathlib import Path

from database_anonymiser_spark.sources.versioned import (
    VersionConflict,
    _FileEntry,
    _commit,
    _list_versions,
    _log_path,
    _replay,
    _write_data_files,
)

_TXN_DIR = "_txn"
#: how many commits back the idempotency witness scan looks for an
#: already-finalized part — bounds recovery to O(cap) tiny-JSON reads.
#: A transaction's finalization window is a handful of commits; 64
#: covers any realistic interleave of concurrent writers.
TXN_SCAN_CAP = 64
#: OCC rebase attempts per part during finalization (each retry is a
#: re-commit of the same already-written files at the new head).
_TXN_MAX_RETRIES = 15


class TransactionAborted(RuntimeError):
    """Raised when finalization cannot proceed (e.g. a concurrent
    writer evolved a participant table's schema after staging). The
    manifest is LEFT IN PLACE so ``recover`` retries after the operator
    resolves the conflict — the transaction is decided-committed and
    must eventually roll forward, never silently half-apply."""


def _part_committed(
    root: Path, txn_id: str, part: int, family: str | None = None
) -> int | None:
    """The version that already carries this part's idempotency witness
    (``meta.txn == id and meta.txn_part == part``) within the last
    ``TXN_SCAN_CAP`` commits, else None.

    ``family`` bounds the scan for SINGLE-WRITER transaction streams
    (the fan-out sink's per-epoch ids): family epochs commit to a table
    in order, so the first witness met walking newest→oldest that
    belongs to the same family but a DIFFERENT txn proves this txn never
    committed here — break instead of walking to the cap. Turns the
    fresh-epoch scan from O(min(history, cap)) into O(commits since the
    previous epoch); witnesses of other writers/families never break."""
    import database_anonymiser_spark.sources.versioned as _V

    for v in _list_versions(root)[::-1][:TXN_SCAN_CAP]:
        _V.COMMIT_READS += 1  # the scan IS a metadata read: count it
        rec = json.loads(_log_path(root, v).read_text())
        m = rec.get("meta") or {}
        if m.get("txn") == txn_id and m.get("txn_part") == part:
            return v
        if family is not None and m.get("txn_family") == family:
            return None  # newest family epoch here differs: ours is absent
    return None


def _finalize_publish(root: Path, man: dict, part: dict, i: int) -> int:
    """Roll one PUBLISH part forward (round 14, SQL script transactions).

    Unlike a blind append, a publish carries a READ SET — the removed
    paths — so finalization re-validates at the CURRENT head that every
    removed path is still live and the logged schema still matches the
    staging-time one, then lands adds+removes as ONE ``txn_publish``
    commit. Validation failure raises :class:`TransactionAborted` with
    the manifest left in place (the same operator-resolves contract as
    the schema gate on append parts). In practice the SQL front
    validates immediately before the manifest rename, so this path only
    fires in the crash-recovery race window."""
    entries = [_FileEntry(**e) for e in part["entries"]]
    removes = list(part["removes"])
    for attempt in range(_TXN_MAX_RETRIES + 1):
        head = _list_versions(root)
        v = (head[-1] if head else -1) + 1
        live, schema_now = {}, None
        if head:
            st = _replay(root, head[-1])
            live, schema_now = st[0], st[3]
        missing = [p for p in removes if p not in live]
        if missing:
            raise TransactionAborted(
                f"publish part {i} of txn {man['id']} cannot roll forward "
                f"at {root}: removed file(s) no longer live at head "
                f"(concurrent writer): {missing[:3]}{'...' if len(missing) > 3 else ''}; "
                "resolve and re-run recover(), or delete the manifest to "
                "abandon the transaction (staged files become vacuum-able "
                "orphans)"
            )
        if part.get("schema") is not None and schema_now != part["schema"]:
            raise TransactionAborted(
                f"table {root} changed schema after staging (txn "
                f"{man['id']} part {i}); resolve and re-run recover()"
            )
        try:
            _commit(
                root, v, entries, removes, part["key_col"],
                op="txn_publish",
                meta={
                    "txn": man["id"], "txn_part": i,
                    **(part.get("meta") or {}),
                },
            )
            return v
        except VersionConflict:
            if attempt == _TXN_MAX_RETRIES:
                raise
    raise AssertionError("unreachable")


def _finalize(manifest_path: Path) -> dict[str, int]:
    """Roll the decided transaction forward: one OCC append commit per
    not-yet-committed part, manifest deleted last. Re-entrant (witness
    scan first) — safe to call again after any crash."""
    man = json.loads(manifest_path.read_text())
    fam = man.get("family")
    results: dict[str, int] = {}
    for i, part in enumerate(man["parts"]):
        root = Path(part["root"])
        done = _part_committed(root, man["id"], i, family=fam)
        if done is not None:
            results[part["root"]] = done
            continue
        if part.get("kind") == "publish":
            results[part["root"]] = _finalize_publish(root, man, part, i)
            continue
        head = _list_versions(root)
        if part.get("schema") is not None:
            now = _replay(root, head[-1])[3] if head else None
            if now is not None and now != part["schema"]:
                raise TransactionAborted(
                    f"table {part['root']} changed schema after staging "
                    f"(txn {man['id']} part {i}); resolve and re-run "
                    "recover() — the transaction is decided and must "
                    "roll forward"
                )
        entries = [_FileEntry(**e) for e in part["entries"]]
        for attempt in range(_TXN_MAX_RETRIES + 1):
            v = (_list_versions(root)[-1] if _list_versions(root) else -1) + 1
            try:
                _commit(
                    root, v, entries, [], part["key_col"], op="txn_append",
                    meta={
                        "txn": man["id"], "txn_part": i,
                        **({"txn_family": fam} if fam else {}),
                    },
                )
                results[part["root"]] = v
                break
            except VersionConflict:
                if attempt == _TXN_MAX_RETRIES:
                    raise
    manifest_path.unlink(missing_ok=True)
    return results


def recover(coordinator: str | Path) -> list[dict[str, int]]:
    """Complete every decided-but-unfinalized transaction under the
    coordinator (crash repair — run at pipeline start). Returns the
    per-manifest {table root → committed version} maps. No manifests →
    no-op; staged files of UNdecided transactions are not touched here
    (they are invisible orphans, reclaimed by each table's
    ``vacuum(None)``)."""
    d = Path(coordinator) / _TXN_DIR
    if not d.is_dir():
        return []
    return [_finalize(p) for p in sorted(d.glob("*.json"))]


class MultiTableTransaction:
    """One atomic append across several versioned tables.

    ::

        txn = MultiTableTransaction(coordinator_dir)
        txn.stage_append(docs_table, new_docs)
        txn.stage_append(embeddings_table, new_vectors)
        versions = txn.commit()   # all visible, or (absent a crash) none

    ``coordinator`` is any durable directory the recovery job also
    watches — conventionally the first table's root, so the manifest
    lives next to one participant's log.
    """

    def __init__(
        self,
        coordinator: str | Path,
        txn_id: str | None = None,
        family: str | None = None,
    ):
        self.coordinator = Path(coordinator)
        if txn_id is not None and not all(
            c.isalnum() or c in "._-" for c in txn_id
        ):
            raise ValueError(f"txn_id must be filename-safe: {txn_id!r}")
        #: explicit ``txn_id`` makes the transaction DETERMINISTIC —
        #: what a streaming sink keys by epoch so a replayed batch finds
        #: its predecessor's witness instead of double-appending
        self.id = txn_id or uuid.uuid4().hex
        #: optional SINGLE-WRITER stream tag (the fan-out sink's
        #: sink_name): rides in the manifest and every part's witness
        #: meta so witness scans can break at the newest family epoch
        #: (see _part_committed) instead of walking to the cap
        self.family = family
        self.parts: list[dict] = []
        self._done = False

    def stage_append(self, table, df) -> None:
        """Phase 1 for one table: validate ``df`` against the table's
        logged schema (EXACT column match — a transaction never evolves
        a schema) and CHECK constraints, write its data files (invisible
        until finalization), and hold the entries. Raises before any
        byte is written on a validation failure."""
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        schema = table._log_schema()
        if schema is not None:
            want = [f.name for f in schema.fields]
            got = [f.name for f in df.schema.fields]
            if got != want:
                raise ValueError(
                    f"staged frame columns {got} != table columns {want} "
                    "(transactions append with an exact schema match; "
                    "evolve via VersionedTable.append first)"
                )
        table._check_constraints(df)
        entries = _write_data_files(
            df, table.root, table.key_col(),
            stats_cols=table._stats_cols, colmap=table._colmap,
        )
        self.parts.append(
            {
                "root": str(table.root),
                "key_col": table.key_col(),
                "schema": schema.jsonValue() if schema is not None else None,
                "entries": [asdict(e) for e in entries],
            }
        )

    def stage_publish(
        self,
        root: str | Path,
        key_col,
        entries: list,
        removes: list[str],
        schema: dict | None = None,
        meta: dict | None = None,
    ) -> None:
        """Phase 1 for a PUBLISH part (round 14, SQL script
        transactions): a general adds+removes commit, not a blind
        append. The caller has ALREADY placed every add entry's
        data/DV/bloom file under ``root`` (invisible until a commit
        references them — the engine's native write protocol) and
        validated the diff against the head it was computed from; this
        just holds the part for the manifest. ``schema`` (a StructType
        jsonValue) re-validates at finalization; ``removes`` re-validate
        as still-live (see :func:`_finalize_publish`)."""
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        self.parts.append(
            {
                "kind": "publish",
                "root": str(root),
                "key_col": key_col,
                "schema": schema,
                "entries": [
                    asdict(e) if not isinstance(e, dict) else dict(e)
                    for e in entries
                ],
                "removes": [str(p) for p in removes],
                **({"meta": meta} if meta else {}),
            }
        )

    def commit(self) -> dict[str, int]:
        """Phase 2 + finalization. The tmp+rename of the manifest is the
        atomic decision point; everything after is roll-forward that
        :func:`recover` can also complete. Returns {table root →
        committed version}."""
        if self._done:
            raise RuntimeError("transaction already committed/aborted")
        if not self.parts:
            raise ValueError("nothing staged")
        self._done = True
        d = self.coordinator / _TXN_DIR
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".{self.id}.tmp"
        tmp.write_text(json.dumps({
            "id": self.id, "parts": self.parts,
            **({"family": self.family} if self.family else {}),
        }))
        manifest = d / f"{self.id}.json"
        tmp.rename(manifest)  # <- the transaction commits HERE
        return _finalize(manifest)

    def abort(self) -> None:
        """Presumed-abort cleanup: delete the staged (never-referenced)
        data files and bloom sidecars eagerly instead of waiting for
        each table's vacuum. A crash needs no abort — undecided staged
        files are invisible orphans by construction."""
        self._done = True
        for part in self.parts:
            root = Path(part["root"])
            for e in part["entries"]:
                # ABSOLUTE refs are pre-existing shared files (a publish
                # part re-referencing another table's data, the shallow-
                # clone shape) — never deletion candidates; only this
                # transaction's own staged (relative) files go
                import os as _os

                for ref in (
                    e["path"],
                    e.get("dv"),
                    *(e.get("bloom") or {}).values(),
                ):
                    if ref and not _os.path.isabs(ref):
                        (root / ref).unlink(missing_ok=True)
        self.parts = []
