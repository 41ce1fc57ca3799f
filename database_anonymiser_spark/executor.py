"""Plan executor: per-table mask → dryrun count / apply staged write.

Rebuilds ``src/executor/executor.ts:87-147`` on Spark's immutable model:
- dryrun (C4): compute the masked DataFrame and ``count()`` it — same affected
  row counts the reference gets from UPDATE-under-ROLLBACK, with zero writes.
- apply (C5): ALL tables are written to staging paths first; promotion
  (directory rename) happens only after every staging succeeded. Any table
  failure deletes every staging and promotes NOTHING — the all-or-nothing
  semantics of the reference's single wrapping transaction
  (``src/main.ts:102-111`` BEGIN…COMMIT, ROLLBACK on error). The promote
  phase itself is crash-atomic via a manifest: the full rename list is
  journaled to ``_promote_manifest.json`` before the first rename and
  removed after the last, so a driver crash mid-loop is rolled FORWARD on
  the next apply (every journaled rename is safe by construction — the
  manifest exists only once every staging succeeded). This matches the
  reference's single atomic ``COMMIT`` exposure, write-ahead-log style.

100 TB posture:
- The mask is one narrow projection — no shuffle, no Python; executors stream
  parquet in and out. Cost is IO-bound and embarrassingly parallel.
- Dryrun counts avoid a second full read where possible: when ≥1 column is
  rewritten the affected-row count is just the table row count, which Spark
  answers from parquet footer statistics (no data scan).
- Tables are independent jobs; ``parallelism`` submits them concurrently from
  a thread pool so a 1000-executor cluster isn't serialized on one table's
  tail (the reference is strictly sequential, executor.ts:104-132).
- Staged writes are file-size governed: ``max_records_per_file`` caps every
  output file (SURVEY.md §7) so a 100 TB apply neither emits multi-TB
  single files nor a small-file storm — Spark splits each task's output at
  the cap with no extra shuffle.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from pathlib import Path

from database_anonymiser_spark.catalog import ParquetCatalog
from database_anonymiser_spark.planner import Plan, PlannedTable
from database_anonymiser_spark.safeguards import DEFAULT_ROW_CAP, enforce_row_cap
from database_anonymiser_spark.strategies import (
    masked_projection,
    normalize_columns_for_types,
)

log = logging.getLogger(__name__)

PROMOTE_MANIFEST = "_promote_manifest.json"

#: Default cap on records per staged output file (SURVEY.md §7). At ~100-200
#: bytes/row of masked TPC-H-ish data this lands files in the 100 MB–1 GB
#: band object stores and downstream scans like.
DEFAULT_MAX_RECORDS_PER_FILE = 5_000_000


@dataclass
class TableResult:
    table: str
    rows: int = 0
    skipped: bool = False
    error: str | None = None
    downgrades: list[dict] = field(default_factory=list)


@dataclass
class ExecutionResult:
    mode: str
    updated_by_table: dict[str, int] = field(default_factory=dict)
    tables: list[TableResult] = field(default_factory=list)
    rolled_back: bool = False  # apply only: a table failed → nothing promoted

    @property
    def total_rows(self) -> int:
        """≅ main.ts:80-83 — sum of per-table affected counts (A2)."""
        return sum(self.updated_by_table.values())

    @property
    def failed_tables(self) -> list["TableResult"]:
        return [tr for tr in self.tables if tr.error is not None]


def mask_table(catalog: ParquetCatalog, planned: PlannedTable):
    """Read + type-safety normalize + projection for one table.

    Returns (masked_df, active_rewrites, downgrades). Mirrors the per-table
    body of executor.ts:104-132: live schema re-read (:108), normalize
    (:109-116), compile (:118).
    """
    df = catalog.read(planned.name)
    normalized = normalize_columns_for_types(list(planned.columns), df.schema)
    masked, active = masked_projection(df, normalized)
    downgrades = [
        {"column": nc.column, "from": nc.downgraded_from, "reason": nc.reason}
        for nc in normalized
        if nc.downgraded_from
    ]
    return masked, active, downgrades


def recover_pending_promote(output_root: Path) -> list[str]:
    """Roll FORWARD a promote interrupted by a driver crash.

    The manifest is journaled only after every table's staging write
    succeeded, so each recorded rename is unconditionally safe to finish:
    if the staging directory still exists the crash hit before its rename
    (promote it now); if it's gone the rename already happened. Called at
    the start of every apply; returns the tables rolled forward. The
    reference gets this from Postgres' atomic COMMIT (main.ts:111); this is
    the filesystem-rename equivalent, write-ahead-log style.
    """
    manifest = output_root / PROMOTE_MANIFEST
    if not manifest.exists():
        return []
    try:
        entries = json.loads(manifest.read_text())
    except ValueError:
        # A torn manifest can only mean the crash hit during the journal
        # write itself — which happens strictly BEFORE the first rename, so
        # nothing was promoted and discarding the journal is safe. (The
        # write is temp-file + atomic os.replace, so this is belt-and-
        # braces for non-atomic filesystems.)
        log.warning("discarding unparseable promote manifest (crash during journal write)")
        manifest.unlink()
        return []
    recovered = []
    for entry in entries:
        staging, final = Path(entry["staging"]), Path(entry["final"])
        if staging.exists():
            _promote(staging, final)
            recovered.append(entry["table"])
    manifest.unlink()
    if recovered:
        log.warning("rolled forward interrupted promote for: %s", ", ".join(recovered))
    return recovered


def _execute_table(
    catalog: ParquetCatalog,
    planned: PlannedTable,
    dryrun: bool,
    output_root: Path | None,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> tuple[TableResult, Path | None]:
    """One table's mask + (dryrun count | staged write). NEVER promotes —
    returns the staging path so the caller can promote all-or-nothing."""
    res = TableResult(table=planned.table)
    try:
        masked, active, downgrades = mask_table(catalog, planned)
        res.downgrades = downgrades
        if active == 0:
            # zero effective SETs → skip (query-builder.ts:54-56, executor.ts:120-124)
            res.skipped = True
            return res, None
        if dryrun:
            res.rows = masked.count()
            return res, None
        assert output_root is not None
        staging = output_root / f"_staging_{planned.name}_{uuid.uuid4().hex[:8]}"
        # File-size governance (SURVEY.md §7): cap records per output file so
        # apply output is neither giant files nor a small-file storm.
        masked.write.option("maxRecordsPerFile", max_records_per_file).mode(
            "overwrite"
        ).parquet(str(staging))
        res.rows = catalog.spark.read.parquet(str(staging)).count()
        return res, staging
    except Exception as e:  # per-table failure isolation, reported not swallowed
        log.exception("table %s failed", planned.table)
        res.error = f"{type(e).__name__}: {e}"
        return res, None


def _promote(staging: Path, final: Path) -> None:
    """Same-filesystem rename promote (near-atomic, data-independent)."""
    if final.exists():
        shutil.rmtree(final, ignore_errors=True) if final.is_dir() else final.unlink()
    staging.rename(final)


def execute_plan_versioned(
    catalog: ParquetCatalog,
    plan: Plan,
    tables_root: str | Path,
    dryrun: bool = True,
    row_cap: int = DEFAULT_ROW_CAP,
    force: bool = False,
) -> ExecutionResult:
    """Transactional apply through the commit-log tables — the SURVEY §7
    "faithful rollback" upgrade path over the staged-promote apply.

    Each table lives as a :class:`~database_anonymiser_spark.sources.versioned.VersionedTable`
    under ``tables_root/<name>`` (created from the catalog source on first
    touch; version 0 is the pristine table). Apply commits ONE
    ``anonymise`` version per table that replaces the live set with the
    masked rewrite; dryrun computes the same counts with ZERO commits —
    exactly the reference's UPDATE-under-ROLLBACK (executor.ts:98-137)
    rendered on a transaction log. A failed apply is rolled back by
    ``restore()`` (forward, auditable), not by hoping a rename didn't land.

    All-or-nothing across tables, two-phase:
    1. every table's masked data files are fully written while INVISIBLE
       (referenced by no commit) — any failure here commits nothing and
       the orphans are vacuumed on EVERY table phase 1 touched, including
       one that failed mid-write before staging (round-5 advice: partial
       parquet from a failed ``_write_data_files`` is an orphan too).
       Tables first created during this run keep their committed
       version-0 pristine copy after rollback — version 0 is a real
       commit of the unmasked source, by design;
    2. the per-table commits are pure metadata (one tiny exclusive-create
       each). A crash inside this window can leave a prefix committed —
       recovery is ``restore(v-1)`` per committed table; Delta itself has
       no multi-table transactions, and the window is milliseconds versus
       phase 1's hours at 100 TB.

    Row counts come from the written files' parquet footers (metadata, no
    second scan). NOTE: the log retains the pre-image until vacuumed past
    retention — time travel to the unmasked original is the point for
    staging-copy workflows (the reference also runs against a copy DB),
    but production anonymisation should vacuum old versions.
    """
    from database_anonymiser_spark.sources.versioned import (
        VersionedTable,
        _commit,
        _write_data_files,
    )

    root = Path(tables_root)
    mode = "dryrun" if dryrun else "apply"
    result = ExecutionResult(mode=mode)

    if not dryrun:
        dry = execute_plan_versioned(catalog, plan, root, dryrun=True)
        enforce_row_cap(dry.total_rows, cap=row_cap, force=force)

    # phase 1: mask + (count | invisible write) per table
    staged: list[tuple[PlannedTable, VersionedTable, list, int]] = []
    touched: list[VersionedTable] = []  # every table phase 1 wrote into
    for planned in plan.tables:
        tr = TableResult(table=planned.table)
        try:
            masked, active, downgrades = mask_table(catalog, planned)
            tr.downgrades = downgrades
            if active == 0:
                tr.skipped = True
                result.tables.append(tr)
                continue
            if dryrun:
                tr.rows = masked.count()
            else:
                t_root = root / planned.name
                t = (
                    VersionedTable(catalog.spark, t_root)
                    if (t_root / "_log").is_dir()
                    else VersionedTable.create(
                        catalog.spark, t_root, catalog.read(planned.name), key_col=None
                    )
                )
                touched.append(t)
                adds = _write_data_files(masked, t.root, None)
                import pyarrow.parquet as pq

                tr.rows = sum(
                    pq.ParquetFile(str(t.root / e.path)).metadata.num_rows
                    for e in adds
                )
                staged.append((planned, t, adds, tr.rows))
            result.tables.append(tr)
        except Exception as e:
            log.exception("table %s failed", planned.table)
            tr.error = f"{type(e).__name__}: {e}"
            result.tables.append(tr)

    if any(tr.error is not None for tr in result.tables):
        if not dryrun:
            # nothing was committed; drop the invisible phase-1 files —
            # from every table touched, not only those that finished
            # staging (a mid-write failure leaves partial parquet too)
            result.rolled_back = True
            for t in touched:
                # grace 0: these are OUR just-staged files (single
                # writer inside the apply run), not a concurrent
                # writer's in-flight window
                t.vacuum(orphan_grace_s=0)
        return result

    # phase 2: metadata-only commit loop
    for planned, t, adds, rows in staged:
        v = t.latest_version()
        removes = [e["path"] for e in t._live_entries(v)]
        _commit(t.root, v + 1, adds, removes, t.key_col(), op="anonymise")

    for tr in result.tables:
        if not tr.skipped and tr.error is None:
            result.updated_by_table[tr.table] = tr.rows
    return result


def execute_plan(
    catalog: ParquetCatalog,
    plan: Plan,
    dryrun: bool = True,
    output_root: str | Path | None = None,
    row_cap: int = DEFAULT_ROW_CAP,
    force: bool = False,
    parallelism: int = 4,
    max_records_per_file: int = DEFAULT_MAX_RECORDS_PER_FILE,
) -> ExecutionResult:
    """≅ executePlan (executor.ts:87-147) with staged-write apply.

    Apply enforces the row cap from a dryrun count first (safeguards made
    live, SURVEY.md §2 C6), rolls forward any promote interrupted by a
    previous crash, and journals its own promote phase so IT is
    crash-atomic too.
    """
    mode = "dryrun" if dryrun else "apply"
    out_root = Path(output_root) if output_root else None
    if not dryrun:
        if out_root is None:
            raise ValueError("apply mode requires output_root")
        out_root.mkdir(parents=True, exist_ok=True)
        recover_pending_promote(out_root)
        dry = execute_plan(catalog, plan, dryrun=True, parallelism=parallelism)
        enforce_row_cap(dry.total_rows, cap=row_cap, force=force)

    result = ExecutionResult(mode=mode)
    if parallelism > 1 and len(plan.tables) > 1:
        with ThreadPoolExecutor(max_workers=parallelism) as pool:
            futures = [
                pool.submit(_execute_table, catalog, t, dryrun, out_root, max_records_per_file)
                for t in plan.tables
            ]
            table_results = [f.result() for f in futures]
    else:
        table_results = [
            _execute_table(catalog, t, dryrun, out_root, max_records_per_file)
            for t in plan.tables
        ]

    any_error = any(tr.error is not None for tr, _ in table_results)
    if not dryrun and any_error:
        # all-or-nothing (main.ts:102-111 ROLLBACK): delete every staging,
        # promote nothing — the output root is left exactly as it was
        result.rolled_back = True
        for _, staging in table_results:
            if staging is not None:
                shutil.rmtree(staging, ignore_errors=True)
        for tr, _ in table_results:
            result.tables.append(tr)
        return result

    promotions: list[tuple[Path, Path]] = []
    for (tr, staging), planned in zip(table_results, plan.tables):
        result.tables.append(tr)
        if tr.skipped or tr.error is not None:
            continue
        if not dryrun:
            assert staging is not None and out_root is not None
            promotions.append((staging, out_root / f"{planned.name}.parquet"))
        result.updated_by_table[tr.table] = tr.rows
    if promotions:
        assert out_root is not None
        # Journal-then-rename: a crash anywhere in the loop is rolled forward
        # by recover_pending_promote on the next apply. The journal itself
        # lands atomically (temp + os.replace) so a crash mid-journal can
        # never leave a torn manifest that blocks future applies.
        manifest = out_root / PROMOTE_MANIFEST
        tmp = out_root / f"{PROMOTE_MANIFEST}.tmp"
        tmp.write_text(
            json.dumps(
                [
                    {"table": final.stem, "staging": str(staging), "final": str(final)}
                    for staging, final in promotions
                ]
            )
        )
        os.replace(tmp, manifest)
        for staging, final in promotions:
            _promote(staging, final)
        manifest.unlink()
    return result
