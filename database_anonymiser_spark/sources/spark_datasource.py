"""Spark Python DataSource for versioned tables — ``format("versioned")``.

The Spark-4-native integration face of the versioned layer
(``pyspark.sql.datasource`` — the Python DataSource API, public Spark
4.0 surface): register once, then

    spark.dataSource.register(VersionedDataSource)
    spark.read.format("versioned").option("path", root).load()          # snapshot
    spark.readStream.format("versioned").option("path", root).load()    # follow

The STREAMING face mirrors the Delta streaming source's contract
exactly (public Delta docs: a Delta table as a stream source processes
appends; a commit that changes existing data errors unless
``skipChangeCommits`` is set; ``dataChange=false`` housekeeping commits
are skipped silently):

- each micro-batch covers the commit interval (start, end] chosen by
  Spark from ``latestOffset``; offsets ride Spark's own streaming
  checkpoint, so exactly-once replay is the runtime's, not ours;
- ROW-PRESERVING commits (``ROW_PRESERVING_OPS``: compact,
  optimize_zorder, analyze — the dataChange=false class) are skipped:
  a compaction must never re-deliver the table;
- a commit with ``removes`` that rewrites rows (merge/update/delete)
  RAISES by default; ``skipChangeCommits=true`` skips it whole;
- ``startingVersion`` (default 0) picks where the follow begins —
  0 streams the full history from the initial snapshot, ``latest``
  starts at the current head (new appends only).

Execution model: the driver only lists tiny commit JSONs (the same
checkpoint-bounded metadata reads as every other consumer); each ADDED
FILE becomes one ``InputPartition`` read on executors with PURE pyarrow
(no SparkSession exists there — the reason the partition reader cannot
delegate to the DataFrame-based ``diff()``), aligned to the logical
schema (missing columns NULL-filled, post-evolution extras dropped,
COLUMN MAPPING applied physical→logical from the partition's carried
map). That makes the source distributed at any scale: a 10k-file
backfill interval is 10k independent Arrow reads.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from database_anonymiser_spark.sources.versioned import (
    ROW_PRESERVING_OPS,
    _list_versions,
    _log_path,
    _replay,
)


class _FilePartition(InputPartition):
    def __init__(self, path: str, arrow_schema_physical, logical_names: list):
        self.path = path
        #: the logical schema rendered in PHYSICAL field names as a
        #: pyarrow schema (pickled to the executor) — pyarrow.dataset
        #: projects against it, NULL-filling columns a pre-evolution
        #: file lacks and dropping post-evolution extras, with the
        #: right types
        self.arrow_schema_physical = arrow_schema_physical
        self.logical_names = logical_names


def _read_file_aligned(part: _FilePartition):
    """One partition = one parquet file, read with pure pyarrow and
    aligned to the logical schema: dataset-projection against the
    physical rendering (typed NULL-fill for pre-evolution files,
    post-evolution extras dropped), then one rename physical→logical.
    Yields Arrow RecordBatches (the zero-copy path into Spark)."""
    import pyarrow.dataset as ds

    tbl = ds.dataset(part.path, schema=part.arrow_schema_physical).to_table()
    tbl = tbl.rename_columns(part.logical_names)
    for batch in tbl.to_batches(max_chunksize=65536):
        yield batch


def _snapshot_state(root: str):
    """(live entries, logical schema json, colmap) at the latest version
    — pure file I/O (usable from the driver-side planner without a
    SparkSession)."""
    p = Path(root)
    versions = _list_versions(p)
    if not versions:
        raise FileNotFoundError(f"no versioned table at {root}")
    live, _key, _cons, schema, _stats, colmap = _replay(p, versions[-1])
    if schema is None:
        raise ValueError(
            "versioned DataSource requires a logged schema (legacy table)"
        )
    return live, schema, colmap


def _arrow_physical(schema_json: dict, colmap: dict):
    """(physical-named pyarrow schema, logical name list) for the logged
    logical schema — built driver-side (needs pyspark's type bridge),
    pickled into every partition."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    logical = StructType.fromJson(schema_json)
    arrow = to_arrow_schema(logical)
    m = dict((colmap or {}).get("map") or {})
    names = [f.name for f in logical.fields]
    phys = pa.schema(
        [arrow.field(i).with_name(m.get(names[i], names[i]))
         for i in range(len(names))]
    )
    return phys, names


class _SnapshotReader(DataSourceReader):
    def __init__(self, root: str):
        self.root = root

    def partitions(self):
        live, schema, colmap = _snapshot_state(self.root)
        phys, names = _arrow_physical(schema, colmap)
        out = []
        for e in live.values():
            path = e["path"]
            if not os.path.isabs(path):
                path = str(Path(self.root) / path)
            out.append(_FilePartition(path, phys, names))
        return out or [None]

    def read(self, partition):
        if partition is None:
            return iter(())
        return _read_file_aligned(partition)


class _ChangesStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, options: dict):
        self.root = root
        self.skip_change = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        sv = str(options.get("startingversion", "0"))
        p = Path(root)
        versions = _list_versions(p)
        if not versions:
            raise FileNotFoundError(f"no versioned table at {root}")
        if sv == "latest":
            # start at the head: deliver only commits AFTER stream start
            self.start_version = versions[-1]
        else:
            # deliver (start_version-1, ...] i.e. include start_version
            self.start_version = max(int(sv) - 1, -1)

    def initialOffset(self):
        return {"version": self.start_version}

    def latestOffset(self):
        versions = _list_versions(Path(self.root))
        return {"version": versions[-1] if versions else self.start_version}

    def partitions(self, start: dict, end: dict):
        a, b = int(start["version"]), int(end["version"])
        if b <= a:
            return [None]
        p = Path(self.root)
        # schema/colmap AS OF the interval end — the batch's logical view
        _live, _key, _cons, schema, _stats, colmap = _replay(p, b)
        if schema is None:
            raise ValueError("streaming a legacy table without a logged schema")
        phys, names = _arrow_physical(schema, colmap)
        out = []
        for v in [x for x in _list_versions(p) if a < x <= b]:
            rec = json.loads(_log_path(p, v).read_text())
            op = rec.get("op")
            if op in ROW_PRESERVING_OPS:
                continue  # housekeeping: the row set did not change
            if rec.get("removes"):
                if self.skip_change:
                    continue
                raise RuntimeError(
                    f"commit {v} ({op}) changes existing rows; a versioned "
                    "table used as a stream source processes APPENDS — set "
                    "skipChangeCommits=true to skip rewrite commits (the "
                    "Delta streaming-source contract)"
                )
            for add in rec.get("adds", []):
                path = add["path"]
                if not os.path.isabs(path):
                    path = str(p / path)
                out.append(_FilePartition(path, phys, names))
        return out or [None]

    def read(self, partition):
        if partition is None:
            return iter(())
        return _read_file_aligned(partition)

    def commit(self, end):
        pass  # offsets live in Spark's streaming checkpoint


class VersionedDataSource(DataSource):
    """``spark.dataSource.register(VersionedDataSource)`` →
    ``format("versioned")`` for both batch snapshots and streaming
    follows of a versioned table (module docstring for semantics)."""

    @classmethod
    def name(cls):
        return "versioned"

    def schema(self):
        _live, schema, _colmap = _snapshot_state(self._path())
        return StructType.fromJson(schema)

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("option 'path' (table root) is required")
        return path

    def reader(self, schema):
        return _SnapshotReader(self._path())

    def streamReader(self, schema):
        return _ChangesStreamReader(self._path(), dict(self.options))
