"""Parquet-directory catalog: the engine's schema source.

Rebuilds the reference's ``information_schema`` scans
(``src/schema/schema-reader.ts:15-51``) over a directory of parquet files —
one file per table, schemas self-described by parquet footers (no extra
catalog round-trip; strictly cheaper than the reference's 1+N queries).

At 100 TB each "table" is a partitioned parquet dataset; nothing here changes
— ``spark.read.parquet`` unifies footers, and listing stays a driver-side
metadata operation.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_anonymiser_spark.types import group_for_field


import warnings
from functools import lru_cache


def _nanos_timestamp_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — unreadable by Spark
    natively.

    Glob patterns are expanded first (pyarrow's ``ds.dataset`` takes
    concrete paths, not patterns); every file of one dataset shares an
    encoding, so probing the first match suffices. A target that matches no
    files, is empty, or fails to read WARNS and returns () WITHOUT caching —
    a later call re-probes once files exist. (The earlier bare-except form
    silently classified such sources as micro-precision and the lru_cache
    pinned that wrong answer for the process lifetime, breaking ns-encoded
    streams defined over a not-yet-populated directory.) Successful probes
    are cached per concrete path: footers don't change for a given fixture
    path, and every load() would otherwise pay a pyarrow footer read."""
    import glob as _glob
    import os

    target = path
    if any(ch in path for ch in "*?["):
        matches = sorted(_glob.glob(path))
        if not matches:
            warnings.warn(
                f"nanos-probe: no files match {path!r} yet; assuming no "
                "TIMESTAMP(NANOS) columns (pass an explicit schema to "
                "stream_events to skip the probe)",
                stacklevel=2,
            )
            return ()
        target = matches[0]
    if os.path.isdir(target) and not any(
        f.endswith(".parquet") for _, _, fs in os.walk(target) for f in fs
    ):
        warnings.warn(
            f"nanos-probe: {target!r} holds no parquet files yet; assuming no "
            "TIMESTAMP(NANOS) columns (pass an explicit schema to "
            "stream_events to skip the probe)",
            stacklevel=2,
        )
        return ()
    try:
        return _nanos_probe_cached(target)
    except Exception as e:
        warnings.warn(
            f"nanos-probe failed for {target!r} ({e}); assuming no "
            "TIMESTAMP(NANOS) columns",
            stacklevel=2,
        )
        return ()


@lru_cache(maxsize=1024)
def _nanos_probe_cached(path: str) -> tuple[str, ...]:
    import pyarrow as pa
    import pyarrow.dataset as ds

    schema = ds.dataset(path, format="parquet").schema
    return tuple(
        f.name
        for f in schema
        if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
    )


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` + lossless ns-timestamp repair.

    With ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py),
    TIMESTAMP(NANOS) columns arrive as epoch-nanos longs; we convert them to
    ``timestamp_ntz`` via integer division (no double round-trip — epoch-ns
    exceeds float53 precision). This is a cheap projection, fully codegen'd.
    """
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_columns(path):
        df = df.withColumn(
            c, F.expr(f"cast(timestamp_micros(`{c}` div 1000) as timestamp_ntz)")
        )
    return df


@dataclass(frozen=True)
class TableInfo:
    """≅ TableInfo (schema-reader.ts:9-13)."""

    schema: str
    name: str
    path: str


class ParquetCatalog:
    """A namespace ("schema") of tables backed by ``<dir>/<table>.parquet``."""

    def __init__(self, spark: SparkSession, root: str | Path, schema_name: str = "public"):
        self.spark = spark
        self.root = Path(root)
        self.schema_name = schema_name

    def list_tables(self) -> list[TableInfo]:
        """All base tables, ordered by name (≅ schema-reader.ts:16-25)."""
        out = []
        for p in sorted(self.root.glob("*.parquet")):
            out.append(TableInfo(self.schema_name, p.stem, str(p)))
        return out

    def table_path(self, name: str) -> str:
        return str(self.root / f"{name}.parquet")

    def read(self, name: str) -> DataFrame:
        return read_parquet_table(self.spark, self.table_path(name))

    def schema_of(self, name: str) -> T.StructType:
        """Live schema read (≅ executor.ts:19-39's per-table type re-read)."""
        return self.read(name).schema

    def columns_df(self) -> DataFrame:
        """Catalog-as-DataFrame: (table_name, column_name, ordinal, data_type,
        type_group, nullable), ordered like schema-reader.ts:22,35.

        Metadata-only (reads parquet footers, no row data) — safe at any scale.
        """
        rows = []
        for t in self.list_tables():
            for i, f in enumerate(self.schema_of(t.name).fields):
                rows.append(
                    (
                        t.name,
                        f.name,
                        i + 1,
                        f.dataType.simpleString(),
                        group_for_field(f).value,
                        bool(f.nullable),
                    )
                )
        schema = T.StructType(
            [
                T.StructField("table_name", T.StringType(), False),
                T.StructField("column_name", T.StringType(), False),
                T.StructField("ordinal", T.IntegerType(), False),
                T.StructField("data_type", T.StringType(), False),
                T.StructField("type_group", T.StringType(), False),
                T.StructField("nullable", T.BooleanType(), False),
            ]
        )
        return self.spark.createDataFrame(rows, schema).orderBy("table_name", "ordinal")
