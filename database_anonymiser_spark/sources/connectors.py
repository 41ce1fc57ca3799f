"""Format-dispatched readers/writers + JDBC connector.

Design rules for 100 TB:
- Parquet is the only hot-path format (columnar, footer stats, predicate
  pushdown, splittable). CSV/JSON are interchange formats: schema must be
  supplied or inferred once and pinned — never per-job inference over the
  full dataset (``samplingRatio`` caps the inference scan).
- JDBC reads MUST be partitioned (``partitionColumn``/bounds/num) or the
  whole table funnels through one task — the option is mandatory here, not
  optional, for any table above ``JDBC_SINGLE_TASK_MAX_ROWS``.
- Writers go through a staging path + atomic rename, same promote protocol
  as the executor's apply (C5) — a failed job never corrupts the target.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "csv", "json", "orc")

# above this, an unpartitioned JDBC read is refused (single-task funnel)
JDBC_SINGLE_TASK_MAX_ROWS = 1_000_000


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Read one table from ``path`` in ``fmt``.

    CSV defaults: header on, schema required-or-inferred-once. JSON: lines
    mode (the only splittable JSON layout). Parquet delegates to the
    catalog's nanos-timestamp repair so every format yields identical
    schemas for the same data.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt == "parquet":
        from database_anonymiser_spark.catalog import read_parquet_table

        return read_parquet_table(spark, path)
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", options.get("header", "true"))
        if schema is None:
            # one bounded inference pass, never a second full scan
            reader = reader.option("inferSchema", "true").option(
                "samplingRatio", options.get("samplingRatio", "0.1")
            )
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    staged: bool = True,
    **options,
) -> str:
    """Write ``df`` to ``path``; with ``staged`` (default) the job writes to a
    sibling staging dir and atomically renames on success (C5 promote
    protocol — a mid-job failure leaves the target untouched).

    Returns the final path.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    target = Path(path)
    dest = target
    if staged:
        dest = target.parent / f"_staging_{target.name}_{uuid.uuid4().hex[:8]}"
    writer = df.write.format(fmt).mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(str(dest))
    if staged:
        if target.exists():
            import shutil

            shutil.rmtree(target)
        dest.rename(target)
    return str(target)


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    expected_rows: int | None = None,
    **options,
) -> DataFrame:
    """JDBC source — the faithful analogue of the reference's ``pg`` client
    (``src/db/postgres.client.ts``), but partitioned: the reference funnels
    every row through one connection; here each of ``num_partitions`` tasks
    opens its own connection over a bounded key range.

    Refuses an unpartitioned read when ``expected_rows`` exceeds
    JDBC_SINGLE_TASK_MAX_ROWS — the silent single-task funnel is the classic
    JDBC-at-scale failure.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
        .options(**options)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    elif expected_rows is not None and expected_rows > JDBC_SINGLE_TASK_MAX_ROWS:
        raise ValueError(
            f"unpartitioned JDBC read of ~{expected_rows} rows would funnel "
            "through one task; pass partition_column/lower_bound/upper_bound"
        )
    return reader.load()


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_cols`` (optionally sorted
    within buckets) as a catalog table.

    Bucketing pre-pays a join/agg shuffle at write time: two tables bucketed
    on the same keys with the same bucket count sort-merge-join with ZERO
    exchange (tests/test_plans.py pins this). This is THE co-location tool
    for repeated fact-fact joins at 100 TB — the shuffle happens once per
    ingest instead of once per query.
    """
    writer = df.write.format("parquet").mode("overwrite")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw-text corpus ingestion — the front door of an LLM data pipeline.

    ``spark.read.text``: one ``value`` row per line (splittable — a 100 TB
    dump fans out across executors at newline boundaries), or per FILE with
    ``whole_file`` (wholetext mode: NOT splittable, one task per file — use
    only when documents are files). ``line_sep`` handles corpora delimited
    by something other than newline (e.g. ``\\0``-separated documents).
    Attaches the source filename (input_file_name) so provenance survives
    into downstream dedup/split keys.
    """
    from pyspark.sql import functions as F

    return spark.read.text(path, wholetext=whole_file, lineSep=line_sep).select(
        F.input_file_name().alias("source_file"), F.col("value").alias("text")
    )


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Multimodal payload ingestion via Spark's ``binaryFile`` source:
    (path, modificationTime, length, content) with content as an opaque
    binary column — exactly the shape operators/multimodal.py consumes
    (attach typed metadata, then mapInPandas decode/feature stages).

    The source never splits a file, so payload bytes stay contiguous per
    row; size partitioning is governed by files.maxPartitionBytes. Filter
    by ``glob`` (pathGlobFilter) to prune at LISTING time — non-matching
    files are never opened.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
