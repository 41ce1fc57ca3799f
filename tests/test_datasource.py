"""format("versioned") — the Spark Python DataSource face (round 9).

Batch snapshots and streaming follows of a versioned table through
Spark's own source API: Delta streaming-source semantics (appends
stream; row-preserving housekeeping skipped; rewrite commits refuse
unless skipChangeCommits), pure-pyarrow partition reads, column-mapping
aware.
"""

from __future__ import annotations

import os

import pytest

from database_anonymiser_spark.sources.versioned import VersionedTable


@pytest.fixture()
def registered(spark):
    from database_anonymiser_spark.sources.spark_datasource import (
        VersionedDataSource,
    )

    spark.dataSource.register(VersionedDataSource)
    return spark


def _drain(spark, root, out_dir, ck, **opts):
    reader = spark.readStream.format("versioned").option("path", str(root))
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_versioned_datasource_batch_and_stream(registered, tmp_path):
    spark = registered
    root = tmp_path / "t"
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(100)],
        "k long, name string, v double",
    )
    t = VersionedTable.create(spark, root, df, key_col="k")
    # column mapping must be transparent to the source
    t.rename_column("v", "score")
    t.append(
        spark.createDataFrame([(200, "x", 1.5)], "k long, name string, score double")
    )

    # batch face: snapshot parity under the logical (renamed) schema
    got = spark.read.format("versioned").option("path", str(root)).load()
    assert [f.name for f in got.schema.fields] == ["k", "name", "score"]
    assert got.count() == 101
    assert got.where("score = 1.5").first()["k"] == 200
    assert got.where("score = 42.0").first()["name"] == "n42"

    # streaming face: initial drain delivers the full history
    out_dir, ck = tmp_path / "out", tmp_path / "ck"
    _drain(spark, root, out_dir, ck)
    assert spark.read.parquet(str(out_dir)).count() == 101

    # append streams; compaction (row-preserving) must NOT re-deliver
    t.append(
        spark.createDataFrame([(300, "y", 2.5)], "k long, name string, score double")
    )
    t.compact()
    _drain(spark, root, out_dir, ck)
    assert spark.read.parquet(str(out_dir)).count() == 102

    # rewrite commit: refuse by default (Delta streaming-source contract)
    t.merge(
        spark.createDataFrame([(1, "UPD", 0.25)], "k long, name string, score double"),
        when_matched="update",
    )
    with pytest.raises(Exception, match="APPENDS|skipChangeCommits"):
        _drain(spark, root, out_dir, ck)
    # ...and skip it whole when asked
    _drain(spark, root, out_dir, ck, skipChangeCommits="true")
    assert spark.read.parquet(str(out_dir)).count() == 102

    # startingVersion: a fresh follow from the head sees only the future
    t.append(
        spark.createDataFrame([(400, "z", 3.5)], "k long, name string, score double")
    )
    out2, ck2 = tmp_path / "out2", tmp_path / "ck2"
    _drain(
        spark, root, out2, ck2, startingVersion=str(t.latest_version())
    )
    assert [r["k"] for r in spark.read.parquet(str(out2)).collect()] == [400]


def test_versioned_datasource_schema_evolution_null_fill(registered, tmp_path):
    """Files written before an additive evolution NULL-fill through the
    pure-arrow partition reader (dataset projection), exactly like the
    native snapshot path."""
    spark = registered
    root = tmp_path / "e"
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame([(1, "a")], "k long, name string"),
        key_col="k",
    )
    t.append(
        spark.createDataFrame([(2, "b", 9)], "k long, name string, extra long"),
        merge_schema=True,
    )
    got = spark.read.format("versioned").option("path", str(root)).load()
    rows = {r["k"]: r["extra"] for r in got.collect()}
    assert rows == {1: None, 2: 9}
