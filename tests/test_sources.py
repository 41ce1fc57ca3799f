"""Connector tests: format round-trips preserve data; staged writes promote
atomically; JDBC guard refuses unpartitioned big reads."""

import pytest
from pyspark.sql import functions as F

from database_anonymiser_spark.sources import jdbc_reader, read_table, write_table


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return read_table(spark, f"{sf_dir}/customer.parquet")


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_roundtrip(spark, customer, tmp_path_factory, fmt):
    out = str(tmp_path_factory.mktemp("rt") / f"customer_{fmt}")
    write_table(customer, out, fmt=fmt)
    back = read_table(spark, out, fmt=fmt, schema=customer.schema)
    assert back.count() == customer.count()
    a = customer.agg(F.sum("c_custkey"), F.sum(F.round("c_acctbal", 2))).collect()[0]
    b = back.agg(F.sum("c_custkey"), F.sum(F.round("c_acctbal", 2))).collect()[0]
    assert a[0] == b[0]
    assert abs(a[1] - b[1]) < 1e-6


def test_staged_write_promotes(spark, customer, tmp_path):
    out = tmp_path / "t.parquet"
    final = write_table(customer, str(out), fmt="parquet", staged=True)
    assert final == str(out) and out.exists()
    assert not list(out.parent.glob("_staging_*"))  # no leftovers
    # overwrite through staging replaces the old data atomically
    write_table(customer.limit(10), str(out), fmt="parquet", staged=True)
    assert read_table(spark, str(out)).count() == 10


def test_jdbc_guard_refuses_unpartitioned_big_read(spark):
    with pytest.raises(ValueError, match="funnel"):
        jdbc_reader(
            spark, "jdbc:postgresql://example/db", "big_table", expected_rows=10_000_000
        )
    with pytest.raises(ValueError, match="requires lower_bound"):
        jdbc_reader(
            spark, "jdbc:postgresql://example/db", "t", partition_column="id"
        )


def test_text_corpus_reader(spark, tmp_path):
    """Line mode: one row per line with provenance; wholetext: one row per
    file (the per-document layout)."""
    from database_anonymiser_spark.sources.connectors import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo document\n")
    lines = read_text_corpus(spark, str(d)).collect()
    assert sorted(r["text"] for r in lines) == ["line one", "line two", "solo document"]
    assert all(r["source_file"].endswith((".txt",)) for r in lines)
    whole = read_text_corpus(spark, str(d), whole_file=True).collect()
    assert len(whole) == 2
    assert {r["text"].strip() for r in whole} == {"line one\nline two", "solo document"}


def test_binary_files_reader(spark, tmp_path):
    """binaryFile source: opaque content bytes + metadata, glob pruned at
    listing time — the multimodal ingest front door."""
    from database_anonymiser_spark.sources.connectors import read_binary_files

    d = tmp_path / "blobs"
    d.mkdir()
    (d / "x.bin").write_bytes(b"\x89PNG-ish")
    (d / "y.bin").write_bytes(b"RIFF-ish")
    (d / "skip.txt").write_text("not a blob")
    rows = read_binary_files(spark, str(d), glob="*.bin").collect()
    assert len(rows) == 2
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in rows}
    assert got == {"x.bin": b"\x89PNG-ish", "y.bin": b"RIFF-ish"}
    assert all(r["length"] == len(bytes(r["content"])) for r in rows)


def test_partitioned_write_prunes_partitions_at_read(spark, customer, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column must
    prune directories at PLANNING time (PartitionFilters in the scan, only
    matching files read) — at 100 TB this is the difference between
    scanning one segment and scanning the table."""
    import contextlib
    import io

    from database_anonymiser_spark.sources.connectors import write_table

    path = write_table(customer, str(tmp_path / "part"), partition_by=["c_mktsegment"])
    seg = customer.select("c_mktsegment").first()[0]
    df = spark.read.parquet(path).where(F.col("c_mktsegment") == seg)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan
    assert "c_mktsegment" in plan.split("PartitionFilters")[1].split("]")[0]
    expected = customer.where(F.col("c_mktsegment") == seg).count()
    assert df.count() == expected
