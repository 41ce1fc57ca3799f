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
