"""Shared storage-layer bench lifecycle (bench.py's storage_churn and
tools/bench_scale.py's cross-scale point run the SAME code so the two
numbers are comparable by construction).

The lifecycle: create a versioned table from the fixture's orders →
5 trickle merges over contiguous 2k-key bands → scoped update → scoped
delete → bin-packing compact → retention vacuum → snapshot + change
feed. The TRICKLE IS FIXED-SIZE BY DESIGN across scale factors: at 10×
the data the merge/update/delete cost should stay ~flat (file-skipping
rewrites only the key-intersecting files) while create/compact scale
with the data — exactly the shape a 100 TB table with a trickle of
updates needs, and what the cross-scale table in README.md checks.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def storage_churn(spark, sf_dir: str, meta: dict) -> int:
    """One lifecycle; records COMMIT_READS / DATA_FILES_READ deltas of
    the run into ``meta`` and returns the row count witness."""
    import database_anonymiser_spark.sources.versioned as V
    from database_anonymiser_spark.suite.base import load

    root = tempfile.mkdtemp(prefix="bench_vt_")
    shutil.rmtree(root)
    c0, f0 = V.COMMIT_READS, V.DATA_FILES_READ
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus"
    )
    try:
        t = V.VersionedTable.create(
            spark, root, orders.repartitionByRange(8, "o_orderkey"),
            key_col="o_orderkey",
        )
        v0 = t.latest_version()
        for i in range(5):  # trickle: contiguous 2k-key bands
            lo, hi = 1 + i * 2000, (i + 1) * 2000
            t.merge(
                orders.where(F.col("o_orderkey").between(lo, hi)).withColumn(
                    "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
                )
            )
        t.update_where(
            {"o_orderstatus": F.lit("X")},
            F.col("o_orderkey") <= 1000,
            prune={"o_orderkey": (1, 1000)},
        )
        t.delete_where(
            F.col("o_orderkey").between(11000, 12000),
            prune={"o_orderkey": (11000, 12000)},
        )
        t.compact(target_file_bytes=64 * 1024 * 1024)
        t.vacuum(retain_versions=3)
        n = t.snapshot().count()
        # the change feed must stay inside the retention window —
        # versions older than retain_versions are reclaimed (Delta's
        # CDF-after-VACUUM contract); v0 here marks the window start
        d = t.diff(max(v0, t.latest_version() - 2)).count()
        meta["commit_reads"] = V.COMMIT_READS - c0
        meta["data_files_read"] = V.DATA_FILES_READ - f0
        return n + d
    finally:
        shutil.rmtree(root, ignore_errors=True)
