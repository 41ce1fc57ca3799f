"""Declared MERGE query over the versioned-table layer (sources/versioned.py).

The one suite entry with a WRITE in the middle: it materializes the customer
table as a versioned parquet table in a fresh temp directory, MERGEs a
deterministic source (updates + inserts derived from the same fixture), and
returns the post-merge snapshot. MERGE output is a pure function of
(target, source), so the DuckDB oracle reproduces it with an anti-join +
CASE + UNION rendering — the transactional path is value-hash checked like
every read-only operator.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from database_anonymiser_spark.suite.base import load, register

#: updates hit every 7th key; inserts clone every 31st key shifted past the
#: key space — both pure functions of the fixture
_UPD_MOD = 7
_INS_MOD = 31
_INS_SHIFT = 10_000_000


@register(
    "merge_upsert",
    f"""
    WITH m AS (
      SELECT c_custkey,
             c_name,
             c_nationkey,
             CASE WHEN c_custkey % {_UPD_MOD} = 0 THEN -c_acctbal ELSE c_acctbal END
               AS c_acctbal,
             CASE WHEN c_custkey % {_UPD_MOD} = 0 THEN 'MERGED' ELSE c_mktsegment END
               AS c_mktsegment
      FROM customer
      UNION ALL
      SELECT c_custkey + {_INS_SHIFT} AS c_custkey,
             c_name,
             c_nationkey,
             c_acctbal,
             'INSERTED' AS c_mktsegment
      FROM customer
      WHERE c_custkey % {_INS_MOD} = 0
    )
    SELECT c_custkey,
           c_name,
           c_nationkey,
           CASE WHEN c_mktsegment = 'INSERTED' THEN c_acctbal + 1000.0
                ELSE c_acctbal END AS c_acctbal,
           c_mktsegment
    FROM m
    WHERE NOT (c_custkey % 13 = 0)
    """,
    tags=("transaction", "merge"),
)
def merge_upsert(spark, sf_dir):
    """MERGE (upsert) through the transaction-log table: update every 7th
    customer (negate acctbal, retag segment), insert clones of every 31st
    customer shifted past the key space, then read the committed snapshot.

    Scale shape: the merge rewrites only data files whose footer key range
    intersects the source keys (here: all files, since updates span the
    key space — the skipping property itself is pinned in
    tests/test_versioned.py), the commit is one atomic exclusive-create,
    and the returned snapshot is a plain parquet scan of the new version's
    live files. The temp table lives under the OS tmpdir for the duration
    of the read (the snapshot is lazy — files must outlive the caller's
    collect).

    Round 5: after the MERGE the table is Z-ORDER-OPTIMIZED on
    (c_nationkey, c_acctbal) and the POST-OPTIMIZE snapshot is returned —
    the oracle is unchanged because OPTIMIZE must preserve the row set
    exactly, so the layout rewrite (bit-interleaved clustering +
    per-column skipping stats) is itself value-hash checked cross-engine;
    the pruning behavior the layout buys is pinned separately in
    tests/test_versioned.py.

    Round 6: the entry then drives the SCOPED mutation path through the
    same log — ``update_where`` bumps every INSERTED clone's balance by
    1000 under a key-range prune implied by the predicate (inserted keys
    all sit past _INS_SHIFT: the file-skipping write path itself is under
    the oracle now, not only under pytest), and ``delete_where`` drops
    every 13th key — so the returned snapshot hash-checks MERGE +
    OPTIMIZE + UPDATE + DELETE as one committed lineage (versions
    0..4). The DuckDB oracle replays them as CASE + WHERE over the merge
    CTE."""
    from database_anonymiser_spark.sources.versioned import VersionedTable

    cust = load(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="merge_upsert_")
    t = VersionedTable.create(spark, f"{root}/t", cust, key_col="c_custkey")

    updates = (
        cust.where(F.col("c_custkey") % _UPD_MOD == 0)
        .withColumn("c_acctbal", -F.col("c_acctbal"))
        .withColumn("c_mktsegment", F.lit("MERGED"))
    )
    inserts = (
        cust.where(F.col("c_custkey") % _INS_MOD == 0)
        .withColumn("c_custkey", F.col("c_custkey") + _INS_SHIFT)
        .withColumn("c_mktsegment", F.lit("INSERTED"))
    )
    t.merge(updates.unionByName(inserts), when_matched="update")
    t.optimize_zorder(("c_nationkey", "c_acctbal"), file_count=4)
    t.update_where(
        {"c_acctbal": F.col("c_acctbal") + 1000.0},
        F.col("c_mktsegment") == "INSERTED",
        # implied by the predicate: only the shifted clones are INSERTED
        prune={"c_custkey": (_INS_SHIFT, 2 * _INS_SHIFT)},
    )
    t.delete_where(F.col("c_custkey") % 13 == 0)
    return t.snapshot()
