"""The round-13 SQL DML FACE (sql_dml.py) under the oracle gate —
UPDATE, DELETE and MERGE INTO as raw SQL statement strings routed
through ``execute_dml`` exactly as ``--sql`` mode routes them, with the
post-lineage snapshot value-hash checked against a DuckDB oracle that
replays the three statements as CASE/WHERE/UNION relational algebra.

This puts the statement PARSER + ROUTER itself under the oracle (the
native ops it routes to are already oracle-checked by ``merge_upsert``):
a mis-parsed predicate, a swapped clause order, or a broken alias
rewrite would change the final state and hash-mismatch. The reference's
entire execution surface is statements of exactly this class
(``src/executor/query-builder.ts:58-61``).

NOT a standalone registry entry: the declared suite is pinned at exactly
50 names (the driver's correctness window — a 51st would evict
``window_pack``), so this rides as the ``variant='sqldml'`` rows of
``merge_upsert`` (the transaction-lineage entry). The CTE fragment and
union arm below splice into that entry's oracle.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from database_anonymiser_spark.suite.base import load

_SHIFT = 10_000_000

#: CTEs replaying v1 (SQL UPDATE) and v2 (SQL DELETE) — spliced into the
#: merge_upsert oracle's WITH list (names prefixed sd_ to stay disjoint).
SQL_DML_CTES = """
    sd_state1 AS (
      -- SQL DML v1: UPDATE cust SET c_acctbal = -c_acctbal,
      --   c_mktsegment = 'SQLUPD' WHERE c_custkey % 7 = 0
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 7 = 0 THEN -c_acctbal ELSE c_acctbal END
               AS c_acctbal,
             CASE WHEN c_custkey % 7 = 0 THEN 'SQLUPD' ELSE c_mktsegment END
               AS c_mktsegment
      FROM customer
    ),
    sd_state2 AS (
      -- SQL DML v2: DELETE FROM cust WHERE c_custkey % 13 = 0
      SELECT * FROM sd_state1 WHERE c_custkey % 13 <> 0
    )
"""

#: The post-MERGE final state (v3) as a 4-arm union over the CTEs above —
#: matched d<0 deletes, other matched update (+d, 'SQLMRG'), unmatched
#: d>0 values-dict inserts; the source is every 3rd ORIGINAL key (so keys
#: deleted at v2 exercise the unmatched path) plus shifted clones of
#: every 37th, d = key%100 - 50.
#:
#: Round 14 — the MERGE carries a RESIDUAL ON (`AND c.c_mktsegment <>
#: 'SQLUPD'`, the full-ON grammar): key-matched pairs whose target row
#: was retagged 'SQLUPD' at v1 FAIL the residual, so the matched clauses
#: (delete/update) skip them — they stay verbatim (first arm's OR) — and
#: their source rows never insert (the key-uniqueness deviation the
#: sql_dml module docstring pins).
SQL_DML_FINAL = f"""
    SELECT * FROM sd_state2
    WHERE c_custkey % 3 <> 0 OR c_mktsegment = 'SQLUPD'
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey,
           c_acctbal + ((c_custkey % 100) - 50) AS c_acctbal,
           'SQLMRG' AS c_mktsegment
    FROM sd_state2
    WHERE c_custkey % 3 = 0 AND c_mktsegment <> 'SQLUPD'
      AND (c_custkey % 100) - 50 >= 0
    UNION ALL
    SELECT c_custkey, 'SQLNEW' AS c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST((c_custkey % 100) - 50 AS DOUBLE) AS c_acctbal,
           'SQLNEW' AS c_mktsegment
    FROM customer
    WHERE c_custkey % 3 = 0 AND c_custkey % 13 = 0
      AND (c_custkey % 100) - 50 > 0
    UNION ALL
    SELECT c_custkey + {_SHIFT}, 'SQLNEW' AS c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST(((c_custkey + {_SHIFT}) % 100) - 50 AS DOUBLE) AS c_acctbal,
           'SQLNEW' AS c_mktsegment
    FROM customer
    WHERE c_custkey % 37 = 0 AND ((c_custkey + {_SHIFT}) % 100) - 50 > 0
    UNION ALL
    -- SQL DML v4: INSERT INTO cust (c_custkey, c_name, c_acctbal,
    --   c_mktsegment) SELECT ... — the append route; unnamed
    --   c_nationkey NULL-fills
    SELECT c_custkey + {2 * _SHIFT}, c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           c_acctbal, 'SQLINS' AS c_mktsegment
    FROM customer WHERE c_custkey % 41 = 0
"""


def sql_dml_state(spark, sf_dir):
    """Drive three SQL DML statements through ``execute_dml`` (the same
    entry point ``--sql`` mode uses) against a fresh versioned customer
    table and return the committed post-lineage snapshot:

    - v1 ``UPDATE`` with a two-column SET and a modular WHERE,
    - v2 ``DELETE`` with a WHERE,
    - v3 multi-clause ``MERGE INTO`` (conditional matched DELETE, matched
      UPDATE with source arithmetic in SET, conditional values-dict
      INSERT) against a temp-view source whose keys include vanished
      targets (unmatched path) and fresh shifted clones.

    Scale shape: each statement is ONE commit through the native
    copy-on-write ops (file skipping, OCC rebase, constraint checks all
    apply — the parser adds a driver-side skeleton scan of the statement
    STRING only, never a data pass)."""
    from database_anonymiser_spark.sources.versioned import VersionedTable
    from database_anonymiser_spark.sql_dml import execute_dml

    cust = load(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="sql_dml_")
    t = VersionedTable.create(spark, f"{root}/cust", cust, key_col="c_custkey")
    views = {"cust": {"root": f"{root}/cust", "pinned": False}}

    execute_dml(
        spark,
        "UPDATE cust SET c_acctbal = -c_acctbal, c_mktsegment = 'SQLUPD' "
        "WHERE c_custkey % 7 = 0",
        views,
    )
    execute_dml(spark, "DELETE FROM cust WHERE c_custkey % 13 = 0", views)

    k = F.col("c_custkey")
    src = (
        cust.where(k % 3 == 0)
        .select("c_custkey")
        .unionByName(
            cust.where(k % 37 == 0).select((k + _SHIFT).alias("c_custkey"))
        )
        .withColumn("d", (F.col("c_custkey") % 100 - 50).cast("long"))
    )
    src.createOrReplaceTempView("sql_dml_src")
    execute_dml(
        spark,
        "MERGE INTO cust AS c USING sql_dml_src AS u "
        "ON c.c_custkey = u.c_custkey AND c.c_mktsegment <> 'SQLUPD' "
        "WHEN MATCHED AND u.d < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET "
        "c_acctbal = c.c_acctbal + u.d, c_mktsegment = 'SQLMRG' "
        "WHEN NOT MATCHED AND u.d > 0 THEN INSERT "
        "(c_custkey, c_name, c_acctbal, c_mktsegment) "
        "VALUES (u.c_custkey, 'SQLNEW', CAST(u.d AS DOUBLE), 'SQLNEW')",
        views,
    )
    # v4 (round 13 cont.): the INSERT route — a query source with an
    # explicit column list; the unnamed c_nationkey NULL-fills
    cust.createOrReplaceTempView("sql_dml_customer")
    execute_dml(
        spark,
        "INSERT INTO cust (c_custkey, c_name, c_acctbal, c_mktsegment) "
        f"SELECT c_custkey + {2 * _SHIFT}, c_name, c_acctbal, 'SQLINS' "
        "FROM sql_dml_customer WHERE c_custkey % 41 = 0",
        views,
    )
    return t.snapshot()


def sql_txn_state(spark, sf_dir):
    """Round 14: the SAME four-statement lineage as
    :func:`sql_dml_state`, but wrapped in ``BEGIN .. COMMIT`` and run
    through :class:`~database_anonymiser_spark.sql_txn.ScriptTransaction`
    (the ``--sqlFile`` transaction runner) — the reference's whole-apply
    transaction shape (``src/main.ts:102-111``). All four statements
    stage against a shallow-clone workspace and publish as ONE
    ``txn_publish`` commit; the final snapshot must be value-identical
    to the per-statement run, which the shared oracle arm pins
    (variant='sqltxn' vs variant='sqldml' hash against the same
    relational rendering). The atomic shape itself is asserted here:
    exactly one commit above the create, nothing in between.

    Scale shape: the fork is a metadata-only shallow clone; each
    statement pays its normal copy-on-write + file-skipping cost against
    the fork; COMMIT is O(changed files) renames + one tiny-JSON commit
    — a transaction costs the same bytes as its statements run bare."""
    from database_anonymiser_spark.sources.versioned import VersionedTable
    from database_anonymiser_spark.sql_txn import ScriptTransaction

    cust = load(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="sql_txn_")
    t = VersionedTable.create(spark, f"{root}/cust", cust, key_col="c_custkey")
    views = {"cust": {"root": f"{root}/cust", "pinned": False}}

    k = F.col("c_custkey")
    src = (
        cust.where(k % 3 == 0)
        .select("c_custkey")
        .unionByName(
            cust.where(k % 37 == 0).select((k + _SHIFT).alias("c_custkey"))
        )
        .withColumn("d", (F.col("c_custkey") % 100 - 50).cast("long"))
    )
    src.createOrReplaceTempView("sql_txn_src")
    cust.createOrReplaceTempView("sql_txn_customer")

    txn = ScriptTransaction(spark, views)
    txn.execute(
        "UPDATE cust SET c_acctbal = -c_acctbal, c_mktsegment = 'SQLUPD' "
        "WHERE c_custkey % 7 = 0"
    )
    txn.execute("DELETE FROM cust WHERE c_custkey % 13 = 0")
    txn.execute(
        "MERGE INTO cust AS c USING sql_txn_src AS u "
        "ON c.c_custkey = u.c_custkey AND c.c_mktsegment <> 'SQLUPD' "
        "WHEN MATCHED AND u.d < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET "
        "c_acctbal = c.c_acctbal + u.d, c_mktsegment = 'SQLMRG' "
        "WHEN NOT MATCHED AND u.d > 0 THEN INSERT "
        "(c_custkey, c_name, c_acctbal, c_mktsegment) "
        "VALUES (u.c_custkey, 'SQLNEW', CAST(u.d AS DOUBLE), 'SQLNEW')"
    )
    txn.execute(
        "INSERT INTO cust (c_custkey, c_name, c_acctbal, c_mktsegment) "
        f"SELECT c_custkey + {2 * _SHIFT}, c_name, c_acctbal, 'SQLINS' "
        "FROM sql_txn_customer WHERE c_custkey % 41 = 0"
    )
    txn.commit()
    # the atomic shape IS the claim: exactly one publish above the create
    assert t.latest_version() == 1, t.latest_version()
    assert t.commit_op(1) == "txn_publish", t.commit_op(1)
    return t.snapshot()
