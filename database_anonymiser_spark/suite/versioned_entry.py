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
from database_anonymiser_spark.suite.sql_dml_entry import (
    SQL_DML_CTES,
    SQL_DML_FINAL,
    sql_dml_state,
    sql_txn_state,
)

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
    ),
    state3 AS (
      SELECT c_custkey,
             c_name,
             c_nationkey,
             CASE WHEN c_mktsegment = 'INSERTED' THEN c_acctbal + 1000.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM m
    ),
    snap4 AS (
      SELECT * FROM state3 WHERE NOT (c_custkey % 13 = 0)
    ),
    -- v5 APPLY CHANGES clauses: upserts = snap4 keys %11=0 (not %17=0),
    -- inserts = fresh 2x-shifted clones of every 41st customer,
    -- deletes = ORIGINAL keys %17=0 (absent ones no-op)
    upd5 AS (
      SELECT c_custkey, c_name, c_nationkey,
             c_acctbal + 7.0 AS c_acctbal, 'CDC' AS c_mktsegment
      FROM snap4
      WHERE c_custkey % 11 = 0 AND c_custkey % 17 <> 0
    ),
    new5 AS (
      SELECT c_custkey + {2 * _INS_SHIFT} AS c_custkey, c_name, c_nationkey,
             c_acctbal, 'CDCNEW' AS c_mktsegment
      FROM customer WHERE c_custkey % 41 = 0
    ),
    del5 AS (
      SELECT * FROM snap4
      WHERE c_custkey < {_INS_SHIFT} AND c_custkey % 17 = 0
    ),
    state5 AS (
      SELECT * FROM snap4
      WHERE NOT (c_custkey % 11 = 0 AND c_custkey % 17 <> 0)
        AND NOT (c_custkey < {_INS_SHIFT} AND c_custkey % 17 = 0)
      UNION ALL
      SELECT * FROM upd5
      UNION ALL
      SELECT * FROM new5
    ),
    -- v6 FULL-SYNC merge (not_matched_by_source='delete'): the source is
    -- a complete extract of state5 minus every 3rd key, with every 5th
    -- surviving key re-balanced (+2.0, 'SYNC'), plus fresh 3x-shifted
    -- clones of every 43rd customer — so state6 IS the source
    src6 AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 2.0
                  ELSE c_acctbal END AS c_acctbal,
             CASE WHEN c_custkey % 5 = 0 THEN 'SYNC'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM state5 WHERE c_custkey % 3 <> 0
      UNION ALL
      SELECT c_custkey + {3 * _INS_SHIFT} AS c_custkey, c_name, c_nationkey,
             c_acctbal, 'SYNCNEW' AS c_mktsegment
      FROM customer WHERE c_custkey % 43 = 0
    ),
    -- v7 CONDITIONAL MULTI-CLAUSE merge: the source carries only
    -- (c_custkey, d) — every EVEN state6 key plus fresh 4x-shifted
    -- clones of every 47th customer, d = (key % 100) - 50. Ordered
    -- matched clauses: d > 0 -> partial update (acctbal += d,
    -- segment 'COND', name/nationkey PRESERVED); d < -40 -> delete;
    -- else kept. Insert clause: d > 0 only, values-dict insert
    -- (name 'CLAUSENEW', unspecified nationkey/segment are NULL).
    src7 AS (
      SELECT c_custkey, (c_custkey % 100) - 50 AS d
      FROM src6 WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey + {4 * _INS_SHIFT} AS c_custkey,
             ((c_custkey + {4 * _INS_SHIFT}) % 100) - 50 AS d
      FROM customer WHERE c_custkey % 47 = 0
    ),
    state7 AS (
      SELECT * FROM src6
      WHERE c_custkey % 2 <> 0
         OR ((c_custkey % 100) - 50 <= 0 AND (c_custkey % 100) - 50 >= -40)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey,
             c_acctbal + ((c_custkey % 100) - 50) AS c_acctbal,
             'COND' AS c_mktsegment
      FROM src6
      WHERE c_custkey % 2 = 0 AND (c_custkey % 100) - 50 > 0
      UNION ALL
      SELECT c_custkey, 'CLAUSENEW' AS c_name,
             CAST(NULL AS BIGINT) AS c_nationkey,
             CAST(d AS DOUBLE) AS c_acctbal,
             CAST(NULL AS VARCHAR) AS c_mktsegment
      FROM src7
      WHERE c_custkey > {4 * _INS_SHIFT} AND d > 0
    ),
    -- v8 BY-SOURCE CLAUSE FAMILY: a KEY-ONLY source of every ODD state7
    -- key; matched (odd) rows keep; unmatched (even) targets take the
    -- first-TRUE by-source clause — negative balance -> segment
    -- 'NEGBAL' (update), else key %10=0 -> delete, else kept.
    state8 AS (
      SELECT * FROM state7 WHERE c_custkey % 2 = 1
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             'NEGBAL' AS c_mktsegment
      FROM state7 WHERE c_custkey % 2 = 0 AND c_acctbal < 0
      UNION ALL
      SELECT * FROM state7
      WHERE c_custkey % 2 = 0 AND c_acctbal >= 0 AND c_custkey % 10 <> 0
    ),
    -- v9 COMPOSITE-KEY merge (round 11): the final state re-keyed on
    -- (c_nationkey, c_custkey) in a second table; tuple-keyed upsert —
    -- every 9th key with a NON-NULL nationkey re-balances (-5.0,
    -- 'COMP'; NULL-nationkey rows can never match a tuple source and
    -- are left out of it), plus fresh 5x-shifted clones of every 53rd
    -- customer
    state9 AS (
      SELECT * FROM state8
      WHERE NOT (c_custkey % 9 = 0 AND c_nationkey IS NOT NULL)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey,
             c_acctbal - 5.0 AS c_acctbal, 'COMP' AS c_mktsegment
      FROM state8 WHERE c_custkey % 9 = 0 AND c_nationkey IS NOT NULL
      UNION ALL
      SELECT c_custkey + {5 * _INS_SHIFT} AS c_custkey, c_name, c_nationkey,
             c_acctbal, 'COMPNEW' AS c_mktsegment
      FROM customer WHERE c_custkey % 53 = 0
    ),
    cdf AS (
      -- v0: CREATE commits every customer row as an insert
      SELECT 'insert' AS change_type, CAST(0 AS BIGINT) AS commit_version,
             c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer
      UNION ALL
      -- v1 MERGE: every 7th key updated (pre + post images) ...
      SELECT 'update_preimage', 1,
             c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % {_UPD_MOD} = 0
      UNION ALL
      SELECT 'update_postimage', 1,
             c_custkey, c_name, c_nationkey, -c_acctbal, 'MERGED'
      FROM customer WHERE c_custkey % {_UPD_MOD} = 0
      UNION ALL
      -- ... plus the shifted clones inserted by the same commit
      SELECT 'insert', 1, c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM m WHERE c_mktsegment = 'INSERTED'
      UNION ALL
      -- v2 (OPTIMIZE Z-ORDER) is row-preserving: NO feed rows
      -- v3 UPDATE WHERE: every clone's balance bumped by 1000
      SELECT 'update_preimage', 3,
             c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM m WHERE c_mktsegment = 'INSERTED'
      UNION ALL
      SELECT 'update_postimage', 3,
             c_custkey, c_name, c_nationkey, c_acctbal + 1000.0, c_mktsegment
      FROM m WHERE c_mktsegment = 'INSERTED'
      UNION ALL
      -- v4 DELETE WHERE: every 13th key leaves with its v3 (OLD) image
      SELECT 'delete', 4, c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM state3 WHERE c_custkey % 13 = 0
      UNION ALL
      -- v5 APPLY CHANGES: matched upserts (pre + post), inserts, deletes
      SELECT 'update_preimage', 5, c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM snap4 WHERE c_custkey % 11 = 0 AND c_custkey % 17 <> 0
      UNION ALL
      SELECT 'update_postimage', 5, * FROM upd5
      UNION ALL
      SELECT 'insert', 5, * FROM new5
      UNION ALL
      SELECT 'delete', 5, * FROM del5
      UNION ALL
      -- v6 FULL SYNC: deletes for vanished keys, update pre/post ONLY for
      -- keys whose image actually changed (matched-identical rows are
      -- invisible to the content diff), inserts for the fresh clones
      SELECT 'delete', 6, c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM state5 WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT 'update_preimage', 6, c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM state5 WHERE c_custkey % 3 <> 0 AND c_custkey % 5 = 0
      UNION ALL
      SELECT 'update_postimage', 6, c_custkey, c_name, c_nationkey,
             c_acctbal + 2.0, 'SYNC'
      FROM state5 WHERE c_custkey % 3 <> 0 AND c_custkey % 5 = 0
      UNION ALL
      SELECT 'insert', 6, c_custkey + {3 * _INS_SHIFT}, c_name, c_nationkey,
             c_acctbal, 'SYNCNEW'
      FROM customer WHERE c_custkey % 43 = 0
      UNION ALL
      -- v7 conditional clauses: pre/post for updated-by-clause-1 rows,
      -- deletes for clause-2 rows, values-dict inserts; matched rows no
      -- clause accepted are KEPT and emit nothing
      SELECT 'update_preimage', 7, c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM src6 WHERE c_custkey % 2 = 0 AND (c_custkey % 100) - 50 > 0
      UNION ALL
      SELECT 'update_postimage', 7, c_custkey, c_name, c_nationkey,
             c_acctbal + ((c_custkey % 100) - 50), 'COND'
      FROM src6 WHERE c_custkey % 2 = 0 AND (c_custkey % 100) - 50 > 0
      UNION ALL
      SELECT 'delete', 7, c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM src6 WHERE c_custkey % 2 = 0 AND (c_custkey % 100) - 50 < -40
      UNION ALL
      SELECT 'insert', 7, c_custkey, 'CLAUSENEW', CAST(NULL AS BIGINT),
             CAST(d AS DOUBLE), CAST(NULL AS VARCHAR)
      FROM src7 WHERE c_custkey > {4 * _INS_SHIFT} AND d > 0
      UNION ALL
      -- v8 by-source clauses: update pre/post for flagged rows (the
      -- segment change is a genuine content change — no prior NEGBAL),
      -- deletes for the fallthrough-delete rows, nothing for keeps
      SELECT 'update_preimage', 8, c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM state7 WHERE c_custkey % 2 = 0 AND c_acctbal < 0
      UNION ALL
      SELECT 'update_postimage', 8, c_custkey, c_name, c_nationkey,
             c_acctbal, 'NEGBAL'
      FROM state7 WHERE c_custkey % 2 = 0 AND c_acctbal < 0
      UNION ALL
      SELECT 'delete', 8, c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM state7
      WHERE c_custkey % 2 = 0 AND c_acctbal >= 0 AND c_custkey % 10 = 0
      UNION ALL
      -- v9 composite-key merge: tuple-matched updates (pre + post) and
      -- the fresh clone inserts
      SELECT 'update_preimage', 9, c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM state8 WHERE c_custkey % 9 = 0 AND c_nationkey IS NOT NULL
      UNION ALL
      SELECT 'update_postimage', 9, c_custkey, c_name, c_nationkey,
             c_acctbal - 5.0, 'COMP'
      FROM state8 WHERE c_custkey % 9 = 0 AND c_nationkey IS NOT NULL
      UNION ALL
      SELECT 'insert', 9, c_custkey + {5 * _INS_SHIFT}, c_name,
             c_nationkey, c_acctbal, 'COMPNEW'
      FROM customer WHERE c_custkey % 53 = 0
    ),
    {SQL_DML_CTES}
    SELECT 'snapshot' AS variant,
           CAST(NULL AS VARCHAR) AS change_type,
           CAST(NULL AS BIGINT) AS commit_version,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM state9
    UNION ALL
    SELECT 'cdf', change_type, commit_version,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM cdf
    UNION ALL
    -- round 13: the SQL DML face's post-lineage snapshot (see
    -- sql_dml_entry.py for the statement recipe this replays)
    SELECT 'sqldml' AS variant,
           CAST(NULL AS VARCHAR) AS change_type,
           CAST(NULL AS BIGINT) AS commit_version,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM ({SQL_DML_FINAL}) sd_final
    UNION ALL
    -- round 14: the same lineage inside BEGIN..COMMIT (ScriptTransaction
    -- fork/diff/publish — ONE atomic commit) must land on the IDENTICAL
    -- relational rendering
    SELECT 'sqltxn' AS variant,
           CAST(NULL AS VARCHAR) AS change_type,
           CAST(NULL AS BIGINT) AS commit_version,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM ({SQL_DML_FINAL}) sd_final_txn
    UNION ALL
    -- round 15: an incrementally-maintained MATERIALIZED VIEW over the
    -- same lineage (created at v4, refreshed by delta through v5 and
    -- v6 — including the bounded MIN/MAX extremum-loss recompute) must
    -- equal the from-scratch aggregate of state6 (= src6). One row per
    -- (group, aggregate), value in c_acctbal; sums rounded to cents on
    -- BOTH sides (inputs are 2-decimal, so the exact sum is too — the
    -- incremental double accumulation re-rounds to the same cents)
    SELECT 'mv' AS variant, lbl AS change_type,
           CAST(NULL AS BIGINT) AS commit_version,
           CAST(NULL AS BIGINT) AS c_custkey,
           CAST(NULL AS VARCHAR) AS c_name,
           CAST(NULL AS BIGINT) AS c_nationkey,
           v AS c_acctbal, c_mktsegment
    FROM (
      SELECT c_mktsegment, 'mv_cnt' AS lbl, CAST(count(*) AS DOUBLE) AS v
      FROM src6 GROUP BY c_mktsegment
      UNION ALL
      SELECT c_mktsegment, 'mv_sum', round(sum(c_acctbal), 2)
      FROM src6 GROUP BY c_mktsegment
      UNION ALL
      SELECT c_mktsegment, 'mv_min', min(c_acctbal)
      FROM src6 GROUP BY c_mktsegment
      UNION ALL
      SELECT c_mktsegment, 'mv_max', max(c_acctbal)
      FROM src6 GROUP BY c_mktsegment
    ) mv_u
    """,
    tags=("transaction", "merge", "cdf", "sql_dml"),
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
    CTE.

    Round 9: the entry also returns the CHANGE DATA FEED of the same
    lineage ('cdf' variant rows) — creation inserts at version 0, then
    per-commit ``diff(v-1, v, images='both')`` rows (Delta CDF's exact
    event vocabulary: insert / delete / update_preimage /
    update_postimage) tagged with their commit version, row-preserving
    commits (the Z-ORDER) contributing nothing. The oracle reconstructs
    the full feed in SQL from the deterministic mutation recipe, so CDF
    semantics — previously pytest-only — are value-hash checked
    cross-engine alongside the snapshot they must reconcile with.

    Round 9 also appends v5 = APPLY CHANGES INTO (the multi-clause CDC
    merge): matched upserts, fresh inserts, and deletes — including
    no-op deletes of keys already gone — land in ONE commit, and both
    the post-apply snapshot AND the v5 feed events are under the same
    oracle.

    Round 9 (cont.) appends v6 = FULL-SYNC MERGE
    (``not_matched_by_source='delete'`` — Delta's
    whenNotMatchedBySourceDelete): the table mirrors a complete extract
    in one commit (matched update, fresh insert, vanished delete), and
    the oracle checks BOTH the post-sync snapshot (= the extract) and
    the v6 feed events — deletes for vanished keys, update pre/post
    images ONLY for rows whose content actually changed (matched rows
    re-delivered with identical images are invisible to the diff).

    Round 10 appends v7 = CONDITIONAL MULTI-CLAUSE MERGE (Delta's
    ``whenMatchedUpdate(condition, set)`` / ``whenMatchedDelete(
    condition)`` / ``whenNotMatchedInsert(condition, values)``): the
    source carries ONLY (key, d) — the partial-column shape — and the
    ordered clauses exercise first-TRUE-wins precedence, subset updates
    that must leave unset columns bit-identical, a conditional delete,
    a conditional values-dict insert (unspecified columns NULL), and the
    no-clause-matched KEEP. Both the post-clause snapshot and the v7
    feed events are value-hash checked under the oracle.

    Round 10 (cont.) appends v8 = the BY-SOURCE CLAUSE FAMILY
    (``whenNotMatchedBySourceUpdate(condition, set)`` + ``...Delete``):
    a KEY-ONLY source of the odd v7 keys — matched rows keep, unmatched
    (even) targets take the first-TRUE by-source clause (negative
    balance → partial segment update; else key%10=0 → delete; else
    keep) — snapshot and v8 feed events under the same oracle.

    Round 11 appends v9 = the COMPOSITE-KEY merge: the final state is
    re-keyed on the TUPLE (c_nationkey, c_custkey) in a second
    versioned table and upserted on it with point skipping (per-column
    probe conjunction) — the returned snapshot is t2's, and the v9 feed
    events (tuple-joined diff) ride the same oracle. NULL-nationkey
    rows (the v7 values-dict inserts) pin the SQL-equality contract: a
    NULL key component never matches, so they are excluded from the
    update source and survive untouched."""
    from database_anonymiser_spark.sources.versioned import (
        ROW_PRESERVING_OPS,
        VersionedTable,
    )

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

    # round 15: a MATERIALIZED VIEW over the lineage table, created at
    # the v4 snapshot and advanced by DELTA REFRESH through v5 and v6 —
    # count/sum merge by addition; min/max merge closed-form on inserts
    # and take the bounded extremum-loss recompute when a delete removes
    # a group's extremum (sources/materialized.py, the r14 verdict's
    # top_next). Pinned refreshes (to_version=) because v7 introduces
    # NULL segments — the refusal surface — and because the oracle
    # aggregates state6. Emitted as 'mv' variant rows at the end.
    from database_anonymiser_spark.sources.materialized import (
        create_materialized,
        refresh_materialized,
    )

    mvt = create_materialized(
        spark, f"{root}/mv", t.root, ["c_mktsegment"],
        {
            "cnt": ("count", None),
            "balsum": ("sum", "c_acctbal"),
            "balmin": ("min", "c_acctbal"),
            "balmax": ("max", "c_acctbal"),
        },
    )

    # v5 (round 9): APPLY CHANGES INTO — the multi-clause CDC merge in
    # ONE commit. Upserts derive from the PINNED v4 snapshot (pure
    # function of the lineage), inserts are fresh 2×-shifted clones,
    # deletes target original keys %17=0 (those already gone at v4
    # exercise the unmatched-delete no-op clause).
    snap4 = t.snapshot(t.latest_version())
    k = F.col("c_custkey")
    ups = (
        snap4.where((k % 11 == 0) & (k % 17 != 0))
        .withColumn("c_acctbal", F.col("c_acctbal") + 7.0)
        .withColumn("c_mktsegment", F.lit("CDC"))
    )
    new5 = (
        cust.where(k % 41 == 0)
        .withColumn("c_custkey", k + 2 * _INS_SHIFT)
        .withColumn("c_mktsegment", F.lit("CDCNEW"))
    )
    dels = cust.where(k % 17 == 0)
    t.apply_changes(
        ups.unionByName(new5).withColumn("_op", F.lit("upsert"))
        .unionByName(dels.withColumn("_op", F.lit("delete")))
    )

    # v6 (round 9): FULL-SYNC merge — not_matched_by_source='delete'
    # mirrors the table onto a complete extract derived from the pinned
    # v5 snapshot: every 3rd key vanishes, every 5th surviving key
    # re-balances (+2.0, 'SYNC'), fresh 3x-shifted clones of every 43rd
    # customer insert. One atomic commit; the content diff must emit
    # update events ONLY for rows whose image actually changed.
    snap5 = t.snapshot(t.latest_version())
    kept = snap5.where(k % 3 != 0)
    sync = kept.withColumn(
        "c_acctbal",
        F.when(k % 5 == 0, F.col("c_acctbal") + 2.0).otherwise(F.col("c_acctbal")),
    ).withColumn(
        "c_mktsegment",
        F.when(k % 5 == 0, F.lit("SYNC")).otherwise(F.col("c_mktsegment")),
    )
    new6 = (
        cust.where(k % 43 == 0)
        .withColumn("c_custkey", k + 3 * _INS_SHIFT)
        .withColumn("c_mktsegment", F.lit("SYNCNEW"))
    )
    t.merge(sync.unionByName(new6), not_matched_by_source="delete")

    # round 15: two pinned delta refreshes — (4,5] then (5,6] — so the
    # view walks the lineage the way a scheduler would, one interval at
    # a time, and ends equal to the state6 aggregate the oracle computes
    refresh_materialized(spark, f"{root}/mv", to_version=5)
    refresh_materialized(spark, f"{root}/mv", to_version=6)

    # v7 (round 10): conditional multi-clause merge. The source is the
    # PARTIAL shape (key + a delta column only): every even v6 key plus
    # fresh 4x-shifted clones of every 47th customer, d = key%100 - 50.
    snap6 = t.snapshot(t.latest_version())
    src7 = (
        snap6.where(k % 2 == 0)
        .select("c_custkey")
        .unionByName(
            cust.where(k % 47 == 0).select(
                (k + 4 * _INS_SHIFT).alias("c_custkey")
            )
        )
        .withColumn("d", (F.col("c_custkey") % 100 - 50).cast("long"))
    )
    t.merge(
        src7,
        matched=[
            (
                "update",
                "s.d > 0",
                {"c_acctbal": "t.c_acctbal + s.d", "c_mktsegment": "'COND'"},
            ),
            ("delete", "s.d < -40"),
        ],
        not_matched=[
            (
                "insert",
                "s.d > 0",
                {
                    "c_custkey": "s.c_custkey",
                    "c_name": "'CLAUSENEW'",
                    "c_acctbal": "s.d",
                },
            ),
        ],
    )

    # v8 (round 10 cont.): by-source clause family with a KEY-ONLY
    # source (every odd v7 key) — unmatched even targets: flag negative
    # balances, else delete key%10=0, else keep.
    snap7 = t.snapshot(t.latest_version())
    src8 = snap7.where(k % 2 == 1).select("c_custkey")
    t.merge(
        src8,
        not_matched_by_source=[
            ("update", "t.c_acctbal < 0", {"c_mktsegment": "'NEGBAL'"}),
            ("delete", "t.c_custkey % 10 = 0"),
        ],
    )

    # v9 (round 11): COMPOSITE-KEY merge — the final state re-keyed on
    # (c_nationkey, c_custkey) in a second table; the upsert matches on
    # the TUPLE, point skipping collects tuple probes per column. Rows
    # with a NULL nationkey (the v7 values-dict inserts) can never match
    # a tuple source, so the update source excludes them.
    snap8 = t.snapshot(t.latest_version())
    t2 = VersionedTable.create(
        spark, f"{root}/t2", snap8, key_col=["c_nationkey", "c_custkey"]
    )
    upd9 = (
        snap8.where((k % 9 == 0) & F.col("c_nationkey").isNotNull())
        .withColumn("c_acctbal", F.col("c_acctbal") - 5.0)
        .withColumn("c_mktsegment", F.lit("COMP"))
    )
    new9 = (
        cust.where(k % 53 == 0)
        .withColumn("c_custkey", k + 5 * _INS_SHIFT)
        .withColumn("c_mktsegment", F.lit("COMPNEW"))
    )
    t2.merge(upd9.unionByName(new9), skip_by="points")
    # round 12: INCREMENTAL CLUSTERING rides the same oracle — declare
    # the clustering key and recluster. Row-preserving by contract, so
    # the returned snapshot AND the v9 feed must hash-check unchanged:
    # the layout rewrite (z-ordered generations, clustered watermark) is
    # itself value-hash checked cross-engine, exactly like the round-5
    # Z-ORDER precedent. The NULL-nationkey rows additionally pin the
    # diff's content-identity rule: carried unchanged through the
    # rewrite, they must stay EVENTLESS however the files shuffle.
    t2.set_clustering(("c_nationkey", "c_acctbal"))
    t2.optimize_cluster(file_count=4)

    cols = cust.columns
    feed = t.snapshot(0).select(
        F.lit("insert").alias("change_type"), *cols
    ).withColumn("commit_version", F.lit(0).cast("long"))
    for v in range(1, t.latest_version() + 1):
        if t.commit_op(v) in ROW_PRESERVING_OPS:
            continue  # Z-ORDER: dataChange=false, no feed rows
        feed = feed.unionByName(
            t.diff(v - 1, v, images="both")
            .withColumnRenamed("_change_type", "change_type")
            .withColumn("commit_version", F.lit(v).cast("long"))
        )
    # the v9 composite merge's feed rides the same vocabulary, tagged as
    # commit 9 of the lineage (t2's create events would duplicate state8)
    feed = feed.unionByName(
        t2.diff(0, t2.latest_version(), images="both")
        .withColumnRenamed("_change_type", "change_type")
        .withColumn("commit_version", F.lit(9).cast("long"))
    )
    snap = t2.snapshot().select(
        F.lit("snapshot").alias("variant"),
        F.lit(None).cast("string").alias("change_type"),
        F.lit(None).cast("long").alias("commit_version"),
        *cols,
    )
    # round 13: the SQL DML face (UPDATE/DELETE/MERGE INTO statement
    # strings through sql_dml.execute_dml — --sql mode's router) rides
    # as 'sqldml' variant rows of this entry (the suite is pinned at 50
    # names), putting the statement parser itself under the value hash.
    sqldml = sql_dml_state(spark, sf_dir).select(
        F.lit("sqldml").alias("variant"),
        F.lit(None).cast("string").alias("change_type"),
        F.lit(None).cast("long").alias("commit_version"),
        *cols,
    )
    # round 14: the SAME statement lineage wrapped in BEGIN..COMMIT and
    # run through the ScriptTransaction publisher (ONE txn_publish
    # commit, nothing visible in between) rides as 'sqltxn' rows — the
    # transaction fork/diff/publish machinery itself under the value
    # hash, against the identical relational rendering
    sqltxn = sql_txn_state(spark, sf_dir).select(
        F.lit("sqltxn").alias("variant"),
        F.lit(None).cast("string").alias("change_type"),
        F.lit(None).cast("long").alias("commit_version"),
        *cols,
    )
    # round 15: the materialized view's content as 'mv' variant rows —
    # one row per (group, aggregate), value in c_acctbal. The sum is
    # re-rounded to cents on both sides (2-decimal inputs: the exact sum
    # is a 2-decimal number, recoverable from either engine's double)
    mvsnap = mvt.snapshot().select(
        "c_mktsegment", "cnt", "balsum", "balmin", "balmax"
    )
    mv_rows = None
    for lbl, vcol in (
        ("mv_cnt", F.col("cnt").cast("double")),
        ("mv_sum", F.round(F.col("balsum"), 2)),
        ("mv_min", F.col("balmin")),
        ("mv_max", F.col("balmax")),
    ):
        part = mvsnap.select(
            F.lit("mv").alias("variant"),
            F.lit(lbl).alias("change_type"),
            F.lit(None).cast("long").alias("commit_version"),
            F.lit(None).cast("long").alias("c_custkey"),
            F.lit(None).cast("string").alias("c_name"),
            F.lit(None).cast("long").alias("c_nationkey"),
            vcol.alias("c_acctbal"),
            F.col("c_mktsegment"),
        )
        mv_rows = part if mv_rows is None else mv_rows.unionByName(part)
    return (
        snap.unionByName(
            feed.select(
                F.lit("cdf").alias("variant"), "change_type",
                "commit_version", *cols,
            )
        )
        .unionByName(sqldml)
        .unionByName(sqltxn)
        .unionByName(mv_rows)
    )
