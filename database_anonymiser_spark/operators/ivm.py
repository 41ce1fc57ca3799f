"""Incremental view maintenance over the versioned change feed.

A materialized aggregate (the warehouse's rollup table) must track its
base table without recomputing from scratch on every commit. With the
versioned layer's row-level change feed (``VersionedTable.diff`` — Delta
CDF shape: insert / update / delete with row images), any
SUM/COUNT-decomposable aggregate maintains incrementally:

    view += Σ (+new image)  for inserts and update-new
    view -= Σ (-old image)  for deletes and update-old

i.e. the classic delta-propagation rule of incremental view maintenance
(Gupta & Mumick, "Maintenance of Materialized Views: Problems,
Techniques, and Applications", IEEE DE Bulletin 1995 — public
knowledge). ``diff`` emits only the NEW image for updates, so the
maintainer re-derives the old image from the PREVIOUS version's live
files restricted to the updated keys — still O(changed files), never a
base-table scan.

The maintained view is itself a ``VersionedTable`` keyed by the group
column, advanced by MERGE with a recorded ``cursor`` (the base version
the view reflects) in each commit's metadata — so view maintenance is
exactly-once under crash/retry: a replayed maintenance run sees the
cursor already advanced and no-ops. Groups whose count reaches zero are
deleted from the view (SQL GROUP BY semantics: empty groups vanish).

100 TB shape: each refresh reads only the interval's changed files (the
change-feed contract) and shuffles one groupBy of just the delta rows;
the view rewrite is O(view), which is aggregate-sized (one row per
group) — the refresh never scans the base table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_anonymiser_spark.sources.versioned import VersionedTable


class IncrementalAggView:
    """A maintained ``SELECT group_col, count(*), sum(sum_col)`` view.

    ``create`` materializes the initial state from a base-table snapshot;
    ``refresh`` advances it by the change feed. The sum runs in exact
    DECIMAL(18,2) (the engine's order-independence convention) and is
    served as double.
    """

    def __init__(self, spark: SparkSession, root: str | os.PathLike):
        self.spark = spark
        self.table = VersionedTable(spark, root)

    # ---------------------------------------------------------- build

    @staticmethod
    def _aggregate(rows: DataFrame, group_col: str, sum_col: str) -> DataFrame:
        return rows.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(sum_col).cast("decimal(18,2)")).alias("_dsum"),
        )

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str | os.PathLike,
        base: VersionedTable,
        group_col: str,
        sum_col: str,
    ) -> "IncrementalAggView":
        """Materialize the view from ``base``'s LATEST snapshot and record
        the reflected base version as the cursor."""
        from database_anonymiser_spark.sources.versioned import (
            _commit,
            _write_data_files,
        )

        v = cls(spark, root)
        if v.table.versions():
            raise FileExistsError(f"view already exists at {root}")
        base_version = base.latest_version()
        agg = cls._aggregate(base.snapshot(base_version), group_col, sum_col)
        adds = _write_data_files(
            agg.withColumn("_dsum", F.col("_dsum").cast("decimal(18,2)")),
            v.table.root,
            group_col,
        )
        _commit(
            v.table.root,
            0,
            adds,
            [],
            group_col,
            op="ivm_create",
            meta={
                "cursor": base_version,
                "group_col": group_col,
                "sum_col": sum_col,
            },
        )
        return v

    # -------------------------------------------------------- maintain

    def _meta(self) -> dict:
        for rec in reversed(self.table.history()):
            if rec.get("meta"):
                return rec["meta"]
        raise ValueError("view has no recorded metadata")

    def cursor(self) -> int:
        return int(self._meta()["cursor"])

    def refresh(self, base: VersionedTable) -> int:
        """Advance the view to ``base``'s latest version by delta
        propagation; no-op (returns the current cursor's view version)
        when the base has not moved. Exactly-once: the new cursor rides
        in the view's commit metadata, so a crashed-and-retried refresh
        of the same interval replays the identical deterministic delta
        into a MERGE keyed by group — same final state."""
        from database_anonymiser_spark.sources.versioned import (
            _commit,
            _write_data_files,
        )

        meta = self._meta()
        group_col, sum_col = meta["group_col"], meta["sum_col"]
        since = int(meta["cursor"])
        latest = base.latest_version()
        if latest <= since:
            return self.table.latest_version()

        changes = base.diff(since, latest)
        # +new images: inserts and update-new rows (diff carries the new
        # image for updates); -old images: deletes, plus the PREVIOUS
        # version's rows for the updated keys (O(changed files) read)
        plus = changes.where(F.col("_change_type").isin("insert", "update"))
        minus_del = changes.where(F.col("_change_type") == "delete")
        base_key = base.key_col()
        upd_keys = plus.where(F.col("_change_type") == "update").select(
            F.col(base_key).alias("_uk")
        )
        old_updated = base.snapshot(since).join(
            upd_keys, F.col(base_key) == F.col("_uk"), "left_semi"
        )
        delta = (
            self._aggregate(plus, group_col, sum_col)
            .unionByName(
                self._aggregate(
                    minus_del.select(plus.columns), group_col, sum_col
                ).select(
                    group_col,
                    (-F.col("n_rows")).alias("n_rows"),
                    (-F.col("_dsum")).alias("_dsum"),
                )
            )
            .unionByName(
                self._aggregate(old_updated, group_col, sum_col).select(
                    group_col,
                    (-F.col("n_rows")).alias("n_rows"),
                    (-F.col("_dsum")).alias("_dsum"),
                )
            )
            .groupBy(group_col)
            .agg(
                F.sum("n_rows").alias("d_rows"),
                F.sum("_dsum").alias("d_sum"),
            )
        )
        cur = self.table.snapshot().select(
            F.col(group_col), F.col("n_rows"), F.col("_dsum")
        )
        merged = (
            cur.join(delta, group_col, "full_outer")
            .select(
                F.col(group_col),
                (F.coalesce("n_rows", F.lit(0)) + F.coalesce("d_rows", F.lit(0))).alias(
                    "n_rows"
                ),
                (
                    F.coalesce(F.col("_dsum"), F.lit(0).cast("decimal(18,2)"))
                    + F.coalesce(F.col("d_sum"), F.lit(0).cast("decimal(18,2)"))
                )
                .cast("decimal(18,2)")
                .alias("_dsum"),
            )
            .where(F.col("n_rows") > 0)  # empty groups vanish (GROUP BY law)
        )
        v = self.table.latest_version()
        removes = [e["path"] for e in self.table._live_entries(v)]
        adds = _write_data_files(merged, self.table.root, group_col)
        _commit(
            self.table.root,
            v + 1,
            adds,
            removes,
            group_col,
            op="ivm_refresh",
            meta={"cursor": latest, "group_col": group_col, "sum_col": sum_col},
        )
        return v + 1

    # ------------------------------------------------------------ read

    def snapshot(self) -> DataFrame:
        """The view as (group, n_rows, sum_value double)."""
        meta = self._meta()
        return self.table.snapshot().select(
            F.col(meta["group_col"]),
            F.col("n_rows"),
            F.col("_dsum").cast("double").alias("sum_value"),
        )
