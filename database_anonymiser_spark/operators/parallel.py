"""Scan-parallelism floor — ONE policy for widening few-partition inputs.

The problem (r15, guide §2.5/§6): the per-row compute bulk of many
operators (shingle/minhash md5 chains, gate regex trees, bloom-probe
hashes) runs in the stage that PRODUCES its input. A corpus read from a
handful of parquet files — or ONE single-row-group file, as the bench
fixtures are — evaluates that chain on that many tasks regardless of
cluster size. At 100 TB the scan has natural parallelism and every floor
below is a no-op; the floor exists so small inputs (samples, fixtures,
tails of incremental loads) don't serialize onto one core.

Two shapes, chosen by what Catalyst would otherwise push BELOW the
repartition:

- **projection-only consumers** (``barrier_slot=None``): a plain
  repartition suffices — projections are never pushed below an exchange,
  so the heavy chain runs post-shuffle at cluster width.
- **filter consumers** (``barrier_slot="..."``): ``PushDownPredicates``
  crosses ``RepartitionByExpression``, so a FILTER over the derived
  columns (curate's gates, the bloom membership probe) would sink
  through the repartition back into the scan. A scoped cache is the
  pushdown barrier — filters stop at the InMemoryRelation, whose
  partitioning is already cluster-wide. The cache is MEMORY_AND_DISK
  (spills, never OOMs) and scoped to the slot
  (:func:`~database_anonymiser_spark.operators.cachectl.scoped_cache`).

``key_col=None`` repartitions round-robin (even spread, pays the
sort-before-repartition noted in SPARK-23207); a key column gives a
deterministic hash layout that downstream same-key operations can reuse.

The NEED-A-FLOOR probe (r16) is a logical-plan size estimate, not
``df.rdd.getNumPartitions()``: with AQE on, converting a mid-pipeline
frame to an RDD materializes every exchange below it (AdaptiveSparkPlan's
``execute`` builds the final plan by RUNNING its shuffle stages), so the
old probe executed real jobs — and even on a bare scan it paid full
physical planning per call. ``optimizedPlan().stats().sizeInBytes`` runs
the analyzer/optimizer only (memoized on the DataFrame's own
QueryExecution, so the following action reuses it), launches nothing,
and makes the policy bytes-aware: the floor fires only when the input
is too small to fill ``defaultParallelism`` scan partitions at
``spark.sql.files.maxPartitionBytes`` — i.e. exactly the sample/fixture/
incremental-tail regime it exists for. At 100 TB the estimate is over
the threshold and the call is a pure driver no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _needs_floor(df: DataFrame, parallelism: int) -> bool:
    """True iff ``df``'s optimizer-estimated size cannot fill
    ``parallelism`` scan partitions — the non-materializing twin of the
    old ``rdd.getNumPartitions() < defaultParallelism`` probe (equal on
    scan-rooted inputs, where partitions ≈ bytes/maxPartitionBytes;
    never runs jobs on mid-pipeline inputs like the old probe did)."""
    raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    # py4j maps scala BigInt to int for word-sized values, to a Java
    # object above that — both spellings must parse
    size = raw if isinstance(raw, int) else int(raw.toString())
    max_pb = int(
        df.sparkSession._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
    )
    return size < parallelism * max_pb


def scan_floor(
    df: DataFrame,
    key_col: str | None = None,
    barrier_slot: str | None = None,
) -> DataFrame:
    """Widen ``df`` to ``defaultParallelism`` partitions when its input
    is too small for the scan to reach that width — no-op otherwise
    (i.e. always at scale). See module docstring for when
    ``barrier_slot`` is required."""
    sc = df.sparkSession.sparkContext
    try:
        fire = _needs_floor(df, sc.defaultParallelism)
    except Exception:
        # internal-API drift: fall back to the materializing probe
        fire = df.rdd.getNumPartitions() < sc.defaultParallelism
    if not fire:
        return df
    wide = (
        df.repartition(sc.defaultParallelism, F.col(key_col))
        if key_col is not None
        else df.repartition(sc.defaultParallelism)
    )
    if barrier_slot is None:
        return wide
    from database_anonymiser_spark.operators.cachectl import scoped_cache

    return scoped_cache(barrier_slot, wide)
