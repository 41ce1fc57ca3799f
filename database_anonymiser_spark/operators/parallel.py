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
Every call site keeps its pre-consolidation shape (keyed/keyless,
barrier/no-barrier), so plans are bit-identical to the r15 originals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scan_floor(
    df: DataFrame,
    key_col: str | None = None,
    barrier_slot: str | None = None,
) -> DataFrame:
    """Widen ``df`` to ``defaultParallelism`` partitions when the scan
    gives it fewer — no-op otherwise (i.e. always at scale). See module
    docstring for when ``barrier_slot`` is required."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
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
