"""Skew mitigation for joins (SURVEY.md §2.5 scale note).

AQE's skew-join splitting (on in session.py) handles most skew at runtime by
splitting oversized partitions. Salting is the explicit fallback for the
pathological case AQE can't fix: ONE join key so hot that a single key's rows
exceed an executor (think null-key floods or a power-law user id). The trick:
spread the big side's hot keys across ``salt`` sub-keys, replicate the small
side ``salt`` times, join on (key, salt) — each sub-partition carries ~1/salt of
the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on one key with ``salt``-way key spreading.

    The big side gets a DETERMINISTIC salt derived from its whole row (hash of
    all columns, not rand() — retries/speculative tasks must salt a row the
    same way), the small side is exploded ×``salt``. Result equals
    ``big.join(small, on, how)`` exactly; cost trades ``salt``× replication
    of the small side for even partitioning of the hot keys.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def targeted_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    hot_threshold: int = 100_000,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Salt ONLY the hot keys — the production form of :func:`salted_join`.

    Blanket salting replicates the whole small side ``salt``× even though
    skew lives in a handful of keys. Here a frequency pass over the big
    side finds keys above ``hot_threshold`` rows (optionally from a
    ``sample_fraction`` sample, scaled up — the count only needs to be
    right to within the threshold's order of magnitude); that tiny hot-key
    set is broadcast, cold keys join with salt 0 (no replication), and only
    hot keys spread ``salt`` ways / replicate the small side's matching
    rows. Result equals ``big.join(small, on, how)`` exactly.

    Cost: one extra aggregation over the big side's key column (cheap —
    partial-agg to |distinct keys|) + small-side replication proportional
    to |hot keys| instead of |small|.
    """
    if how not in ("inner", "left"):
        raise ValueError("targeted_salted_join supports inner/left")
    keys = big.select(on)
    if sample_fraction is not None:
        counts = (
            keys.sample(fraction=sample_fraction, seed=7)
            .groupBy(on)
            .agg((F.count(F.lit(1)) / F.lit(sample_fraction)).alias("_cnt"))
        )
    else:
        counts = keys.groupBy(on).agg(F.count(F.lit(1)).alias("_cnt"))
    hot = counts.where(F.col("_cnt") >= hot_threshold).select(
        F.col(on).alias("_hot_key")
    )
    # broadcast hot set; row-hash salt only for hot keys (deterministic —
    # retries/speculative tasks salt identically)
    big_s = (
        big.join(F.broadcast(hot), big[on] == F.col("_hot_key"), "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot_key").isNotNull(),
                F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt)),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot_key")
    )
    small_hot = (
        small.join(F.broadcast(hot), small[on] == F.col("_hot_key"), "left_semi")
        .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(1, salt)])))
    )
    small_s = small.withColumn("_salt", F.lit(0)).unionByName(small_hot)
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")
