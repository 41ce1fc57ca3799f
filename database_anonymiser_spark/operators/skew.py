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

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _validate_salt(salt: int) -> None:
    """salt must be ≥ 2: salt=1 means "don't salt" (call plain join), and the
    targeted path builds its hot-side replication from range(1, salt) — an
    empty (NullType!) array at salt=1 that would silently drop hot rows."""
    if salt < 2:
        raise ValueError("salt must be >= 2 (a 1-way salt is a plain join)")


def _salt_expr(df: DataFrame, on: str, salt: int, salt_cols: Sequence[str] | None):
    """Deterministic per-row salt in [0, salt): hash of the join key plus
    ``salt_cols`` (a couple of high-entropy columns — defaults to every
    column, which is correct but defeats column pruning on wide tables:
    pass 1-2 columns the query already reads). Deterministic by design —
    retried/speculative tasks must salt a row identically, so no rand().

    Limitation (documented contract): rows IDENTICAL in all hashed columns
    get identical salts, so a hot key made of exact-duplicate rows does not
    spread. Include a row-unique column in ``salt_cols`` if that's your
    skew shape.
    """
    cols = [on, *(c for c in (salt_cols if salt_cols is not None else df.columns) if c != on)]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"salt_cols not in big side: {missing}")
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(salt))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on one key with ``salt``-way key spreading.

    The big side gets a DETERMINISTIC salt (see :func:`_salt_expr` for the
    column choice and the exact-duplicate-row caveat), the small side is
    exploded ×``salt``. Result equals ``big.join(small, on, how)`` exactly;
    cost trades ``salt``× replication of the small side for even
    partitioning of the hot keys.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    _validate_salt(salt)
    big_s = big.withColumn("_salt", _salt_expr(big, on, salt, salt_cols))
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
    salt_cols: Sequence[str] | None = None,
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
    _validate_salt(salt)
    if sample_fraction is not None and not (0.0 < sample_fraction <= 1.0):
        # the count scale-up divides by it; 0 would be an ANSI-mode
        # DIVIDE_BY_ZERO deep in the job instead of an input error here
        raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
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
    # broadcast hot set; deterministic salt only for hot keys (see
    # _salt_expr for column choice / duplicate-row caveat)
    big_s = (
        big.join(F.broadcast(hot), big[on] == F.col("_hot_key"), "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot_key").isNotNull(),
                _salt_expr(big, on, salt, salt_cols),
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
