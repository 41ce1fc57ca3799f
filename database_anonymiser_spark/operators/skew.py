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
