"""Operator-scoped caching — .cache() without the cross-call leak.

Spark's CacheManager keys cached data by logical plan and holds the blocks
until an explicit unpersist or session stop. An operator that caches an
intermediate frame on every call (LSH signatures, shingle arrays) therefore
accumulates one dead cache entry per call — flagged in the round-4 advice.

:func:`scoped_cache` bounds that to ONE live cached frame per operator
slot: each call releases the previous call's frame before caching its own.
The frame a returned plan reads stays cached until the NEXT call of the
same operator; a result DataFrame held across a later call simply
recomputes uncached (correct, just unmemoized). Default DataFrame storage
is MEMORY_AND_DISK, so over-memory frames spill instead of OOMing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: one live cached frame per operator slot
_SLOTS: dict[str, DataFrame] = {}


def scoped_cache(slot: str, df: DataFrame) -> DataFrame:
    old = _SLOTS.pop(slot, None)
    if old is not None:
        try:
            old.unpersist(False)
        except Exception:
            pass  # the old frame's session may already be stopped
    _SLOTS[slot] = df.cache()
    return df
