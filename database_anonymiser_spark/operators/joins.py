"""Join operators Spark lacks as built-ins (SURVEY.md §2.5 extensions).

The reference has no joins at all (SURVEY.md §2.5 — its complete SQL surface
is catalog scans + UPDATEs, ``src/executor/query-builder.ts:58-61``); these
are capability extensions mandated by the north star.

As-of join: the classic time-series primitive (latest right row at-or-before
each left row, per key). Spark has no built-in; the scalable construction is
union + ordered window with ``last(..., ignorenulls)`` — ONE shuffle on the
key, state linear in rows, no range-join candidate blowup. A
``merge_asof``-style Pandas UDF would shuffle the same data AND pay Python
serialization; a range join would explode candidates quadratically per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` sharing the ``on`` keys (backward as-of join,
    inclusive). Right ties on the timestamp resolve to the greatest
    ``tie_break`` value (required for determinism if right timestamps can
    collide).

    Returns all left columns plus ``prefix + c`` for each payload column
    (null when no right row precedes the left row).
    """
    payload = [c for c in right_payload if c not in on]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in payload],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    # Order right rows before left rows at equal timestamps (<= semantics);
    # among right ties, ascending tie_break makes last() pick the greatest.
    order = ["_ts", "_side"]
    if tie_break and tie_break in payload:
        order.append(f"{prefix}{tie_break}")
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *on,
        "_ts",
        "_side",
        *[F.col(c) for c in left.columns if c not in on],
        *[F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}") for c in payload],
    )
    return carried.where(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"{prefix}{c}") for c in payload],
    )
