"""Join operators Spark lacks as built-ins (SURVEY.md §2.5 extensions).

The reference has no joins at all (SURVEY.md §2.5 — its complete SQL surface
is catalog scans + UPDATEs, ``src/executor/query-builder.ts:58-61``); these
are capability extensions mandated by the north star.

As-of join: the classic time-series primitive (latest right row at-or-before
each left row, per key — or its forward / nearest variants). Spark has no
built-in; the scalable construction is union + ordered window with
``last(..., ignorenulls)`` — ONE shuffle on the key, state linear in rows, no
range-join candidate blowup. A ``merge_asof``-style Pandas UDF would shuffle
the same data AND pay Python serialization; a range join would explode
candidates quadratically per key.
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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row sharing the ``on`` keys:

    - ``backward`` (default): the latest right row with ``right_ts <=
      left_ts`` (inclusive);
    - ``forward``: the earliest right row with ``right_ts >= left_ts``;
    - ``nearest``: whichever of the two is closer in time (tie → backward).

    Right ties on the timestamp resolve deterministically via ``tie_break``
    (greatest wins for backward, smallest for forward — the symmetric
    natural choices).

    Returns all left columns plus ``prefix + c`` for each payload column
    (null when no right row qualifies). All variants are ONE shuffle on the
    keys: both direction windows share the same partitioning, so "nearest"
    costs only an extra per-partition sort, never a second exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    payload = [c for c in right_payload if c not in on]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
        F.col(right_ts).alias("_rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    def carry_window(forward: bool) -> Window:
        # Right rows sort before left rows at equal timestamps, giving the
        # inclusive (<= / >=) semantics; among right ties, the tie_break
        # order makes last() pick greatest (backward) / smallest (forward).
        ts_order = F.col("_ts").desc() if forward else F.col("_ts").asc()
        order = [ts_order, F.col("_side").asc()]
        if tie_break and tie_break in payload:
            tb = F.col(f"{prefix}{tie_break}")
            order.append(tb.desc() if forward else tb.asc())
        return (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    def carried(w: Window, tag: str):
        cols = {}
        for c in payload:
            cols[f"{tag}{c}"] = F.last(f"{prefix}{c}", ignorenulls=True).over(w)
        cols[f"{tag}_rts"] = F.last("_rts", ignorenulls=True).over(w)
        return cols

    if direction in ("backward", "forward"):
        w = carry_window(forward=(direction == "forward"))
        out = unioned.select(
            *on,
            "_ts",
            "_side",
            *[F.col(c) for c in left.columns if c not in on],
            *[
                F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
                for c in payload
            ],
        )
        return out.where(F.col("_side") == 1).select(
            *left.columns,
            *[F.col(f"{prefix}{c}") for c in payload],
        )

    # nearest: carry both directions over the SAME partitioning, pick per row
    wb, wf = carry_window(forward=False), carry_window(forward=True)
    b_cols = carried(wb, "_b_")
    f_cols = carried(wf, "_f_")
    both = unioned.select(
        *on,
        "_ts",
        "_side",
        *[F.col(c) for c in left.columns if c not in on],
        *[expr.alias(name) for name, expr in {**b_cols, **f_cols}.items()],
    ).where(F.col("_side") == 1)
    b_dist = F.col("_ts") - F.col("_b__rts")
    f_dist = F.col("_f__rts") - F.col("_ts")
    use_backward = F.col("_f__rts").isNull() | (
        F.col("_b__rts").isNotNull() & (b_dist <= f_dist)
    )
    return both.select(
        *left.columns,
        *[
            F.when(use_backward, F.col(f"_b_{c}"))
            .otherwise(F.col(f"_f_{c}"))
            .alias(f"{prefix}{c}")
            for c in payload
        ],
    )


def asof_join_all(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tie_break: str | None = None,
    prefix: str = "asof_",
    direction_col: str = "direction",
) -> DataFrame:
    """All three as-of directions from ONE shuffle (r15, guide §2.4).

    Calling :func:`asof_join` once per direction pays the union+exchange
    of the SAME tagged frame three times (and a union of three such
    subtrees does NOT dedup physically — per-branch column pruning makes
    the exchanges non-canonical, so ReuseExchange never fires; verified
    on the executed plan). The ``nearest`` path already computes the
    backward AND forward carries over a single partitioning — so this
    helper builds that carried frame once and emits the three directions
    from ONE pipeline by exploding a direction tag: scan → union →
    exchange → two stacked window sorts → 3-way explode + CASE. One
    exchange and one pass of window carries total, no cache barrier.

    Returns ``left.columns + [direction_col] + prefixed payload`` — per
    direction value, row-identical to ``asof_join(direction=...)``
    (pinned in tests/test_suite_ops.py; the windows are the same specs,
    so the carried values are equal by construction).
    """
    payload = [c for c in right_payload if c not in on]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
        F.col(right_ts).alias("_rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    def carry_window(forward: bool) -> Window:
        ts_order = F.col("_ts").desc() if forward else F.col("_ts").asc()
        order = [ts_order, F.col("_side").asc()]
        if tie_break and tie_break in payload:
            tb = F.col(f"{prefix}{tie_break}")
            order.append(tb.desc() if forward else tb.asc())
        return (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    wb, wf = carry_window(forward=False), carry_window(forward=True)
    carry_cols = []
    for tag, w in (("_b_", wb), ("_f_", wf)):
        for c in payload:
            carry_cols.append(
                F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{tag}{c}")
            )
        carry_cols.append(F.last("_rts", ignorenulls=True).over(w).alias(f"{tag}_rts"))
    both = (
        unioned.select(
            *on,
            "_ts",
            "_side",
            *[F.col(c) for c in left.columns if c not in on],
            *carry_cols,
        )
        .where(F.col("_side") == 1)
    )

    b_dist = F.col("_ts") - F.col("_b__rts")
    f_dist = F.col("_f__rts") - F.col("_ts")
    use_backward = F.col("_f__rts").isNull() | (
        F.col("_b__rts").isNotNull() & (b_dist <= f_dist)
    )

    def pick(c: str):
        near = F.when(use_backward, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}"))
        return (
            F.when(F.col(direction_col) == "backward", F.col(f"_b_{c}"))
            .when(F.col(direction_col) == "forward", F.col(f"_f_{c}"))
            .otherwise(near)
            .alias(f"{prefix}{c}")
        )

    return both.select(
        "*",
        F.explode(
            F.array(F.lit("backward"), F.lit("forward"), F.lit("nearest"))
        ).alias(direction_col),
    ).select(
        *left.columns,
        direction_col,
        *[pick(c) for c in payload],
    )


def gap_fill(
    obs: DataFrame,
    on: list[str],
    ts_col: str,
    payload: list[str],
    step: str = "1 day",
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Regular-grid gap filling with last-observation-carried-forward — the
    time-series resampling step (pandas ``resample().ffill()``, SQL
    GAP_FILL/LOCF) rendered as grid generation + as-of-backward join:

    1. per key, one aggregate gets [min_ts, max_ts]; the grid is
       ``sequence(date_trunc(step, min_ts), max_ts, step)`` exploded —
       rows ∝ Σ per-key span/step, generated map-side from the 1-row-per-
       key bounds (never materialised on the driver);
    2. the grid as-of-backward joins the observations
       (:func:`asof_join`) — each bucket carries the latest observation
       at-or-before it, so a bucket with no new data repeats the previous
       value (LOCF); buckets between the calendar-truncated grid start and
       the key's first observation carry NULL (the standard LOCF
       contract — nothing to carry yet).

    Output: ``on`` keys, ``bucket_ts`` (grid timestamp), and the carried
    ``{prefix}{payload}`` columns from :func:`asof_join` (add the
    observation's own ts column to ``payload`` to carry the source time).

    100 TB shape: the bounds aggregate is one partial-agg shuffle; the
    as-of join is the engine's single-shuffle union+window construction.
    Grid density is the caller's lever: step controls output volume
    exactly, independent of observation skew.
    """
    trunc_unit = step.strip().split()[-1].rstrip("s")
    bounds = obs.groupBy(*on).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("_lo"),
        F.max(ts_col).alias("_hi"),
    )
    grid = bounds.select(
        *on,
        F.explode(F.expr(f"sequence(_lo, _hi, interval {step})")).alias("bucket_ts"),
    )
    return asof_join(
        grid,
        obs,
        on=on,
        left_ts="bucket_ts",
        right_ts=ts_col,
        right_payload=payload,
        tie_break=tie_break,
        prefix=prefix,
        direction="backward",
    )
