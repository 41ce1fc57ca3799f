"""Slowly-changing-dimension (Type 2) maintenance on the versioned layer.

The warehouse pattern (Kimball's SCD Type 2 — public knowledge): a
dimension keeps FULL HISTORY by closing the current row and inserting a
new one whenever a tracked attribute changes, instead of updating in
place. Rendered here on :class:`~database_anonymiser_spark.sources.
versioned.VersionedTable` with a single MERGE per apply:

- each dimension row carries ``_sk`` (surrogate key = md5 of natural key
  + effective timestamp), ``_valid_from``, ``_valid_to`` (NULL = open)
  and ``_is_current``;
- ``scd2_apply(source, ts)`` computes, in one pass over source ⋈ current:
  CLOSES (current rows whose tracked attributes differ from the incoming
  image → ``_valid_to = ts``, ``_is_current = false``) and OPENS (new
  images for changed keys + first images for new keys), then MERGEs the
  union on ``_sk`` — closes update their existing row, opens insert;
  unchanged keys produce nothing, so re-applying the same source is an
  exact no-op (idempotent ingest);
- ``scd2_as_of(dim, ts)`` reconstructs the dimension as of any time from
  the validity intervals — row-level time travel on business time,
  complementing the table's version-level time travel on commit history.

100 TB shape: the apply touches source ⋈ current-slice only (the history
is carried by reference through MERGE's file skipping on ``_sk``), one
shuffle for the change join and one MERGE commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database_anonymiser_spark.sources.versioned import VersionedTable, _key_tuple

SCD_COLS = ("_sk", "_valid_from", "_valid_to", "_is_current")


def _with_scd_cols(src: DataFrame, key_col, ts) -> DataFrame:
    # composite natural keys (round 11): the surrogate hashes the full
    # key tuple + effective timestamp — single-key output is unchanged
    kt = _key_tuple(key_col)
    return src.select(
        F.md5(
            F.concat_ws(
                ":", *[F.col(c).cast("string") for c in kt], F.lit(str(ts))
            )
        ).alias("_sk"),
        *src.columns,
        F.lit(ts).alias("_valid_from"),
        F.lit(None).cast("string").alias("_valid_to"),
        F.lit(True).alias("_is_current"),
    )


def scd2_init(
    spark, root, source: DataFrame, key_col, ts: str
) -> VersionedTable:
    """Create the dimension from the first source extract; every row opens
    at ``ts``. The table's MERGE key is the surrogate ``_sk``."""
    return VersionedTable.create(
        spark, root, _with_scd_cols(source, key_col, ts), key_col="_sk"
    )


def scd2_apply(
    dim: VersionedTable,
    source: DataFrame,
    key_col,
    tracked_cols: tuple[str, ...],
    ts: str,
    on_late: str = "error",
) -> int:
    """Apply one source extract at business time ``ts``; returns the new
    table version (or the current one when nothing changed — no empty
    commit). ``tracked_cols`` are the attributes whose change opens a new
    row; untracked attribute drift does NOT create history (Kimball Type
    1 handling for those would be a separate update — deliberately not
    conflated here).

    LATE-ARRIVING extracts (round 8): a changed key whose CURRENT row
    already opened at ``_valid_from >= ts`` cannot be closed at ``ts``
    without writing a negative validity interval — silent history
    corruption (``scd2_as_of`` would drop the key for part of the
    timeline). ``on_late='error'`` (default) raises loudly — batch
    extract sequences are expected monotone; ``on_late='skip'`` drops
    exactly the late images (latest-wins, the streaming sink's choice:
    an out-of-order replayed batch must not rewrite newer history) and
    applies the rest. True Kimball late-arriving-dimension SPLICING
    (inserting an interval mid-history and re-pointing facts) is a
    different, offline operation — deliberately not conflated here."""
    if on_late not in ("error", "skip"):
        raise ValueError("on_late must be 'error' or 'skip'")
    cur = dim.snapshot().where(F.col("_is_current"))
    kt = _key_tuple(key_col)
    src = source.alias("s")
    curk = cur.alias("c")
    on = F.col(f"s.{kt[0]}") == F.col(f"c.{kt[0]}")
    for c in kt[1:]:
        on = on & (F.col(f"s.{c}") == F.col(f"c.{c}"))
    joined = src.join(curk, on, "left")
    changed_pred = F.col(f"c.{kt[0]}").isNull()  # new key
    for c in tracked_cols:
        changed_pred = changed_pred | ~F.col(f"s.{c}").eqNullSafe(F.col(f"c.{c}"))
    # cache the change join so the emptiness probe and the MERGE evaluate
    # it ONCE (round-6 verdict nit: the probe used to recompute the join);
    # the delta is extract-sized, the same data MERGE materializes anyway
    is_late = F.col("c._valid_from").isNotNull() & (
        F.col("c._valid_from") >= F.lit(ts)
    )
    cached = joined.where(changed_pred).cache()
    delta = cached
    try:
        if on_late == "error":
            if delta.where(is_late).limit(1).count() > 0:
                raise ValueError(
                    f"late-arriving extract: ts {ts!r} is not after every "
                    "changed key's current _valid_from; pass on_late='skip' "
                    "to drop late images (latest-wins)"
                )
        else:
            delta = delta.where(~is_late)
        if delta.limit(1).count() == 0:
            return dim.latest_version()

        opens = _with_scd_cols(
            delta.select(*[F.col(f"s.{c}").alias(c) for c in source.columns]),
            key_col,
            ts,
        )
        closes = delta.where(F.col(f"c.{kt[0]}").isNotNull()).select(
            F.col("c._sk").alias("_sk"),
            *[F.col(f"c.{c}").alias(c) for c in source.columns],
            F.col("c._valid_from").alias("_valid_from"),
            F.lit(ts).alias("_valid_to"),
            F.lit(False).alias("_is_current"),
        )
        # the delta's surrogate keys are hash-scattered over the keyspace:
        # point skipping touches only the files holding a closed row's _sk
        # (range skipping would span nearly the whole dimension)
        dim.merge(opens.unionByName(closes), when_matched="update", skip_by="points")
        return dim.latest_version()
    finally:
        cached.unpersist()


def scd2_current(dim: VersionedTable) -> DataFrame:
    return dim.snapshot().where(F.col("_is_current")).drop(*SCD_COLS)


def scd2_temporal_join(
    facts: DataFrame,
    dim: VersionedTable,
    key_col,
    ts_col: str,
    how: str = "left",
) -> DataFrame:
    """EVENT-TIME dimension join: each fact row joins the dimension row
    that was valid AT THE FACT'S OWN TIMESTAMP — the correctness property
    batch pipelines silently get wrong when they join facts against the
    CURRENT dimension (late-arriving facts then carry attributes from the
    future). One range join on (key, validity interval); each fact
    matches at most one dimension row because SCD2 intervals partition
    the timeline per key.

    100 TB shape: an equi-join on the key with an interval residual —
    shuffles on the key like any fact-dim join; the dimension side is
    history-sized (current + closed rows), usually broadcastable.
    ``ts_col`` values are compared as strings against the dim's
    ``_valid_from``/``_valid_to`` — use one canonical sortable timestamp
    rendering (ISO-8601) on both sides."""
    kt = _key_tuple(key_col)
    d = dim.snapshot()
    dcols = [c for c in d.columns if c not in SCD_COLS and c not in kt]
    dks = [f"_dk{i}" for i in range(len(kt))]
    d = d.select(
        *[F.col(c).alias(dk) for c, dk in zip(kt, dks)],
        *dcols,
        F.col("_valid_from"),
        F.col("_valid_to"),
    )
    cond = (
        (F.col("_valid_from") <= facts[ts_col])
        & (F.col("_valid_to").isNull() | (F.col("_valid_to") > facts[ts_col]))
    )
    for c, dk in zip(kt, dks):
        cond = (facts[c] == F.col(dk)) & cond
    return facts.join(d, cond, how).drop(*dks, "_valid_from", "_valid_to")


def scd2_as_of(dim: VersionedTable, ts: str) -> DataFrame:
    """The dimension as of business time ``ts``: rows whose validity
    interval covers it (``_valid_from <= ts < _valid_to``, open-ended
    rows always qualify once started)."""
    return (
        dim.snapshot()
        .where(
            (F.col("_valid_from") <= ts)
            & (F.col("_valid_to").isNull() | (F.col("_valid_to") > ts))
        )
        .drop(*SCD_COLS)
    )
