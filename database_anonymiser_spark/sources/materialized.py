"""Incremental materialized aggregates (IVM) over versioned tables
(round 14).

A materialized view here is an ordinary versioned table — keyed by the
GROUP BY columns — whose contents equal ``SELECT keys, aggs FROM source
GROUP BY keys`` at a recorded source version, plus a REFRESH operation
that advances it to the source's head by reading ONLY the change feed
of the intervening versions. At 100 TB this is the difference between
re-scanning the table per report and paying O(changed rows): the
classic delta-propagation result for distributive aggregates (Gupta &
Mumick, "Maintenance of Materialized Views", IEEE DE Bulletin 1995;
Delta Lake/DBSQL materialized views ship the same contract).

Supported aggregates — exactly the self-maintainable family:

- ``count(*)``          — +1 per inserted row image, −1 per deleted
- ``count(col)``        — signed count of NON-NULL ``col`` images
- ``sum(expr)``         — signed sum of the expression over images
- ``avg(expr)``         — maintained as (sum, non-null count) hidden
  companions; the visible column is recomputed exactly from them

``min``/``max`` are deliberately refused: they are not incrementally
maintainable under deletes without re-scanning the affected group (the
deleted value may have BEEN the min) — a refusal with that explanation
beats a silently O(table) refresh.

Delta propagation: every change-feed row carries a sign (+1 for
``insert``/``update_postimage``, −1 for ``delete``/
``update_preimage``), the signed contributions aggregate per group —
ONE shuffle over the CHANGES, never the table — and the per-group
deltas MERGE into the view through the native conditional multi-clause
merge: a group whose row count reaches zero deletes, an existing group
updates by addition, a fresh group inserts. The merge is file-skipped
on the group-key ranges like any other merge, and the commit carries
the new source watermark in the SAME atomic commit (the
``meta.properties`` slot — a crash between "apply deltas" and "record
watermark" could otherwise double-apply on the next refresh).

NULL group keys are refused at create/refresh (the versioned table's
key equality — like any SQL join — never matches NULL; ``coalesce``
the key in the view definition instead, message says so).

Float caveat: ``sum``/``avg`` over DOUBLE columns accumulate
reassociation drift relative to a from-scratch recompute (the same
drift any shuffle reorder produces); use DECIMAL columns where exact
refresh parity matters. Pinned by the equivalence tests with a
tolerance on doubles and exactly on integers.

Relationship to ``operators/ivm.py`` (round 6): that module is the
DEPTH axis of the same delta-propagation family — ONE (group, value)
pair maintained with the aggregates that need per-group state beyond
addition: MIN/MAX with the extremum-loss recompute bounded to exactly
the affected groups, approx-distinct as a mergeable per-group KMV
sketch, null-safe group keys, and compaction-segment skipping. This
module is the BREADTH axis: arbitrarily many named count/sum/avg
aggregates over a multi-column GROUP BY — the shape the SQL
``CREATE MATERIALIZED VIEW`` face needs — restricted to the
self-maintainable family precisely because each extra aggregate here
is just another addition column in the same single merge. A view that
needs maintained min/max/distinct uses ``IncrementalAggView``; the
refusal message says so.

Reference parity note: the reference has no materialized views (its
surface is per-table UPDATE scripts, ``src/executor/executor.ts``);
this module is part of the engine's storage north star, cited against
Delta's materialized-view semantics.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F

__all__ = [
    "create_materialized",
    "refresh_materialized",
    "materialized_info",
    "parse_mv_query",
]

#: hidden per-avg companion suffixes (sum / non-null count)
_S = "__ivm_s"
_N = "__ivm_n"
#: hidden group-liveness row count
_CNT = "__ivm_cnt"

_AGG_SHAPES = ("count", "sum", "avg")


def _validate_aggs(aggs: dict) -> dict:
    """Normalize {out_col: (kind, expr|None)}; refuse unsupported kinds
    with the maintainability explanation."""
    out = {}
    for col, spec in aggs.items():
        kind, expr = spec
        kind = kind.lower()
        if kind in ("min", "max"):
            raise ValueError(
                f"{kind}(...) is not self-maintainable under deletes "
                "(the removed value may have been the extreme) — use "
                "operators/ivm.py::IncrementalAggView(minmax=True), "
                "which maintains min/max with the extremum-loss "
                "recompute bounded to exactly the affected groups"
            )
        if kind not in _AGG_SHAPES:
            raise ValueError(
                f"unsupported aggregate {kind!r}; supported: "
                f"count(*) | count(expr) | sum(expr) | avg(expr)"
            )
        if kind == "count" and expr is not None and expr.strip() == "*":
            expr = None
        if kind in ("sum", "avg") and not (expr and expr.strip()):
            raise ValueError(f"{kind}() needs an expression")
        out[col] = (kind, expr.strip() if expr else None)
    return out


def _signed(expr: str) -> str:
    """Signed contribution of one change-feed row image."""
    return (
        "CASE WHEN _change_type IN ('insert', 'update_postimage') "
        f"THEN ({expr}) ELSE -({expr}) END"
    )


def _delta_frame(changes, keys: list, aggs: dict):
    """Per-group signed deltas over a change feed slice — one shuffle
    over the CHANGES only. Returns columns: keys + d_cnt + one delta
    column per visible/hidden aggregate slot."""
    sel = changes.select(
        *keys,
        F.expr(_signed("1")).cast("long").alias("d" + _CNT),
        *[
            c
            for col, (kind, expr) in aggs.items()
            for c in (
                [
                    F.expr(
                        _signed(f"CASE WHEN ({expr}) IS NOT NULL THEN 1 ELSE 0 END")
                        if expr is not None
                        else _signed("1")
                    ).cast("long").alias(f"d_{col}")
                ]
                if kind == "count"
                else [
                    F.expr(
                        _signed(f"coalesce(CAST(({expr}) AS DOUBLE), 0.0)")
                    ).alias(f"d_{col}")
                ]
                if kind == "sum"
                else [
                    F.expr(
                        _signed(f"coalesce(CAST(({expr}) AS DOUBLE), 0.0)")
                    ).alias(f"d_{col}{_S}"),
                    F.expr(
                        _signed(f"CASE WHEN ({expr}) IS NOT NULL THEN 1 ELSE 0 END")
                    ).cast("long").alias(f"d_{col}{_N}"),
                ]
            )
        ],
    )
    dcols = [c for c in sel.columns if c not in keys]
    return sel.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in dcols]
    )


def _full_frame(src_df, keys: list, aggs: dict):
    """The from-scratch aggregate with the MV's physical schema (used at
    create; also what every refresh must stay equal to — the tests'
    oracle)."""
    cols = [F.count(F.lit(1)).alias(_CNT)]
    for col, (kind, expr) in aggs.items():
        if kind == "count":
            cols.append(
                F.count(F.expr(expr)).alias(col)
                if expr is not None
                else F.count(F.lit(1)).alias(col)
            )
        elif kind == "sum":
            cols.append(
                F.sum(F.expr(f"CAST(({expr}) AS DOUBLE)")).alias(col)
            )
        else:  # avg: visible col + hidden (sum, n)
            cols.append(F.avg(F.expr(f"CAST(({expr}) AS DOUBLE)")).alias(col))
            cols.append(
                F.sum(F.expr(f"CAST(({expr}) AS DOUBLE)")).alias(f"{col}{_S}")
            )
            cols.append(F.count(F.expr(expr)).alias(f"{col}{_N}"))
    out = src_df.groupBy(*keys).agg(*cols)
    # sum over an all-NULL group is NULL; the merge arithmetic wants 0
    # with the visible NULL derived from n = 0
    fixes = {}
    for col, (kind, expr) in aggs.items():
        if kind == "sum":
            fixes[col] = F.coalesce(F.col(col), F.lit(0.0))
        elif kind == "avg":
            fixes[f"{col}{_S}"] = F.coalesce(F.col(f"{col}{_S}"), F.lit(0.0))
    for c, e in fixes.items():
        out = out.withColumn(c, e)
    return out


def _check_no_null_keys(df, keys: list, where: str):
    null_pred = " OR ".join(f"{k} IS NULL" for k in keys)
    if df.where(null_pred).limit(1).count():
        raise ValueError(
            f"NULL group-key value in {where}: the view's key-equality "
            "merge (like any SQL join) never matches NULL — coalesce "
            "the key in the view definition, e.g. "
            f"GROUP BY coalesce({keys[0]}, <sentinel>)"
        )


def create_materialized(
    spark, mv_root, source_root, keys, aggs: dict
):
    """Create the materialized view: ONE full aggregate scan of the
    source's current snapshot into a fresh versioned table keyed by the
    group columns, with the IVM contract (source root, keys, aggregate
    specs, source watermark) recorded in the table's property map.
    Returns the :class:`VersionedTable`.

    ``aggs``: ``{out_col: (kind, expr|None)}`` with kind ∈ count | sum
    | avg (see module docstring for why min/max refuse).
    """
    from database_anonymiser_spark.sources.versioned import VersionedTable

    keys = list(keys)
    aggs = _validate_aggs(dict(aggs))
    reserved = {_CNT} | {
        f"{c}{suf}" for c in aggs for suf in (_S, _N)
    }
    if set(keys) & set(aggs):
        raise ValueError("a column cannot be both a group key and an aggregate")
    if reserved & set(aggs) or any(k in reserved for k in keys):
        raise ValueError(f"column names {sorted(reserved)} are reserved")
    src = VersionedTable(spark, source_root)
    src_v = src.latest_version()
    snap = src.snapshot(src_v)
    _check_no_null_keys(snap.select(*keys), keys, "the source snapshot")
    mv_df = _full_frame(snap, keys, aggs)
    mv = VersionedTable.create(
        spark, mv_root, mv_df,
        key_col=keys[0] if len(keys) == 1 else keys,
    )
    mv.set_properties({
        "ivm.source": str(src.root),
        "ivm.keys": json.dumps(keys),
        "ivm.aggs": json.dumps({c: list(s) for c, s in aggs.items()}),
        "ivm.last_version": str(src_v),
    })
    return mv


def materialized_info(mv) -> dict:
    """The IVM contract recorded on a materialized table; raises for a
    plain table."""
    props = mv.detail()["properties"]
    if "ivm.source" not in props:
        raise ValueError(
            f"{mv.root} is not a materialized view (no ivm.* properties)"
        )
    return {
        "source": props["ivm.source"],
        "keys": json.loads(props["ivm.keys"]),
        "aggs": {
            c: tuple(s) for c, s in json.loads(props["ivm.aggs"]).items()
        },
        "last_version": int(props["ivm.last_version"]),
    }


def refresh_materialized(spark, mv_root) -> dict:
    """Advance the view to the source's head by delta propagation:
    read the source change feed for (last_version, head], aggregate the
    signed contributions per group (one shuffle over the CHANGES), and
    MERGE the deltas in — groups reaching zero rows delete, existing
    groups update by addition, fresh groups insert. The source
    watermark advances IN the merge commit (atomic: a crash can never
    double-apply). Returns ``{"refreshed": bool, "from_version",
    "to_version", "groups_changed"}``.

    Scale shape: cost is O(changed rows) + a merge file-skipped on the
    group-key range of the delta — a trickle of changes against a
    100 TB source refreshes in seconds regardless of table size.
    """
    from database_anonymiser_spark.sources.versioned import VersionedTable

    mv = VersionedTable(spark, mv_root)
    info = materialized_info(mv)
    src = VersionedTable(spark, info["source"])
    keys, aggs = info["keys"], _validate_aggs(info["aggs"])
    last = info["last_version"]
    head = src.latest_version()
    if head == last:
        return {"refreshed": False, "from_version": last,
                "to_version": head, "groups_changed": 0}
    if head < last:
        raise ValueError(
            f"source head {head} is BELOW the recorded watermark {last} "
            "(the source history was rewritten?); rebuild the view"
        )
    changes = src.diff(last, head, images="both")
    _check_no_null_keys(
        changes.select(*keys), keys, f"source changes {last}..{head}"
    )
    # persist: the delta is consumed twice (group count for the no-op
    # path/report, then the merge's join) — without it the change-feed
    # diff recomputes per consumer
    delta = _delta_frame(changes, keys, aggs).persist()
    n_groups = delta.count()
    new_props = {
        **{k: v for k, v in mv._raw_properties().items()},
        "ivm.last_version": str(head),
    }
    if n_groups == 0:
        # nothing to merge: advance the watermark as its own commit
        mv.set_properties({"ivm.last_version": str(head)})
        return {"refreshed": True, "from_version": last,
                "to_version": head, "groups_changed": 0}

    # merge SET exprs: every slot updates by addition; visible avg
    # recomputes exactly from its companions
    set_exprs = {_CNT: f"t.{_CNT} + s.d{_CNT}"}
    ins_exprs = {_CNT: f"s.d{_CNT}"}
    for k in keys:
        ins_exprs[k] = f"s.{k}"
    for col, (kind, expr) in aggs.items():
        if kind in ("count", "sum"):
            z = "0L" if kind == "count" else "CAST(0.0 AS DOUBLE)"
            set_exprs[col] = f"coalesce(t.{col}, {z}) + s.d_{col}"
            ins_exprs[col] = f"s.d_{col}"
        else:
            s_, n_ = f"{col}{_S}", f"{col}{_N}"
            set_exprs[s_] = f"t.{s_} + s.d_{s_}"
            set_exprs[n_] = f"t.{n_} + s.d_{n_}"
            set_exprs[col] = (
                f"CASE WHEN t.{n_} + s.d_{n_} > 0 "
                f"THEN (t.{s_} + s.d_{s_}) / (t.{n_} + s.d_{n_}) END"
            )
            ins_exprs[s_] = f"s.d_{s_}"
            ins_exprs[n_] = f"s.d_{n_}"
            ins_exprs[col] = (
                f"CASE WHEN s.d_{n_} > 0 THEN s.d_{s_} / s.d_{n_} END"
            )
    mv.merge(
        delta,
        matched=[
            ("delete", f"t.{_CNT} + s.d{_CNT} <= 0"),
            ("update", None, set_exprs),
        ],
        not_matched=[("insert", f"s.d{_CNT} > 0", ins_exprs)],
        # the watermark rides the SAME commit as the deltas: atomic
        meta={"properties": new_props},
    )
    delta.unpersist()
    return {"refreshed": True, "from_version": last, "to_version": head,
            "groups_changed": int(n_groups)}


# --------------------------------------------------------------------------
# SQL shape: CREATE MATERIALIZED VIEW ... AS SELECT keys, aggs FROM src
#            GROUP BY keys
# --------------------------------------------------------------------------

_AGG_RE = re.compile(
    r"^\s*(count|sum|avg|min|max)\s*\((?P<arg>.+)\)\s+AS\s+"
    r"(?P<name>[A-Za-z_][\w$]*)\s*$",
    re.I | re.S,
)


def parse_mv_query(select_sql: str) -> tuple[str, list, dict]:
    """Parse the restricted MV SELECT shape into (source_view, keys,
    aggs). Every select item is either a bare group-key column or
    ``count(*)|count(e)|sum(e)|avg(e) AS name``; FROM names one view;
    GROUP BY lists the key columns. Anything else refuses with the
    shape — a materialized view's refresh algebra only exists for this
    family, so the parser only claims it."""
    m = re.match(
        r"\s*SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<src>[A-Za-z_][\w$.]*)\s+"
        r"GROUP\s+BY\s+(?P<gb>.+?)\s*$",
        select_sql, re.I | re.S,
    )
    if not m:
        raise ValueError(
            "materialized view query must be: SELECT <keys and "
            "count/sum/avg aggregates> FROM <view> GROUP BY <keys>"
        )
    keys = [c.strip() for c in m.group("gb").split(",") if c.strip()]
    if not all(re.fullmatch(r"[A-Za-z_][\w$]*", k) for k in keys):
        raise ValueError(
            "GROUP BY items must be plain columns (coalesce/derive them "
            "in a source view first)"
        )
    aggs: dict = {}
    seen_keys = []
    # split the select list on top-level commas (parens nest in agg args)
    items, depth, cur = [], 0, []
    for ch in m.group("sel"):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    items.append("".join(cur))
    for item in items:
        it = item.strip()
        am = _AGG_RE.match(it)
        if am:
            kind = am.group(1).lower()
            if kind in ("min", "max"):
                _validate_aggs({am.group("name"): (kind, am.group("arg"))})
            arg = am.group("arg").strip()
            aggs[am.group("name")] = (
                kind, None if (kind == "count" and arg == "*") else arg
            )
        elif re.fullmatch(r"[A-Za-z_][\w$]*", it):
            seen_keys.append(it)
        else:
            raise ValueError(
                f"unsupported materialized-view select item {it!r}: "
                "use a bare group key or count/sum/avg(...) AS name"
            )
    if sorted(seen_keys) != sorted(keys):
        raise ValueError(
            f"select keys {sorted(seen_keys)} must equal GROUP BY keys "
            f"{sorted(keys)}"
        )
    if not aggs:
        raise ValueError("materialized view needs at least one aggregate")
    return m.group("src"), keys, aggs
