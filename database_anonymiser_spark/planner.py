"""Config → Plan: the execution IR builder.

Rebuilds ``src/planner/plan-builder.ts`` and ``src/planner/plan-types.ts``:
- P2 enabled-flag filter (plan-builder.ts:70)
- P3 denylist filter on "schema.table" OR bare table name (plan-builder.ts:66,72-75)
- C3 strategy-resolution precedence (plan-builder.ts:19-47):
  table-level explicit override → global column_strategy map → default KEEP.

The plan is a pure driver-side dataclass tree; each PlannedColumn later
compiles to a Spark Column expression (strategies.py) instead of a SQL SET
fragment.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from database_anonymiser_spark.config import GeneratedConfig, TableRule

DEFAULT_STRATEGY = "KEEP"  # plan-builder.ts:10


@dataclass(frozen=True)
class PlannedColumn:
    """≅ PlannedColumn (plan-types.ts:4-8)."""

    column: str
    strategy: str
    params: dict = field(default_factory=dict)


@dataclass(frozen=True)
class PlannedTable:
    """≅ PlannedTable (plan-types.ts:10-15)."""

    table: str  # "schema.table"
    schema: str
    name: str
    columns: tuple[PlannedColumn, ...] = ()


@dataclass(frozen=True)
class Plan:
    """≅ Plan (plan-types.ts:17-21)."""

    created_at: str
    tables: tuple[PlannedTable, ...] = ()


def resolve_strategy(
    column_name: str,
    explicit: str | None,
    global_strategy: dict[str, str],
) -> tuple[str, dict]:
    """C3 precedence (plan-builder.ts:19-47).

    1. explicit per-column strategy in the table rule wins;
    2. else the global column_strategy map, matched on lower-cased column name;
    3. else KEEP.
    Returns (strategy, params) — params currently only flow from explicit rules.
    """
    if explicit:
        return explicit.upper(), {}
    g = global_strategy.get(column_name.lower())
    if g:
        return g.upper(), {}
    return DEFAULT_STRATEGY, {}


def is_denylisted(table_rule: TableRule, denylist: list[str]) -> bool:
    """P3: match on full "schema.table" OR bare table name (plan-builder.ts:66,72-75)."""
    deny = set(denylist)
    full = table_rule.table
    bare = full.split(".", 1)[1] if "." in full else full
    return full in deny or bare in deny


def build_plan(config: GeneratedConfig, created_at: str | None = None) -> Plan:
    """≅ buildPlan (plan-builder.ts:65-107)."""
    tables: list[PlannedTable] = []
    for rule in config.rules:
        if not rule.enabled:  # P2
            continue
        if is_denylisted(rule, config.scope.denylist):  # P3
            continue
        full = rule.table
        if "." in full:
            schema, name = full.split(".", 1)
        else:
            schema, name = config.scope.schema, full
        cols = tuple(
            PlannedColumn(
                c.name,
                *_merge_params(resolve_strategy(c.name, c.strategy, config.column_strategy), c.params),
            )
            for c in rule.columns
        )
        tables.append(PlannedTable(table=full, schema=schema, name=name, columns=cols))
    stamp = created_at or datetime.now(timezone.utc).isoformat()
    return Plan(created_at=stamp, tables=tuple(tables))


def _merge_params(resolved: tuple[str, dict], explicit_params: dict) -> tuple[str, dict]:
    strategy, params = resolved
    merged = dict(params)
    merged.update(explicit_params or {})
    return strategy, merged


def plan_to_dict(plan: Plan) -> dict:
    return {
        "createdAt": plan.created_at,
        "tables": [
            {
                "table": t.table,
                "schema": t.schema,
                "name": t.name,
                "columns": [
                    {"column": c.column, "strategy": c.strategy, "params": dict(c.params)}
                    for c in t.columns
                ],
            }
            for t in plan.tables
        ],
    }
