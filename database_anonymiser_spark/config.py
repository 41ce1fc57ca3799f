"""GeneratedConfig model + YAML IO + validation.

Rebuilds ``src/config/generated-config.types.ts:25-44`` (document shape),
``src/config/config-io.ts`` (YAML read/write + zod validation). Validation is
hand-rolled (stdlib-only) but enforces the same shape the zod schema does
(config-io.ts:34-60): version literal, reviewed boolean, scope with schema +
denylist, column_strategy map, per-table rules with enabled flag + columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

CONFIG_VERSION = 1

VALID_STRATEGIES = {
    "KEEP",
    "SET_NULL",
    "REDACT",
    "HASH_SHA256",
    "HASH_SHA256_REAL",
    "TRUNCATE",
    "EMAIL_FAKE",
}


class ConfigValidationError(ValueError):
    """Config failed shape validation (≅ zod parse error, config-io.ts:73)."""


@dataclass
class ColumnRule:
    """Per-column entry in a table rule: name + optional explicit strategy."""

    name: str
    strategy: str | None = None
    params: dict = field(default_factory=dict)


@dataclass
class TableRule:
    """Per-table rule (generated-config.types.ts:12-23)."""

    table: str  # "schema.table"
    enabled: bool = True
    columns: list[ColumnRule] = field(default_factory=list)


@dataclass
class Scope:
    """Run scope: one schema + table denylist (generated-config.types.ts:27-31)."""

    schema: str = "public"
    denylist: list[str] = field(default_factory=list)


@dataclass
class GeneratedConfig:
    """The full declarative rule document (generated-config.types.ts:25-44)."""

    version: int = CONFIG_VERSION
    reviewed: bool = False
    scope: Scope = field(default_factory=Scope)
    samples: dict = field(default_factory=lambda: {"limit": 3, "unsafe": False})
    column_strategy: dict[str, str] = field(default_factory=dict)
    rules: list[TableRule] = field(default_factory=list)

    def to_dict(self) -> dict[str, Any]:
        return {
            "version": self.version,
            "reviewed": self.reviewed,
            "scope": {"schema": self.scope.schema, "denylist": list(self.scope.denylist)},
            "samples": dict(self.samples),
            "column_strategy": dict(self.column_strategy),
            "rules": [
                {
                    "table": r.table,
                    "enabled": r.enabled,
                    "columns": [
                        {"name": c.name}
                        | ({"strategy": c.strategy} if c.strategy else {})
                        | ({"params": c.params} if c.params else {})
                        for c in r.columns
                    ],
                }
                for r in self.rules
            ],
        }


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ConfigValidationError(msg)


def validate_config_dict(d: dict) -> None:
    """Shape validation ≅ the zod schema at config-io.ts:34-60."""
    _require(isinstance(d, dict), "config must be a mapping")
    _require(isinstance(d.get("version"), int), "version must be an int")
    _require(isinstance(d.get("reviewed"), bool), "reviewed must be a bool")
    scope = d.get("scope")
    _require(isinstance(scope, dict), "scope must be a mapping")
    _require(isinstance(scope.get("schema"), str) and scope["schema"], "scope.schema required")
    _require(
        isinstance(scope.get("denylist", []), list)
        and all(isinstance(x, str) for x in scope.get("denylist", [])),
        "scope.denylist must be a list of strings",
    )
    cs = d.get("column_strategy", {})
    _require(isinstance(cs, dict), "column_strategy must be a mapping")
    for k, v in cs.items():
        _require(isinstance(k, str), "column_strategy keys must be strings")
        _require(
            isinstance(v, str) and v.upper() in VALID_STRATEGIES,
            f"column_strategy[{k!r}]: unknown strategy {v!r}",
        )
    rules = d.get("rules", [])
    _require(isinstance(rules, list), "rules must be a list")
    for r in rules:
        _require(isinstance(r, dict), "each rule must be a mapping")
        _require(isinstance(r.get("table"), str) and r["table"], "rule.table required")
        _require(isinstance(r.get("enabled", True), bool), "rule.enabled must be a bool")
        for c in r.get("columns", []):
            _require(isinstance(c, dict) and isinstance(c.get("name"), str), "column.name required")
            strat = c.get("strategy")
            if strat is not None:
                _require(
                    isinstance(strat, str) and strat.upper() in VALID_STRATEGIES,
                    f"column {c.get('name')!r}: unknown strategy {strat!r}",
                )


def config_from_dict(d: dict) -> GeneratedConfig:
    validate_config_dict(d)
    scope = d.get("scope", {})
    return GeneratedConfig(
        version=d["version"],
        reviewed=d["reviewed"],
        scope=Scope(schema=scope.get("schema", "public"), denylist=list(scope.get("denylist", []))),
        samples=dict(d.get("samples", {"limit": 3, "unsafe": False})),
        column_strategy={k: v.upper() for k, v in d.get("column_strategy", {}).items()},
        rules=[
            TableRule(
                table=r["table"],
                enabled=r.get("enabled", True),
                columns=[
                    ColumnRule(
                        name=c["name"],
                        strategy=(c.get("strategy") or None),
                        params=dict(c.get("params", {})),
                    )
                    for c in r.get("columns", [])
                ],
            )
            for r in d.get("rules", [])
        ],
    )


def write_yaml(path: str | Path, data: dict) -> None:
    """YAML sink ≅ writeYaml (config-io.ts:63-68)."""
    Path(path).write_text(yaml.safe_dump(data, sort_keys=False, allow_unicode=True))


def read_generated_config(path: str | Path) -> GeneratedConfig:
    """YAML source + validation ≅ readGeneratedConfig (config-io.ts:70-75)."""
    raw = yaml.safe_load(Path(path).read_text())
    return config_from_dict(raw)
