"""GeneratedConfig model + YAML IO + validation.

Rebuilds ``src/config/generated-config.types.ts:25-44`` (document shape),
``src/config/config-io.ts`` (YAML read/write + zod validation). Validation is
hand-rolled (stdlib-only).

Interchange: the CANONICAL internal form is ``column_strategy: {column:
STRATEGY}`` with ``scope.denylist`` and column entries keyed ``name`` —
but a YAML produced by the reference parses too. Its variants
(generated-config.types.ts:21-23, 27-37) are normalized on read:
``column_strategy: {STRATEGY: [columns]}`` (the GlobalColumnStrategy
orientation), ``scope.denylistTables``, ``samples.masked`` (→ ``unsafe``
inverted), top-level ``generatedAt``, and column entries keyed ``column``.
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
    "HASH_HMAC",
    "HASH_KEYED",
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
    generated_at: str | None = None  # generatedAt (generated-config.types.ts:27)

    def to_dict(self) -> dict[str, Any]:
        return {
            "version": self.version,
            **({"generatedAt": self.generated_at} if self.generated_at else {}),
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


def _normalize_column_strategy(cs: dict) -> dict[str, str]:
    """Normalize both column_strategy orientations to {column: STRATEGY}.

    - canonical internal: ``{column: STRATEGY}`` (values are strategy names)
    - reference GlobalColumnStrategy (generated-config.types.ts:21-23):
      ``{STRATEGY: [columns]}`` or ``{STRATEGY: {column: params}}``

    A later entry wins on conflict (deterministic: YAML mapping order).
    """
    _require(isinstance(cs, dict), "column_strategy must be a mapping")
    out: dict[str, str] = {}
    for k, v in cs.items():
        _require(isinstance(k, str), "column_strategy keys must be strings")
        if isinstance(v, str):
            _require(
                v.upper() in VALID_STRATEGIES,
                f"column_strategy[{k!r}]: unknown strategy {v!r}",
            )
            out[k] = v.upper()
        elif k.upper() in VALID_STRATEGIES and isinstance(v, (list, dict)):
            cols = v if isinstance(v, list) else list(v.keys())
            _require(
                all(isinstance(c, str) for c in cols),
                f"column_strategy[{k!r}]: column names must be strings",
            )
            for c in cols:
                out[c] = k.upper()
        else:
            raise ConfigValidationError(
                f"column_strategy[{k!r}]: expected a strategy name, or a "
                "strategy key mapping to a list of columns"
            )
    return out


def _scope_denylist(scope: dict) -> list:
    # reference name: denylistTables (generated-config.types.ts:31)
    return scope.get("denylistTables", scope.get("denylist", []))


def _column_name(c: dict):
    # reference name: column (generated-config.types.ts:10); internal: name
    return c.get("name", c.get("column"))


def validate_config_dict(d: dict) -> None:
    """Shape validation ≅ the zod schema at config-io.ts:34-60, accepting
    both the internal and the reference field spellings (module docstring)."""
    _require(isinstance(d, dict), "config must be a mapping")
    _require(isinstance(d.get("version"), int), "version must be an int")
    _require(isinstance(d.get("reviewed"), bool), "reviewed must be a bool")
    scope = d.get("scope")
    _require(isinstance(scope, dict), "scope must be a mapping")
    _require(isinstance(scope.get("schema"), str) and scope["schema"], "scope.schema required")
    deny = _scope_denylist(scope)
    _require(
        isinstance(deny, list) and all(isinstance(x, str) for x in deny),
        "scope.denylist / scope.denylistTables must be a list of strings",
    )
    _normalize_column_strategy(d.get("column_strategy", {}))  # raises on bad shape
    rules = d.get("rules", [])
    _require(isinstance(rules, list), "rules must be a list")
    for r in rules:
        _require(isinstance(r, dict), "each rule must be a mapping")
        _require(isinstance(r.get("table"), str) and r["table"], "rule.table required")
        _require(isinstance(r.get("enabled", True), bool), "rule.enabled must be a bool")
        for c in r.get("columns", []):
            _require(
                isinstance(c, dict) and isinstance(_column_name(c), str),
                "column.name (or reference-style column.column) required",
            )
            strat = c.get("strategy")
            if strat is not None:
                _require(
                    isinstance(strat, str) and strat.upper() in VALID_STRATEGIES,
                    f"column {_column_name(c)!r}: unknown strategy {strat!r}",
                )


def config_from_dict(d: dict) -> GeneratedConfig:
    validate_config_dict(d)
    scope = d.get("scope", {})
    samples = dict(d.get("samples", {"limit": 3, "unsafe": False}))
    if "masked" in samples and "unsafe" not in samples:
        # reference spelling (generated-config.types.ts:35): masked ≡ ¬unsafe
        samples["unsafe"] = not samples.pop("masked")
    return GeneratedConfig(
        version=d["version"],
        reviewed=d["reviewed"],
        scope=Scope(
            schema=scope.get("schema", "public"), denylist=list(_scope_denylist(scope))
        ),
        samples=samples,
        column_strategy=_normalize_column_strategy(d.get("column_strategy", {})),
        rules=[
            TableRule(
                table=r["table"],
                enabled=r.get("enabled", True),
                columns=[
                    ColumnRule(
                        name=_column_name(c),
                        strategy=(c.get("strategy") or None),
                        params=dict(c.get("params", {})),
                    )
                    for c in r.get("columns", [])
                ],
            )
            for r in d.get("rules", [])
        ],
        generated_at=d.get("generatedAt"),
    )


def write_yaml(path: str | Path, data: dict) -> None:
    """YAML sink ≅ writeYaml (config-io.ts:63-68)."""
    Path(path).write_text(yaml.safe_dump(data, sort_keys=False, allow_unicode=True))


def read_generated_config(path: str | Path) -> GeneratedConfig:
    """YAML source + validation ≅ readGeneratedConfig (config-io.ts:70-75)."""
    raw = yaml.safe_load(Path(path).read_text())
    return config_from_dict(raw)
