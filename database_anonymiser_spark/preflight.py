"""Preflight gate checks before execution.

Rebuilds ``src/validators/preflight.ts:3-21`` (C2) exactly:
- version must equal 1 (:4)
- apply mode requires reviewed: true (:6-8)
- at least one enabled table rule (:10-11)
- non-empty global column_strategy (:13-18)
"""

from __future__ import annotations

from database_anonymiser_spark.config import CONFIG_VERSION, GeneratedConfig


class PreflightError(ValueError):
    """A gate check failed — execution must not proceed."""


def preflight_validate(config: GeneratedConfig, mode: str) -> None:
    if config.version != CONFIG_VERSION:
        raise PreflightError(f"unsupported config version {config.version} (expected {CONFIG_VERSION})")
    if mode == "apply" and not config.reviewed:
        raise PreflightError("apply mode requires reviewed: true in the config")
    if not any(r.enabled for r in config.rules):
        raise PreflightError("no enabled tables in config")
    if not config.column_strategy:
        raise PreflightError("column_strategy must not be empty")
