"""Config generator: catalog scan → default config + masked samples.

Rebuilds ``src/config/config-generator.ts``:
- catalog scan (S1, :29) via ParquetCatalog
- per-table sample scan (S3, :44-46) — ``df.limit(n)``, never collect of the
  full table (100 TB posture: ≤ n rows per table ever reach the driver)
- per-column non-null sample values (:49-56), masked with the preview masker
  T7 unless unsafe_samples (:58-60)
- default rule per table: all columns listed with no explicit strategy (:64-70)
- default global column_strategy map (:11-17, :74-92).
"""

from __future__ import annotations

from dataclasses import dataclass

from database_anonymiser_spark.catalog import ParquetCatalog
from database_anonymiser_spark.config import ColumnRule, GeneratedConfig, Scope, TableRule

# ≅ defaultGlobalColumnStrategy (config-generator.ts:11-17)
DEFAULT_GLOBAL_COLUMN_STRATEGY: dict[str, str] = {
    "id": "KEEP",
    "created_at": "KEEP",
    "updated_at": "KEEP",
    "status": "KEEP",
    "type": "KEEP",
    "email": "EMAIL_FAKE",
    "phone": "HASH_SHA256",
    "mobile": "HASH_SHA256",
    "username": "HASH_SHA256",
    "address": "REDACT",
    "raw_payload": "SET_NULL",
}


def mask_sample_value(v: str) -> str:
    """Driver-side twin of T7 (``src/pi/patterns.ts:3-9``) for config previews."""
    s = str(v)
    if len(s) <= 6:
        return "***"
    return s[:2] + "***" + s[-2:]


@dataclass
class GeneratedArtifacts:
    config: GeneratedConfig
    samples: dict[str, dict[str, list[str]]]


def generate_config(
    catalog: ParquetCatalog,
    sample_limit: int = 3,
    unsafe_samples: bool = False,
    denylist: list[str] | None = None,
    keyed: bool = False,
) -> GeneratedArtifacts:
    """≅ generateConfig (config-generator.ts:22-96).

    Sampling is a ``limit(n)`` per table — the only place rows ever reach the
    driver, capped at ``sample_limit`` (reference: sampleLimit=3, main.ts:37).

    ``keyed`` (round 12, opt-in via CLI ``--keyed``): upgrade the default
    map's un-keyed HASH targets (phone/mobile/username — low-entropy
    domains where a bare hash is dictionary-reversible) to the keyed
    ``HASH_HMAC`` strategy. The KEY is never written into the config —
    apply resolves it from ``--hmacKey`` / the ``ANONYMISER_HMAC_KEY``
    environment at run time (strategies.py).
    """
    rules: list[TableRule] = []
    samples: dict[str, dict[str, list[str]]] = {}
    for t in catalog.list_tables():
        df = catalog.read(t.name)
        head = df.limit(sample_limit).collect()  # S3: bounded driver transfer
        col_samples: dict[str, list[str]] = {}
        for f in df.schema.fields:
            vals = [r[f.name] for r in head if r[f.name] is not None]  # P4 null-filter
            shown = [str(v) if unsafe_samples else mask_sample_value(v) for v in vals]
            col_samples[f.name] = shown[:sample_limit]
        samples[f"{t.schema}.{t.name}"] = col_samples
        rules.append(
            TableRule(
                table=f"{t.schema}.{t.name}",
                enabled=True,
                columns=[ColumnRule(name=f.name) for f in df.schema.fields],
            )
        )
    from datetime import datetime, timezone

    strategy_map = dict(DEFAULT_GLOBAL_COLUMN_STRATEGY)
    if keyed:
        strategy_map = {
            c: ("HASH_HMAC" if s == "HASH_SHA256" else s)
            for c, s in strategy_map.items()
        }
    config = GeneratedConfig(
        version=1,
        reviewed=False,
        scope=Scope(schema=catalog.schema_name, denylist=list(denylist or [])),
        samples={"limit": sample_limit, "unsafe": bool(unsafe_samples)},
        column_strategy=strategy_map,
        rules=rules,
        generated_at=datetime.now(timezone.utc).isoformat(),  # generatedAt parity
    )
    return GeneratedArtifacts(config=config, samples=samples)
