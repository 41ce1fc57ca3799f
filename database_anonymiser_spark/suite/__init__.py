"""The declared query suite — the engine's oracle-checked correctness surface.

Every operator claimed in SURVEY.md §2 is declared here as a QuerySpec:
a named PySpark query over the fixture tables plus (where SQL-expressible)
a DuckDB oracle that must row-count + schema + value-hash match at sf0.01.
"""

from __future__ import annotations

from database_anonymiser_spark.suite.base import REGISTRY, QuerySpec, register  # noqa: F401

# importing the modules populates REGISTRY
from database_anonymiser_spark.suite import (  # noqa: F401,E402
    dedup,
    functions_pack,
    masking,
    multimodal,
    relational,
    relational_ext,
    relational_more,
    similarity,
    streaming_batch,
    text,
    versioned_entry,
)


def all_queries():
    return dict(REGISTRY)
