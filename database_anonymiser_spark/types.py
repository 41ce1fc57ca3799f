"""Seven-group type system over Spark DataTypes.

Rebuilds the reference's type-group layer (``src/schema/type-mapper.ts:3-62``):
the engine reasons about exactly seven groups —
``STRING | NUMBER | BOOLEAN | DATE | JSON | UUID | OTHER`` — and the only
consumer is strategy-compatibility checking (see ``strategies.py``).

Spark has no native JSON or UUID column types (both arrive as strings), so the
mapper accepts an optional *semantic* hint carried in ``StructField.metadata``
(key ``"semantic"``, values ``"json"`` / ``"uuid"``), mirroring how the
reference prefers ``udt_name`` over ``data_type``
(``src/schema/type-mapper.ts:18``).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T

SEMANTIC_METADATA_KEY = "semantic"


class TypeGroup(str, Enum):
    STRING = "STRING"
    NUMBER = "NUMBER"
    BOOLEAN = "BOOLEAN"
    DATE = "DATE"
    JSON = "JSON"
    UUID = "UUID"
    OTHER = "OTHER"


_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)

_DATE_TYPES = (
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


def map_spark_to_group(dt: T.DataType, semantic: str | None = None) -> TypeGroup:
    """Map a Spark DataType (+ optional semantic hint) to one of the 7 groups.

    Rule table mirrors ``mapPgToGroup`` (``src/schema/type-mapper.ts:12-62``):
    semantic hint wins (like ``udt_name`` preference), then STRING / NUMBER /
    BOOLEAN / DATE, everything else lands in OTHER (arrays, maps, structs,
    binary — exactly as Postgres arrays/enums/bytea do in the reference).
    """
    if semantic:
        s = semantic.strip().lower()
        if s in ("json", "jsonb"):
            return TypeGroup.JSON
        if s == "uuid":
            return TypeGroup.UUID
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
        return TypeGroup.STRING
    if isinstance(dt, _NUMERIC_TYPES):
        return TypeGroup.NUMBER
    if isinstance(dt, T.BooleanType):
        return TypeGroup.BOOLEAN
    if isinstance(dt, _DATE_TYPES):
        return TypeGroup.DATE
    return TypeGroup.OTHER


def group_for_field(field: T.StructField) -> TypeGroup:
    """Group for a StructField, honouring the ``semantic`` metadata hint."""
    semantic = None
    try:
        semantic = (field.metadata or {}).get(SEMANTIC_METADATA_KEY)
    except Exception:
        semantic = None
    return map_spark_to_group(field.dataType, semantic)


def schema_groups(schema: T.StructType) -> dict[str, TypeGroup]:
    """Column-name → TypeGroup for a whole schema (one catalog read, reused)."""
    return {f.name: group_for_field(f) for f in schema.fields}
