from pyspark.sql import types as T

from database_anonymiser_spark.types import TypeGroup, group_for_field, map_spark_to_group


def test_group_table():
    assert map_spark_to_group(T.StringType()) == TypeGroup.STRING
    for dt in (T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
               T.FloatType(), T.DoubleType(), T.DecimalType(18, 2)):
        assert map_spark_to_group(dt) == TypeGroup.NUMBER
    assert map_spark_to_group(T.BooleanType()) == TypeGroup.BOOLEAN
    for dt in (T.DateType(), T.TimestampType(), T.TimestampNTZType()):
        assert map_spark_to_group(dt) == TypeGroup.DATE
    for dt in (T.BinaryType(), T.ArrayType(T.IntegerType()),
               T.MapType(T.StringType(), T.StringType()),
               T.StructType([T.StructField("x", T.IntegerType())])):
        assert map_spark_to_group(dt) == TypeGroup.OTHER


def test_semantic_hint_wins():
    assert map_spark_to_group(T.StringType(), "json") == TypeGroup.JSON
    assert map_spark_to_group(T.StringType(), "jsonb") == TypeGroup.JSON
    assert map_spark_to_group(T.StringType(), "uuid") == TypeGroup.UUID
    assert map_spark_to_group(T.StringType(), "citext") == TypeGroup.STRING


def test_group_for_field_metadata():
    f = T.StructField("props", T.StringType(), True, metadata={"semantic": "json"})
    assert group_for_field(f) == TypeGroup.JSON
