import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_anonymiser_spark import strategies as S
from database_anonymiser_spark.types import TypeGroup


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [Row(s="hello world", n=42, b=True, empty=None)],
        schema=T.StructType([
            T.StructField("s", T.StringType(), True),
            T.StructField("n", T.IntegerType(), True),
            T.StructField("b", T.BooleanType(), True),
            T.StructField("empty", T.StringType(), True),
        ]),
    )


def one(df, col):
    return df.select(col.alias("v")).first()["v"]


def test_redact(spark, df):
    assert one(df, S.redact(F.col("s"))) == "***"


def test_hash_is_md5_and_null_coalesces(spark, df):
    assert one(df, S.hash_md5(F.col("s"))) == hashlib.md5(b"hello world").hexdigest()
    assert one(df, S.hash_md5(F.col("empty"))) == hashlib.md5(b"").hexdigest()


def test_real_sha256(spark, df):
    assert one(df, S.hash_sha256(F.col("s"))) == hashlib.sha256(b"hello world").hexdigest()


def test_truncate_default4_and_null(spark, df):
    assert one(df, S.truncate(F.col("s"))) == "hell"
    assert one(df, S.truncate(F.col("s"), 2)) == "he"
    assert one(df, S.truncate(F.col("empty"))) == ""


def test_email_fake(spark, df):
    assert one(df, S.email_fake(F.col("s"))) == hashlib.md5(b"hello world").hexdigest() + "@example.com"


def test_set_null_preserves_type(spark, df):
    out = df.select(S.set_null(F.col("n"), T.IntegerType()).alias("n"))
    assert out.schema["n"].dataType == T.IntegerType()
    assert out.first()["n"] is None


def test_sample_preview(spark):
    rows = [Row(s="short"), Row(s="exact6"), Row(s="longer than six")]
    df = spark.range(1).sparkSession.createDataFrame(rows)
    out = [r["v"] for r in df.select(S.mask_sample_preview(F.col("s")).alias("v")).collect()]
    assert out == ["***", "***", "lo***ix"]


def test_unknown_strategy_is_noop(spark, df):
    assert one(df, S.strategy_expr("WAT", F.col("s"))) == "hello world"


@pytest.mark.parametrize(
    "strategy,group,expected",
    [
        ("KEEP", TypeGroup.NUMBER, "KEEP"),
        ("SET_NULL", TypeGroup.DATE, "SET_NULL"),
        ("REDACT", TypeGroup.STRING, "REDACT"),
        ("REDACT", TypeGroup.NUMBER, "KEEP"),
        ("TRUNCATE", TypeGroup.JSON, "KEEP"),
        ("EMAIL_FAKE", TypeGroup.BOOLEAN, "KEEP"),
        ("HASH_SHA256", TypeGroup.STRING, "HASH_SHA256"),
        ("HASH_SHA256", TypeGroup.OTHER, "HASH_SHA256"),
        ("HASH_SHA256", TypeGroup.NUMBER, "KEEP"),
        ("HASH_SHA256", TypeGroup.UUID, "KEEP"),
    ],
)
def test_downgrade_matrix(strategy, group, expected):
    eff, reason = S.normalize_strategy_for_group(strategy, group)
    assert eff == expected
    assert (reason is None) == (eff == strategy)


def test_masked_projection_counts_active_and_passthrough(spark, df):
    normalized = S.normalize_columns_for_types(
        [{"column": "s", "strategy": "REDACT"}, {"column": "n", "strategy": "KEEP"}],
        df.schema,
    )
    masked, active = S.masked_projection(df, normalized)
    assert active == 1
    row = masked.first()
    assert row["s"] == "***" and row["n"] == 42 and row["b"] is True


def test_unknown_strategy_is_inactive_passthrough(spark, df):
    """An unknown strategy (reachable via hand-built plan objects that
    bypass config validation) must pass the column through AND not count as
    an active rewrite — the reference emits no SET clause for it, so a
    table whose only strategies are unknown is skipped entirely
    (query-builder.ts:48-56)."""
    normalized = [S.NormalizedColumn(column="s", strategy="FROBNICATE")]
    masked, active = S.masked_projection(df, normalized)
    assert active == 0
    assert masked.first()["s"] == "hello world"


def test_set_null_on_non_nullable_fails(spark):
    schema = T.StructType([T.StructField("k", T.LongType(), False)])
    df = spark.createDataFrame([(1,)], schema)
    normalized = S.normalize_columns_for_types([{"column": "k", "strategy": "SET_NULL"}], schema)
    with pytest.raises(ValueError, match="non-nullable"):
        S.masked_projection(df, normalized)


def test_masking_idempotent(spark, df):
    # property: mask(mask(x)) == mask(x) for REDACT / EMAIL_FAKE domain outputs
    redacted = one(df, S.redact(F.col("s")))
    assert one(df.select(F.lit(redacted).alias("s")), S.redact(F.col("s"))) == redacted
