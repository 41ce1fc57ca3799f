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


# ---------------------------------------------------------------------------
# Privacy-audit operators (round 10, operators/privacy.py): the question
# the reference never answers — is the masked output safe to release?
# ---------------------------------------------------------------------------


def test_k_anonymity_audit_and_suppression(spark):
    import pytest as _pt

    from database_anonymiser_spark.operators import privacy as P

    rows = (
        [(i, "z1", 30) for i in range(5)]       # class of 5
        + [(10 + i, "z1", 40) for i in range(2)]  # class of 2 (violates k=3)
        + [(20, "z2", None), (21, "z2", None)]    # NULL quasi -> its own class
        + [(30, None, 30)]                        # NULL zip class of 1
    )
    df = spark.createDataFrame(rows, "id long, zip string, age int")
    classes = {
        (r["zip"], r["age"]): (r["class_n"], r["violates"])
        for r in P.k_anonymity(df, ["zip", "age"], 3).collect()
    }
    assert classes[("z1", 30)] == (5, False)
    assert classes[("z1", 40)] == (2, True)
    assert classes[("z2", None)] == (2, True)
    assert classes[(None, 30)] == (1, True)

    s = P.k_anonymity_summary(df, ["zip", "age"], 3)
    assert s == {
        "n_classes": 4, "n_violating_classes": 3, "rows_at_risk": 5,
        "k_actual": 1, "n_rows": 10, "k_required": 3, "satisfied": False,
    }

    # suppression drops exactly the violating classes' rows (incl. the
    # NULL-quasi ones — null-safe class join), and the survivor set is
    # k-anonymous by construction
    kept = P.suppress_to_k(df, ["zip", "age"], 3)
    assert sorted(r["id"] for r in kept.collect()) == [0, 1, 2, 3, 4]
    assert P.k_anonymity_summary(kept, ["zip", "age"], 3)["satisfied"]

    with _pt.raises(ValueError, match="k must"):
        P.k_anonymity(df, ["zip"], 0)
    with _pt.raises(ValueError, match="at least one"):
        P.k_anonymity(df, [], 3)


def test_l_diversity_homogeneity_attack(spark):
    import pytest as _pt

    from database_anonymiser_spark.operators import privacy as P

    rows = (
        [(i, "z1", "flu") for i in range(4)]  # k=4 but EVERYONE has flu
        + [(10, "z2", "flu"), (11, "z2", "cold"), (12, "z2", None)]
    )
    df = spark.createDataFrame(rows, "id long, zip string, dx string")
    got = {
        r["zip"]: (r["class_n"], r["distinct_sensitive"], r["violates"])
        for r in P.l_diversity(df, ["zip"], "dx", 2).collect()
    }
    # the homogeneity attack: big class, one value -> violation
    assert got["z1"] == (4, 1, True)
    # NULL sensitive does not count toward diversity
    assert got["z2"] == (3, 2, False)
    with _pt.raises(ValueError, match="quasi-identifier"):
        P.l_diversity(df, ["dx"], "dx", 2)


def test_generalize_num_bands(spark):
    import pytest as _pt

    from database_anonymiser_spark.operators import privacy as P

    df = spark.createDataFrame(
        [(1, 1234.5), (2, -0.01), (3, None), (4, 500.0)], "id long, v double"
    )
    got = {
        r["id"]: r["band"]
        for r in df.select("id", P.generalize_num("v", 500).alias("band")).collect()
    }
    assert got == {1: 1000.0, 2: -500.0, 3: None, 4: 500.0}
    with _pt.raises(ValueError, match="width"):
        P.generalize_num("v", 0)
