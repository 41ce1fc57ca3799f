"""connected_components / dedup_survivors — duplicate-pair clustering."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from database_anonymiser_spark.operators.graph import (
    connected_components,
    dedup_survivors,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_chain_collapses_to_min_label(spark):
    # A~B, B~C, C~D: transitive closure must find ONE cluster even though
    # A~C / A~D were never emitted as pairs
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components_and_star(spark):
    got = _cc(spark, [(10, 11), (12, 10), (20, 21)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_isolated_nodes_absent(spark):
    got = _cc(spark, [(5, 6)])
    assert set(got) == {5, 6}


def test_long_path_converges_logarithmically(spark):
    # 64-node path: diameter 63; pointer-jumping must converge in ≤10
    # rounds (log₂ 63 ≈ 6), not 63 — the property that makes million-long
    # dup chains feasible at scale
    edges = [(i, i + 1) for i in range(64)]
    got = _cc(spark, edges, max_iter=10)
    assert set(got.values()) == {0}


def test_nonconvergence_raises(spark, monkeypatch):
    import database_anonymiser_spark.operators.graph as G

    # force the distributed loop: the local fast path (r15) always
    # converges, so the max_iter guard is a distributed-path property
    monkeypatch.setattr(G, "CC_LOCAL_EDGE_CAP", 0)
    with pytest.raises(RuntimeError, match="converge"):
        _cc(spark, [(i, i + 1) for i in range(64)], max_iter=1)


def test_survivors_keep_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    clusters = connected_components(pairs)
    kept = dedup_survivors(docs, "doc_id", clusters)
    # 2,3 collapse into 1; 6 into 5; 4 and 7 are singletons (absent from
    # clusters) and survive untouched
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [1, 4, 5, 7]


def _uf_components(edges):
    """Reference union-find (driver-side, test-only)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per node
    return {x: find(x) for x in parent}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=40,
    )
)
def test_matches_union_find(spark, edges):
    want = _uf_components(edges)
    # union-find roots are min labels only after path compression settles;
    # normalize: map every node to the min node of its root-group
    by_root = {}
    for n, r in want.items():
        by_root.setdefault(r, []).append(n)
    want_min = {n: min(ns) for r, ns in by_root.items() for n in ns}
    got = _cc(spark, edges)
    assert got == want_min


def test_local_fast_path_equals_distributed_loop(spark, monkeypatch):
    """r15: the bounded-edge LOCAL union-find must return the identical
    frame — rows, names, types, nullability — as the distributed
    min-label propagation loop, on chains, duplicate/reversed edges,
    self-loops, and string ids (UTF-8 vs code-point order)."""
    import database_anonymiser_spark.operators.graph as G

    cases = [
        ([(1, 2), (2, 3), (3, 4), (4, 1), (9, 9), (2, 1)], "id_a long, id_b long"),
        ([(7, 3), (3, 7), (100, 7)], "id_a long, id_b long"),
        ([("b", "a"), ("ä", "z"), ("A", "b")], "id_a string, id_b string"),
    ]
    for edges, schema in cases:
        df = spark.createDataFrame(edges, schema)
        local = connected_components(df)
        monkeypatch.setattr(G, "CC_LOCAL_EDGE_CAP", 0)
        dist = connected_components(df)
        monkeypatch.setattr(G, "CC_LOCAL_EDGE_CAP", 1 << 16)
        assert {tuple(r) for r in local.collect()} == {
            tuple(r) for r in dist.collect()
        }
        assert [
            (f.name, f.dataType, f.nullable) for f in local.schema.fields
        ] == [(f.name, f.dataType, f.nullable) for f in dist.schema.fields]

    # NULL endpoints must fall back to the distributed loop (which groups
    # them like any other key) rather than diverge
    dfn = spark.createDataFrame(
        [(1, 2), (None, 2)], "id_a long, id_b long"
    )
    out = connected_components(dfn)
    assert {r["id"] for r in out.collect()} >= {1, 2}


def test_best_dedup_argmax_semantics(spark):
    """best_dedup: highest score wins, score ties -> smallest id, NULL
    scores lose to any value (all-NULL group falls back to min id),
    payload columns come back with the SURVIVOR's values."""
    from database_anonymiser_spark.operators.dedup import best_dedup

    df = spark.createDataFrame(
        [
            ("g1", 1, 5.0, "a"),
            ("g1", 2, 9.0, "b"),   # winner: highest score
            ("g1", 3, 9.0, "c"),   # same score, larger id -> loses
            ("g2", 4, None, "d"),
            ("g2", 5, 0.1, "e"),   # beats NULL
            ("g3", 7, None, "f"),  # all-NULL group: min id wins
            ("g3", 6, None, "g"),
        ],
        "grp string, id long, score double, payload string",
    )
    got = {
        r["grp"]: (r["id"], r["score"], r["payload"], r["dup_count"])
        for r in best_dedup(
            df, ["grp"], "id", "score", keep_cols=("payload",)
        ).collect()
    }
    assert got["g1"] == (2, 9.0, "b", 3)
    assert got["g2"] == (5, 0.1, "e", 2)
    assert got["g3"] == (6, None, "g", 2)
    # partition invariance
    got2 = {
        r["grp"]: r["id"]
        for r in best_dedup(
            df.repartition(8), ["grp"], "id", "score", keep_cols=("payload",)
        ).collect()
    }
    assert got2 == {g: v[0] for g, v in got.items()}


def test_cap_per_group_semantics(spark):
    """cap_per_group: top-k by score per group, ties -> smallest id,
    NULLs last; groups smaller than k pass whole; k validated."""
    from database_anonymiser_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [
            ("a", 1, 5.0), ("a", 2, 9.0), ("a", 3, 9.0), ("a", 4, None),
            ("b", 5, 1.0),
        ],
        "grp string, id long, score double",
    )
    got = sorted(
        (r["grp"], r["id"])
        for r in cap_per_group(df, "grp", "score", 2, "id").collect()
    )
    assert got == [("a", 2), ("a", 3), ("b", 5)]
    import pytest as _pt

    with _pt.raises(ValueError, match="k must be"):
        cap_per_group(df, "grp", "score", 0, "id")


def test_cap_per_group_salted_parity_and_bound(spark):
    """salt_partitions=S: identical output to the single window (exact
    top-k survives the salted pre-pass), and the pre-pass provably
    bounds what reaches the final window for a pathological hot domain:
    <= k*S rows instead of the domain's full row count."""
    import random

    from database_anonymiser_spark.operators.sampling import cap_per_group

    rng = random.Random(7)
    rows = [("hot", i, float(rng.randrange(1000))) for i in range(5000)]
    rows += [("cold", 10_000 + i, float(i)) for i in range(10)]
    rows += [("tie", 20_000 + i, 1.0) for i in range(8)]  # all-tied group
    df = spark.createDataFrame(
        rows, "grp string, id long, score double"
    ).repartition(16)

    plain = sorted(
        tuple(r) for r in cap_per_group(df, "grp", "score", 5, "id").collect()
    )
    for s in (1, 4, 32):
        salted = sorted(
            tuple(r)
            for r in cap_per_group(
                df, "grp", "score", 5, "id", salt_partitions=s
            ).collect()
        )
        assert salted == plain, f"salt_partitions={s} diverged"

    # the bound: the stage-1 pre-filter alone emits <= k*S rows/group
    from pyspark.sql import functions as F  # noqa: F811
    from pyspark.sql.window import Window

    k, s = 5, 4
    salt = F.pmod(F.xxhash64(F.col("id")), F.lit(s))
    w1 = Window.partitionBy("grp", "_salt").orderBy(
        F.col("score").desc_nulls_last(), F.col("id")
    )
    stage1 = (
        df.withColumn("_salt", salt)
        .withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= k)
    )
    per_group = {
        r["grp"]: r["n"]
        for r in stage1.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert per_group["hot"] <= k * s  # 5000-row domain -> <= 20 survivors
    with _pt_raises_value_error():
        cap_per_group(df, "grp", "score", 2, "id", salt_partitions=0)


def _pt_raises_value_error():
    import pytest as _pt

    return _pt.raises(ValueError, match="salt_partitions")


def test_temperature_mixture_flattens_and_upsamples(spark):
    """α-sampling: α=1 is proportional (source shares preserved), α=0.5
    flattens (small sources gain share, large lose), α=0 targets
    uniform-per-source; scarce sources UPSAMPLE via expected-copies;
    NULL sources ride the default-rate path; totals land near target."""
    import pytest as _pt

    from database_anonymiser_spark.operators.sampling import temperature_mixture

    rows = (
        [(i, "big") for i in range(3000)]
        + [(10_000 + i, "small") for i in range(200)]
        + [(20_000 + i, None) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "id long, src string")

    def shares(alpha, target):
        out = temperature_mixture(df, "id", "src", target, alpha=alpha)
        got = {
            r["src"]: r["n"]
            for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        total = sum(got.values())
        return got, total

    got1, tot1 = shares(1.0, 1000)
    got05, tot05 = shares(0.5, 1000)
    got0, tot0 = shares(0.0, 1000)
    for tot in (tot1, tot05, tot0):
        assert abs(tot - 1000) < 120  # hash error, not binomial noise
    # α=1: proportional — big keeps ~3000/3400 of the sample
    assert got1["big"] / tot1 == _pt.approx(3000 / 3400, abs=0.05)
    # flattening is monotone in α: big's share strictly drops as α falls
    assert got1["big"] / tot1 > got05["big"] / tot05 > got0["big"] / tot0
    # α=0: near-uniform per source
    assert got0["big"] / tot0 == _pt.approx(1 / 3, abs=0.07)
    assert got0[None] > 0  # NULL source sampled via the default rate

    # scarce source under a big target: rate > 1 -> upsampling copies
    up = temperature_mixture(df, "id", "src", 10_000, alpha=0.0)
    n_small = up.where("src = 'small'").count()
    assert n_small > 2 * 200  # ~3333 expected from 200 rows
    assert up.where("src = 'small' AND copy_idx > 0").count() > 0

    # determinism: same selection under any partitioning
    a = sorted(tuple(r) for r in temperature_mixture(df, "id", "src", 500).collect())
    b = sorted(
        tuple(r)
        for r in temperature_mixture(df.repartition(13), "id", "src", 500).collect()
    )
    assert a == b

    with _pt.raises(ValueError, match="target_total"):
        temperature_mixture(df, "id", "src", 0)
    with _pt.raises(ValueError, match="alpha"):
        temperature_mixture(df, "id", "src", 10, alpha=-1.0)
