"""Corpus-scale BPE training/application (operators/tokenizer.py):
pinned merges on the classic toy corpus, partition invariance, early
stop, train/apply consistency, and compression on the real fixture."""

import pytest
from pyspark.sql import functions as F

from database_anonymiser_spark.operators.tokenizer import (
    apply_bpe,
    train_bpe,
    word_frequencies,
)


@pytest.fixture()
def toy(spark):
    # Sennrich et al.'s shape: low*5, lower*2, newest*3, wider*1
    return spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower"),
            (3, "newest newest newest"),
            (4, "wider"),
        ],
        "doc_id long, text string",
    )


def test_toy_corpus_merges_pinned(spark, toy):
    """First merges on the classic corpus: 'lo' wins (7 = low5 + lower2,
    lexicographic tie-break vs 'ow' at 7... actually l+o and o+w both
    occur 7 times — (l,o) < (o,w) so (l,o) merges first), then low,
    then the -er/-est suffixes."""
    merges = train_bpe(toy, "text", 8)
    assert merges == [
        ("l", "o"),
        ("lo", "w"),
        ("e", "r"),
        ("e", "s"),
        ("e", "w"),
        ("es", "t"),
        ("ew", "est"),
        ("n", "ewest"),
    ]


def test_training_partition_invariant(spark, toy):
    assert train_bpe(toy, "text", 6) == train_bpe(
        toy.repartition(7), "text", 6
    )


def test_early_stop_on_min_pair_count(spark, toy):
    # every pair in 'wider' alone occurs once; with min_pair_count high
    # enough training stops before n_merges rounds
    merges = train_bpe(toy, "text", 50, min_pair_count=2)
    assert 0 < len(merges) < 50
    # all returned merges were frequent enough: re-counting the first
    # round's winner is >= 2 by construction; the list is deduplicated
    assert len(set(merges)) == len(merges)
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(toy, "text", -1)


def test_train_apply_consistency_on_vocab(spark, toy):
    """Tokenizing the training words with the learned table reproduces
    the trainer's final symbol state — rank-order application IS the
    training rewrite order."""
    merges, vocab = train_bpe(toy, "text", 8, return_vocab=True)
    words = vocab.selectExpr("word AS wid", "word AS text")
    got = {
        r["wid"]: list(r["bpe_tokens"])
        for r in apply_bpe(words, "wid", "text", merges, emit_tokens=True).collect()
    }
    for r in vocab.collect():
        assert got[r["word"]] == list(r["syms"])


def test_apply_edges_null_empty_and_roundtrip(spark, toy):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "Hello, World 42!")],
        "doc_id long, text string",
    )
    merges = train_bpe(toy, "text", 4)
    out = {
        r["doc_id"]: (r["n_bpe_tokens"], list(r["bpe_tokens"]))
        for r in apply_bpe(df, "doc_id", "text", merges, emit_tokens=True).collect()
    }
    assert out[1] == (0, []) and out[2] == (0, [])
    n, toks = out[3]
    assert n == len(toks) > 0
    # round-trip: concatenating tokens restores the lowercased pieces
    assert "".join(toks) == "hello,world42!"
    # zero merges -> pure characters of the pieces
    chars = apply_bpe(df, "doc_id", "text", [], emit_tokens=True).collect()
    for r in chars:
        assert all(len(t) == 1 for t in r["bpe_tokens"])


def test_max_word_len_excluded_from_training_not_apply(spark):
    mega = "x" * 500
    docs = spark.createDataFrame(
        [(1, f"{mega} {mega}"), (2, "ab ab ab")], "doc_id long, text string"
    )
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs, "text").collect()}
    assert mega not in wf and wf["ab"] == 3
    merges = train_bpe(docs, "text", 2)
    assert ("a", "b") in merges
    # the megaword still tokenizes at apply time (chars + any merges)
    n = (
        apply_bpe(docs, "doc_id", "text", merges)
        .where(F.col("doc_id") == 1)
        .first()["n_bpe_tokens"]
    )
    assert n == 1000  # no 'xx' merge learned -> 2 x 500 chars


def test_unicode_whitespace_train_apply_parity(spark):
    """U+00A0 (no-break space) must be treated identically by training
    (JVM regexp_extract_all, where \\s is ASCII) and application
    (Python re compiled with re.ASCII): both count it as a punctuation
    piece. Under Python's default Unicode \\s it would be dropped at
    apply time only, silently breaking n_bpe_pieces parity."""
    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab ab")], "doc_id long, text string"
    )
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs, "text").collect()}
    assert wf[" "] == 1 and wf["ab"] == 4
    out = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in apply_bpe(docs, "doc_id", "text", [], emit_tokens=True).collect()
    }
    # doc 1 keeps the NBSP as its own piece; doc 2's ASCII space is dropped
    assert out[1] == ["a", "b", " ", "a", "b"]
    assert out[2] == ["a", "b", "a", "b"]
    # and the applied piece stream length matches training's piece count
    total_train = sum(len(w) * f for w, f in wf.items())
    total_apply = sum(len(t) for toks in out.values() for t in toks)
    assert total_train == total_apply


def test_memo_cache_matches_uncached_tokenization(spark, toy):
    """The per-batch memo over distinct pieces is a pure cache: repeated
    pieces in one batch tokenize identically to their first occurrence,
    and counts equal the length of the emitted token lists."""
    merges = train_bpe(toy, "text", 6)
    df = spark.createDataFrame(
        [(i, "lower newest lower wider lower" * 3) for i in range(20)],
        "doc_id long, text string",
    ).coalesce(1)  # one batch -> the memo is exercised across rows
    toks = apply_bpe(df, "doc_id", "text", merges, emit_tokens=True).collect()
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in apply_bpe(df, "doc_id", "text", merges).collect()
    }
    ref = None
    for r in toks:
        assert counts[r["doc_id"]] == len(r["bpe_tokens"])
        if ref is None:
            ref = list(r["bpe_tokens"])
        assert list(r["bpe_tokens"]) == ref


def test_fixture_compression_improves_with_merges(spark, sf_dir):
    from database_anonymiser_spark.suite.base import load

    docs = load(spark, sf_dir, "documents").limit(200)
    m10 = train_bpe(docs, "text", 10)
    m40 = train_bpe(docs, "text", 40)
    assert m40[:10] == m10  # merge tables are prefixes of each other
    tot = lambda ms: (
        apply_bpe(docs, "doc_id", "text", ms)
        .agg(F.sum("n_bpe_tokens"))
        .first()[0]
    )
    t0, t10, t40 = tot([]), tot(m10), tot(m40)
    assert t0 > t10 > t40  # every merge strictly reduces the token count


def test_tokenizer_save_load_roundtrip_and_generations(spark, tmp_path):
    """Round 11: a trained BPE is a governed artifact — save → load →
    apply must equal the in-memory apply; a re-trained save is a new
    GENERATION and a version-pinned load serves the old vocab."""
    from database_anonymiser_spark.operators.tokenizer import (
        apply_bpe,
        apply_saved_bpe,
        load_tokenizer,
        save_tokenizer,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the bat and the cat chat"),
         (3, "mats and bats and cats")],
        "id long, text string",
    )
    root = str(tmp_path / "tok")
    m1 = train_bpe(docs, "text", 12)
    v1 = save_tokenizer(spark, root, m1, lowercase=True, meta={"gen": 1})
    got, cfg = load_tokenizer(spark, root)
    assert got == m1
    assert cfg["lowercase"] is True and cfg["n_merges"] == len(m1)
    assert cfg["gen"] == 1

    mem = {
        r.id: r.bpe_tokens
        for r in apply_bpe(docs, "id", "text", m1, emit_tokens=True).collect()
    }
    saved = {
        r.id: r.bpe_tokens
        for r in apply_saved_bpe(
            spark, docs, "id", "text", root, emit_tokens=True
        ).collect()
    }
    assert saved == mem  # save -> load -> apply == in-memory apply

    # generation 2: a different corpus trains a different table; the
    # full-sync save replaces the rows in ONE commit
    docs2 = spark.createDataFrame(
        [(1, "zig zag zug"), (2, "zag zig zog zag")], "id long, text string"
    )
    m2 = train_bpe(docs2, "text", 6)
    assert m2 != m1
    v2 = save_tokenizer(spark, root, m2, meta={"gen": 2})
    assert v2 > v1
    now, cfg2 = load_tokenizer(spark, root)
    assert now == m2 and cfg2["gen"] == 2

    # version-pinned load serves the OLD vocab (time travel)
    old, cfg1 = load_tokenizer(spark, root, version=v1)
    assert old == m1 and cfg1["gen"] == 1
    pinned = {
        r.id: r.bpe_tokens
        for r in apply_saved_bpe(
            spark, docs, "id", "text", root, version=v1, emit_tokens=True
        ).collect()
    }
    assert pinned == mem

    # lowercase travels with the artifact
    v3 = save_tokenizer(spark, str(tmp_path / "cs"), m1, lowercase=False)
    _m, c = load_tokenizer(spark, str(tmp_path / "cs"), version=v3)
    assert c["lowercase"] is False

    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        load_tokenizer(spark, str(tmp_path / "nope"))


def test_local_fast_path_equals_distributed_loop(spark, toy, monkeypatch):
    """r15: the bounded-vocab LOCAL merge loop must be bit-identical to
    the distributed loop — merges AND final vocab state — including on
    tie-heavy and multi-byte input (UTF-8 byte order vs code points)."""
    import database_anonymiser_spark.operators.tokenizer as tok

    tricky = toy.unionByName(
        spark.createDataFrame(
            [
                (5, "ärger ärger Ärger ääöö ääöö"),
                (6, "aa ab aa ab ba"),  # pair-count ties everywhere
                (7, "日本語 日本語 本語日"),
            ],
            "doc_id long, text string",
        )
    )
    local_m, local_v = tok.train_bpe(tricky, "text", 12, return_vocab=True)
    # force the distributed loop by shrinking the cap to zero
    monkeypatch.setattr(tok, "LOCAL_TRAIN_VOCAB_CAP", 0)
    dist_m, dist_v = tok.train_bpe(tricky, "text", 12, return_vocab=True)
    assert local_m == dist_m
    as_set = lambda df: {  # noqa: E731
        (r["word"], r["freq"], tuple(r["syms"])) for r in df.collect()
    }
    assert as_set(local_v) == as_set(dist_v)
    # same names and types (nullability legitimately differs: the
    # distributed freq comes from count(), which is non-nullable)
    assert [(f.name, f.dataType) for f in local_v.schema.fields] == [
        (f.name, f.dataType) for f in dist_v.schema.fields
    ]


def test_local_char_split_matches_java_dot_semantics(spark):
    """The local char split must reproduce F.split(word, '(?!^)(?=.)')
    exactly, including Java-regex line-terminator gluing."""
    from database_anonymiser_spark.operators.tokenizer import _char_split

    words = ["abc", "a\nb", "\r\nab", "x y", "é日b", "a", "\n"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["s"])
        for r in df.select(
            "word", F.split(F.col("word"), "(?!^)(?=.)").alias("s")
        ).collect()
    }
    for w in words:
        assert _char_split(w) == got[w], repr(w)
