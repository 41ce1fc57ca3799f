"""Bloom-filter semi-join pruning — the broadcast runtime-filter pattern.

At 100 TB the classic problem: a fact table must be reduced by a key set
that is far smaller than the fact side but too large to broadcast as exact
keys (tens of millions of keys × wide key values). Engines solve it with a
BLOOM runtime filter: the build side compresses to an m-bit bitmap that
broadcasts in KBs, the probe side evaluates membership MAP-SIDE (zero
shuffle of the fact table), and the residual false positives are removed
by the real join afterwards — Spark itself injects this shape as
``InjectRuntimeFilter`` (bloomFilter aggregate + ``might_contain``), but
only as an internal optimization it controls. This module gives the engine
an EXPLICIT, deterministic rendering of the same operator:

- hash family (portable, default): ONE md5 per key → first 60 bits → the
  k positions by Kirsch-Mitzenmacher double hashing
  (pos_i = (h1 + i·h2) mod m with h1 = low 30 bits, h2 = high 30 bits
  forced odd — proven to preserve the Bloom FPR law with two hash
  functions, Kirsch & Mitzenmacher 2006, public knowledge). One md5 + one
  base conversion per ROW, then pure long arithmetic for every extra
  hash — k-independent per-row cost (the round-5 fix: k separate
  md5+conv chains made the probe ~5× slower than the scan itself), and
  still reproducible in any engine with md5 + base conversion, which is
  what makes the whole filter value-hash checkable cross-engine, false
  positives included;
- hash family 'xxhash64' (fast path): k seeded xxhash64 calls — pure JVM
  long hashing. RECORDED evidence (round 6): bench.py times both families
  on the identical query (``join_bloom`` md5 vs ``join_bloom_xxhash64``;
  3.36s vs 1.42s end-to-end at sf0.1, where the shared exact-twin join and
  aggregation floor the total — the probe expression itself is the ~0.3s/
  md5 vs ~free/xxhash64 gap measured in the round-5 expression-cost
  notes). NOT cross-engine reproducible, so the declared oracle entry
  stays on md5; at 100 TB production probes, pick this one (no-false-
  negative property pinned for both families in tests);
- build: per-key positions → DISTINCT → pack into ⌈m/63⌉ BIGINT words with
  a bit_or aggregate (63 bits per word keeps every word positive — bit
  arithmetic needs no sign handling on either engine). The word list
  (≤ ⌈m/63⌉ rows, ~1041 for the m=2^16 default — BOUNDED by construction,
  independent of data size) is the one driver collect, exactly the
  bounded-collect class of the IVF codebook: the bitmap IS the broadcast
  artifact;
- probe: k pure-expression membership tests against the bitmap LITERAL —
  word lookup + power-of-two mask (bitwiseAND against a 63-entry constant
  array; shift amounts can't be column expressions in Spark, masks can),
  whole-stage codegen, no join, no shuffle.

No false negatives ever (property-tested); the false-positive rate follows
the standard (1 - e^{-kn/m})^k bound (asserted with slack in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bitmap size (bits) and hash count — 2^16 bits = 8 KB bitmap,
#: k=4: FPR ≈ 6e-5 at 1.5k build keys, ≈ 2.4% at 16k keys. Size m to the
#: expected build-side cardinality at the call site (m ≈ 10·n for ~1% FPR).
M_BITS = 1 << 16
K_HASHES = 4


def bloom_positions(
    key: Column,
    m_bits: int = M_BITS,
    k_hashes: int = K_HASHES,
    family: str = "md5",
) -> list[Column]:
    """The k bit positions of ``key``.

    'md5' (portable): v = first 60 bits of md5("bloom:" || key), then
    Kirsch-Mitzenmacher pos_i = (h1 + i·h2) % m with h1 = v mod 2^30,
    h2 = (v >> 30)·2 + 1 (odd). One md5 + one conv per row; the k-1 extra
    positions are long arithmetic only.

    'xxhash64' (fast): pos_i = pmod(xxhash64(i, key), m) — seeded JVM
    hashing, no strings; use when cross-engine reproducibility isn't
    needed.
    """
    if family == "xxhash64":
        return [
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)).cast("long")
            for i in range(k_hashes)
        ]
    if family != "md5":
        raise ValueError("family must be 'md5' or 'xxhash64'")
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("bloom:"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    h1 = v % F.lit(1 << 30)
    h2 = F.shiftright(v, 30) * F.lit(2) + F.lit(1)
    return [(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k_hashes)]


#: bits per bitmap word — 63 keeps 2^bit < 2^63, so every mask and every
#: OR-ed word stays positive in a signed BIGINT on both engines
_WORD_BITS = 63

#: constant power-of-two masks 2^0..2^62 (a 63-entry array literal)
_POW2 = [1 << b for b in range(_WORD_BITS)]


def bloom_build(
    build: DataFrame,
    build_key: str,
    m_bits: int = M_BITS,
    k_hashes: int = K_HASHES,
    family: str = "md5",
) -> list[int]:
    """Build the bitmap as a list of ⌈m/63⌉ BIGINT words.

    Distributed: explode each key's k positions, pack bits per 63-bit word
    with a bit_or aggregate, and collect the ≤ ⌈m/63⌉ word rows — the
    single bounded driver materialization, sized by the FILTER (m), not by
    the data. No DISTINCT pass: bit_or is idempotent, so duplicate
    positions cost nothing, and the groupBy's partial (map-side)
    aggregation already bounds what reaches the one shuffle to ≤ ⌈m/63⌉
    word rows per task — one shuffle total where the round-5 build paid
    two (measured ~0.7s → ~0.5s at sf0.1; the win grows with build-side
    cardinality, where the DISTINCT's full shuffle of up to m rows per
    partition was the larger term). NULL build keys are ignored
    (SQL semi-join semantics: NULL matches nothing)."""
    pow2 = F.lit(_POW2)
    pos = build.where(F.col(build_key).isNotNull()).select(
        F.explode(
            F.array(*bloom_positions(F.col(build_key), m_bits, k_hashes, family))
        ).alias("pos")
    )
    words = (
        pos.groupBy((F.col("pos") / _WORD_BITS).cast("long").alias("w"))
        .agg(
            F.bit_or(
                F.element_at(pow2, (F.col("pos") % _WORD_BITS).cast("int") + F.lit(1))
            ).alias("bits")
        )
        .collect()
    )
    arr = [0] * (m_bits // _WORD_BITS + 1)
    for r in words:
        arr[r["w"]] = r["bits"]
    return arr


def bloom_might_contain(
    bitmap: list[int],
    key: Column,
    m_bits: int = M_BITS,
    k_hashes: int = K_HASHES,
    family: str = "md5",
) -> Column:
    """Map-side membership predicate: all k bits set in the bitmap literal.

    The bitmap rides the plan as an array<bigint> literal (~8 KB at the
    default m) — the same transport Spark's own bloom runtime filter uses
    (a broadcast scalar); a flat array<boolean> rendering probes ~15%
    faster but costs tens of seconds of py4j list conversion per CALL at
    m=2^16, so the packed words stay the transport. NULL probe keys test
    false (semi-join semantics).

    Probe-cost note (round 5, measured at sf0.1): Catalyst re-evaluates
    common subtrees across filter conjuncts and inlines projections into
    filters, so writing the k positions as separate column expressions
    evaluates the md5+conv chain up to 2k times per row. The md5 family
    therefore binds v ONCE as a single-element array and derives all k
    positions inside higher-order functions (transform + forall) — lambda
    binding is the one expression-level sharing construct the optimizer
    cannot unshare. 4.7s → 2.0s on a 600k-row probe; the xxhash64 family
    needs no such care (seeded JVM hashes are ~free) and stays inline."""
    words = F.lit(bitmap)
    pow2 = F.lit(_POW2)

    def _bit_set(p: Column) -> Column:
        word = F.element_at(words, (p / _WORD_BITS).cast("int") + F.lit(1))
        mask = F.element_at(pow2, (p % _WORD_BITS).cast("int") + F.lit(1))
        return word.bitwiseAND(mask) != 0

    if family == "xxhash64":
        cond = key.isNotNull()
        for p in bloom_positions(key, m_bits, k_hashes, family):
            cond = cond & _bit_set(p)
        return cond
    if family != "md5":
        raise ValueError("family must be 'md5' or 'xxhash64'")
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("bloom:"), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    positions = F.flatten(
        F.transform(
            F.array(v),  # binds the md5 chain to vv: evaluated exactly once
            lambda vv: F.transform(
                F.sequence(F.lit(0), F.lit(k_hashes - 1)),
                lambda i: (
                    vv % F.lit(1 << 30)
                    + i.cast("long") * (F.shiftright(vv, 30) * F.lit(2) + F.lit(1))
                )
                % F.lit(m_bits),
            ),
        )
    )
    return key.isNotNull() & F.forall(positions, _bit_set)


def bloom_semi_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    m_bits: int = M_BITS,
    k_hashes: int = K_HASHES,
    family: str = "md5",
) -> DataFrame:
    """Probe rows whose key MIGHT be in the build key set — a superset of
    the exact left-semi join (never drops a true match), produced without
    shuffling the probe side. Follow with the exact join when exactness is
    required; at scale the bloom pass removes the overwhelming majority of
    non-matching rows before that join's exchange."""
    bitmap = bloom_build(build, build_key, m_bits, k_hashes, family)
    return probe.where(
        bloom_might_contain(bitmap, F.col(probe_key), m_bits, k_hashes, family)
    )
