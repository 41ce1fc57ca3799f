"""Property tests for the SQL statement front's scanner primitives
(round 13): the quote/paren mask, the top-level splitter, the comment
stripper, and derive_prune's structural invariants. These are the
load-bearing parsing pieces — a mask bug would mis-split a statement
whose EXPRESSIONS contain commas/keywords inside strings, the silent
class of bug the e2e tests can't enumerate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from database_anonymiser_spark.sql_dml import (
    _mask,
    _split_top,
    _strip_line_comments,
    derive_prune,
)

# text that exercises the scanner: quotes, parens, commas, dashes,
# keywords, escapes
_sql_chars = st.text(
    alphabet="ab ,()'\"`-=<>%_\nANDORWHEREIN0123456789",
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(_sql_chars)
def test_mask_shape_and_depth(s):
    m = _mask(s)
    assert len(m) == len(s)
    for depth, _code in m:
        assert depth >= 0


@settings(max_examples=300, deadline=None)
@given(_sql_chars)
def test_split_top_round_trips(s):
    # joining the parts back with the separator reconstructs the input
    assert ",".join(_split_top(s, ",")) == s
    assert ";".join(_split_top(s, ";")) == s


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abc -x,()", max_size=30))
def test_quoted_payload_is_never_split_or_stripped(payload):
    quoted = "'" + payload.replace("'", "''") + "'"
    s = f"a = {quoted}, b = 2"
    parts = _split_top(s, ",")
    # the quoted literal stays whole inside the first part even when the
    # payload contains commas
    assert parts[0] == f"a = {quoted}"
    # -- inside a string literal is not a comment
    assert _strip_line_comments(s) == s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc x=1", max_size=20),
       st.text(alphabet="abc x=1,'", max_size=20))
def test_line_comments_stripped_outside_strings(code, comment):
    code = code.replace("--", "ab").replace("'", "a")
    s = f"{code}-- {comment}\nrest"
    out = _strip_line_comments(s)
    assert out == f"{code}\nrest"


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["k", "v", "p"]),
            st.sampled_from(["=", "<", "<=", ">", ">="]),
            st.integers(min_value=-99, max_value=99),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_derive_prune_structural_invariants(conjuncts):
    pred = " AND ".join(f"{c} {op} {v}" for c, op, v in conjuncts)
    prune = derive_prune(pred)
    mentioned = {c for c, _o, _v in conjuncts}
    assert set(prune) <= mentioned
    for col, b in prune.items():
        assert isinstance(b, tuple)
        lo, hi = b
        # an infeasible conjunction may narrow past empty (lo > hi) —
        # that is still a RELAXATION-consistent prune (matches nothing,
        # and the predicate matches nothing either); both-None never
        # appears (a no-information column is simply absent)
        assert lo is not None or hi is not None
        # every bound traces back to a literal the predicate mentioned
        vals = {v for c, _o, v in conjuncts if c == col}
        assert (lo is None or lo in vals) and (hi is None or hi in vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-5, 5), min_size=1, max_size=6))
def test_derive_prune_equality_chain_is_intersection(vals):
    pred = " AND ".join(f"k = {v}" for v in vals)
    prune = derive_prune(pred)
    assert prune == {"k": (max(vals), min(vals))}
