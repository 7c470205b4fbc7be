"""Property-based tests (hypothesis) for the mergeable-sketch algebra and
tokenizer parity — the north rule's associativity/idempotence requirements
tested over adversarial inputs, not just goldens."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bloomsearch_spark import bloom
from bloomsearch_spark.tokenizer import go_format_value, tokenize_value

PARAMS = bloom.BloomParams(200, 0.01)

tokens_st = st.lists(
    st.text(min_size=1, max_size=24), min_size=0, max_size=80
)


@settings(max_examples=60, deadline=None)
@given(tokens_st)
def test_no_false_negatives_property(tokens):
    bs = bloom.new_bitset(PARAMS)
    bloom.insert(bs, np.array(tokens, dtype=object), PARAMS)
    if tokens:
        assert bloom.probe(bs, np.array(tokens, dtype=object), PARAMS).all()


@settings(max_examples=40, deadline=None)
@given(tokens_st, tokens_st, tokens_st)
def test_merge_associative_commutative_idempotent(a, b, c):
    def bset(toks):
        x = bloom.new_bitset(PARAMS)
        bloom.insert(x, np.array(toks, dtype=object), PARAMS)
        return x

    A, B, C = bset(a), bset(b), bset(c)
    ab_c = bloom.merge(bloom.merge(A, B), C)
    a_bc = bloom.merge(A, bloom.merge(B, C))
    assert (ab_c == a_bc).all()
    assert (bloom.merge(A, B) == bloom.merge(B, A)).all()
    assert (bloom.merge(A, A) == A).all()
    # merged filter answers for every member's tokens (checkpoint-replay
    # safety: partials recombine without losing membership)
    allt = [t for t in a + b + c]
    if allt:
        assert bloom.probe(ab_c, np.array(allt, dtype=object), PARAMS).all()


@settings(max_examples=40, deadline=None)
@given(tokens_st)
def test_insert_order_and_duplication_invariance(tokens):
    """OR-merge idempotence at the insert level: inserting twice, in any
    order, yields the identical bitset (deterministic re-execution)."""
    import random

    x = bloom.new_bitset(PARAMS)
    bloom.insert(x, np.array(tokens, dtype=object), PARAMS)
    y = bloom.new_bitset(PARAMS)
    shuffled = list(tokens)
    random.Random(0).shuffle(shuffled)
    bloom.insert(y, np.array(shuffled + shuffled, dtype=object), PARAMS)
    assert (x == y).all()


@settings(max_examples=80, deadline=None)
@given(st.one_of(
    st.text(max_size=40),
    st.booleans(),
    st.none(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.integers(min_value=-10**15, max_value=10**15),
))
def test_tokenize_value_total_and_lowercase(v):
    """tokenize_value never raises, never emits empty or cased tokens,
    and integral floats render like Go %v (no trailing .0)."""
    toks = tokenize_value(v)
    assert all(t and t == t.lower() and not t.isspace() for t in toks)
    # Go %v switches to scientific form at decimal exponent >= 6 (shortest
    # %g); only below 1e6 is an integral float guaranteed positional with
    # no '.' (tokenizer.py documents the threshold).
    if isinstance(v, float) and v == int(v) and abs(v) < 1e6:
        assert "." not in go_format_value(v)


def test_go_format_integral_float_scientific_threshold():
    """Golden Go %v outputs around the 1e6 positional/scientific boundary."""
    assert go_format_value(123456.0) == "123456"
    assert go_format_value(999999.0) == "999999"
    assert go_format_value(1000000.0) == "1e+06"
    assert go_format_value(1000001.0) == "1.000001e+06"
    assert go_format_value(-1000001.0) == "-1.000001e+06"
    assert go_format_value(1e15) == "1e+15"
