"""Property-based differential testing (SURVEY.md §4.2 "Property/fuzz").

Random patterns from the supported grammar x random texts; the compiled DFA
engine must agree with the oracle on every MatchType. This catches semantic
edge cases (empty matches, assertion interplay, class negation) better than
fixed cases.
"""
import numpy as np
from hypothesis import given, settings, strategies as st

from rejit_tpu import Config, Pattern, oracle

# -- pattern grammar strategy ------------------------------------------------

_ALPHABET = "abz. "          # small alphabet => dense match interactions
_CLASS_ITEMS = ["a", "b", "z", "a-c", "^a", "\\d", "\\w"]


def _atom():
    return st.one_of(
        st.sampled_from([c if c != "." else "\\." for c in _ALPHABET[:3]]),
        st.just("."),
        st.sampled_from(["[ab]", "[a-c]", "[^a]", "\\w", "\\d", "\\s"]),
    )


def _quant(p):
    return st.sampled_from(["", "*", "+", "?", "{2}", "{1,3}"]).map(
        lambda q: p + q
    )


@st.composite
def patterns(draw, depth=2):
    if depth == 0:
        a = draw(_atom())
        return draw(_quant(a))
    kind = draw(st.integers(0, 3))
    if kind == 0:
        a = draw(patterns(depth=depth - 1))
        b = draw(patterns(depth=depth - 1))
        return a + b
    if kind == 1:
        a = draw(patterns(depth=depth - 1))
        b = draw(patterns(depth=depth - 1))
        return f"(?:{a}|{b})".replace("?:", "")  # no capture syntax
    if kind == 2:
        a = draw(patterns(depth=depth - 1))
        return "(" + a + ")" + draw(st.sampled_from(["", "*", "+", "?"]))
    a = draw(_atom())
    return draw(_quant(a))


texts = st.text(alphabet=_ALPHABET + "\n", max_size=40).map(
    lambda s: s.encode()
)


@settings(max_examples=60, deadline=None)
@given(pat=patterns(), text=texts)
def test_dfa_engine_matches_oracle(pat, text):
    try:
        p = Pattern(pat, Config(engine="dfa", block_size=8))
    except Exception:
        return  # pattern rejected by compiler limits: fine
    orc = oracle.OraclePattern(pat)
    assert p.match_all(text) == orc.match_all(text), (pat, text)
    assert p.match_full(text) == orc.match_full(text), (pat, text)


@settings(max_examples=30, deadline=None)
@given(
    lits=st.lists(
        st.text(alphabet="abz", min_size=1, max_size=4), min_size=1, max_size=3
    ),
    text=texts,
)
def test_literal_engine_matches_oracle(lits, text):
    pat = "|".join(lits)
    p = Pattern(pat)
    assert p.engine == "literal"
    orc = oracle.OraclePattern(pat)
    assert p.match_all(text) == orc.match_all(text), (pat, text)
    assert p.match_all_count(text) == orc.match_all_count(text), (pat, text)
