"""M1 differential tests: DFA tables + scan algebra vs the oracle.

Strategy (SURVEY.md §4.2): for each (pattern battery x text battery), the
oracle's per-position longest-end must equal the table-driven L array from
BOTH the naive executor and the blocked suffix-scan executor (which uses the
exact algebra the TPU engine runs).
"""
import numpy as np
import pytest

from rejit_tpu import oracle
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns, determinize, minimize
from rejit_tpu.compile.nfa import build_nfa
from rejit_tpu.engine import reference, select

PATTERNS = [
    rb"foo",
    rb"a",
    rb"[a-z]+",
    rb"foo|bar|baz",
    rb"\d+",
    rb"\w+ing\b",
    rb"\bcat\b",
    rb"a*",
    rb"(ab)+",
    rb"a.c",
    rb"^foo",
    rb"bar$",
    rb"^.*$",
    rb"x{2,3}",
    rb"[^a-z]+",
    rb"(foo|ba[rz])+",
    rb"a|ab|abc",
    rb"\s*\w+\s*",
]

TEXTS = [
    b"",
    b"a",
    b"foo",
    b"xfooy foo barbaz bar\nbaz foofoo",
    b"aaaaaa",
    b"abcabcabc",
    b"singing and winging, kingly things\n",
    b"cat catalog concat cat",
    b"1 22 333 4444 x5x",
    b"line one\nline two\nline three\n",
    b"xyxyxy ab abab xab",
    b"   spaces   and\ttabs ",
    bytes(range(0, 128)),
]


def _ids(items):
    return [repr(p)[:24] for p in items]


@pytest.mark.parametrize("pat", PATTERNS, ids=_ids(PATTERNS))
def test_l_array_matches_oracle(pat):
    t = compile_patterns([parser.parse(pat)])
    orc = oracle.OraclePattern(pat)
    for text in TEXTS:
        arr = np.frombuffer(text, dtype=np.uint8)
        L, I = reference.l_array_naive(t, arr)
        expected = [orc.longest_end(text, s)[0] for s in range(len(text) + 1)]
        assert L.tolist() == expected, f"text={text!r}"
        Ls, Is = reference.l_array_scan(t, arr, block=5)
        assert Ls.tolist() == expected, f"scan text={text!r}"
        np.testing.assert_array_equal(I, Is)


@pytest.mark.parametrize("pat", PATTERNS, ids=_ids(PATTERNS))
def test_match_apis_match_oracle(pat):
    t = compile_patterns([parser.parse(pat)])
    orc = oracle.OraclePattern(pat)
    for text in TEXTS:
        arr = np.frombuffer(text, dtype=np.uint8)
        L, I = reference.l_array_scan(t, arr, block=7)
        spans = [(s, e) for s, e, _ in select.match_all(L, I)]
        assert spans == orc.match_all(text), f"text={text!r}"
        first = select.match_first(L, I)
        assert (first[:2] if first else None) == orc.match_first(text)
        assert select.match_anywhere(L) == orc.match_anywhere(text)
        assert select.match_full(L) == orc.match_full(text)


def test_minimization_preserves_semantics():
    for pat in PATTERNS:
        nfa = build_nfa([parser.parse(pat)])
        raw = determinize(nfa)
        mini = minimize(raw)
        assert mini.n_states <= raw.n_states
        for text in TEXTS[:8]:
            arr = np.frombuffer(text, dtype=np.uint8)
            L1, _ = reference.l_array_naive(raw, arr)
            L2, _ = reference.l_array_naive(mini, arr)
            np.testing.assert_array_equal(L1, L2)


def test_byte_classes_cover_all_bytes():
    t = compile_patterns([parser.parse(rb"[a-m]x|\d")])
    assert t.class_of.shape == (256,)
    assert t.class_of.max() == t.n_classes - 1
    # Full 256-byte transition equality with an uncompressed check: two bytes
    # in the same class must behave identically in the oracle.
    orc = oracle.OraclePattern(rb"[a-m]x|\d")
    for c in range(t.n_classes):
        members = np.flatnonzero(t.class_of == c)[:3]
        ends = {orc.longest_end(bytes([b, ord("x")]), 0)[0] for b in members}
        assert len(ends) == 1


def test_multi_pattern_ids():
    pats = [rb"\w+", rb"\s+", rb"[^\w\s]+"]
    t = compile_patterns([parser.parse(p) for p in pats])
    orc = oracle.OraclePattern(pats)
    text = b"hi, there! 2 go\nnow"
    arr = np.frombuffer(text, dtype=np.uint8)
    L, I = reference.l_array_scan(t, arr, block=4)
    assert select.match_all(L, I) == orc.match_all_ids(text)


def test_minimized_sizes_are_small():
    # The kernel design assumes minimized Q stays small for the conformance
    # patterns (SURVEY.md §7.2.1); pin that here so regressions surface.
    for pat, bound in [
        (rb"foo", 8),
        (rb"[a-z]+", 6),
        (rb"foo|bar|baz", 12),
        (rb"\w+ing\b", 12),
        (rb"\d{2,4}", 10),
    ]:
        t = compile_patterns([parser.parse(pat)])
        assert t.n_states <= bound, (pat, t.n_states)


def test_random_texts_differential():
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"abr z\n.x1", dtype=np.uint8)
    for pat in [rb"ab|a", rb"[ab]+z?", rb"a.*b", rb"\br\w*", rb"(a|b)*z"]:
        t = compile_patterns([parser.parse(pat)])
        orc = oracle.OraclePattern(pat)
        for _ in range(25):
            n = int(rng.integers(0, 40))
            text = bytes(rng.choice(alphabet, size=n))
            arr = np.frombuffer(text, dtype=np.uint8)
            L, I = reference.l_array_scan(t, arr, block=8)
            spans = [(s, e) for s, e, _ in select.match_all(L, I)]
            assert spans == orc.match_all(text), (pat, text)
