"""Oracle semantics tests (docs/SEMANTICS.md).

The oracle is the executable spec (SURVEY.md §0 mandate), so it is validated
two ways: hand-written pinned cases, and differentially against Python `re`
on the syntax subset where leftmost-longest (ours) and leftmost-first
(Python's) semantics coincide (SURVEY.md §4.4).
"""
import re as pyre

import pytest

from rejit_tpu import oracle

# Patterns where POSIX leftmost-longest == Python leftmost-first:
# greedy quantifier chains with no cross-prefix alternation.
RE_COMPAT = [
    (rb"foo", b"xxfooyyfoofoo"),
    (rb"foo", b"foo"),
    (rb"foo", b""),
    (rb"[a-z]+", b"Make it SO, number one."),
    (rb"foo|bar|baz", b"a bar of baz near foo."),
    (rb"\d+", b"a1b22c333 4444"),
    (rb"\w+ing\b", b"singing or winging it, kingly"),
    (rb"\bw\w*", b"wow, water wheel"),
    (rb"a*", b"baac"),
    (rb"a?b", b"ababb"),
    (rb"(ab)+", b"abababxab"),
    (rb"^\w+", b"first line\nsecond line"),
    (rb"\w+$", b"first line\nsecond line"),
    (rb"a.c", b"abc a\nc axc"),
    (rb"[^ ]+", b"split on  spaces "),
    (rb"x{2,3}", b"xxxxxxx"),
    (rb"(a|b)c{1,2}d?", b"accd bcd acdd"),
    (rb"", b"abc"),
]


@pytest.mark.parametrize("pat,text", RE_COMPAT, ids=[p[0].decode() for p in RE_COMPAT])
def test_match_all_vs_python_re(pat, text):
    # Python re has MULTILINE off by default for ^/$; our ^/$ are always
    # line anchors, so compile with MULTILINE for comparison.
    rx = pyre.compile(pat, pyre.MULTILINE)
    expected = [m.span() for m in rx.finditer(text)]
    assert oracle.match_all(pat, text) == expected


@pytest.mark.parametrize("pat,text", RE_COMPAT, ids=[p[0].decode() for p in RE_COMPAT])
def test_first_and_bools_vs_python_re(pat, text):
    rx = pyre.compile(pat, pyre.MULTILINE)
    m = rx.search(text)
    assert oracle.match_first(pat, text) == (m.span() if m else None)
    assert oracle.match_anywhere(pat, text) == (m is not None)
    assert oracle.match_full(pat, text) == (rx.fullmatch(text) is not None)


def test_leftmost_longest_differs_from_python():
    # POSIX: 'a|ab' over 'ab' matches 'ab' (longest); Python re matches 'a'.
    assert oracle.match_all(rb"a|ab", b"ab") == [(0, 2)]
    assert oracle.match_first(rb"ab|a", b"ab") == (0, 2)


def test_tie_on_length_takes_lowest_pattern_id():
    p = oracle.OraclePattern([rb"ab|xy", rb"ab"])
    assert p.match_all_ids(b"ab xy") == [(0, 2, 0), (3, 5, 0)]
    p2 = oracle.OraclePattern([rb"cd", rb"ab"])
    assert p2.match_all_ids(b"ab cd") == [(0, 2, 1), (3, 5, 0)]


def test_tokenizer_maximal_munch():
    toks = oracle.OraclePattern([rb"\w+", rb"\s+", rb"[^\w\s]+"])
    spans = toks.match_all_ids(b"hi, there!")
    assert spans == [
        (0, 2, 0), (2, 3, 2), (3, 4, 1), (4, 9, 0), (9, 10, 2),
    ]


def test_empty_matches_advance():
    assert oracle.match_all(rb"a*", b"baac") == [(0, 0), (1, 3), (3, 3), (4, 4)]
    assert oracle.match_all_count(rb"", b"ab") == 3


def test_anchors_are_line_anchors():
    assert oracle.match_all(rb"^b", b"a\nb\nba") == [(2, 3), (4, 5)]
    assert oracle.match_all(rb"a$", b"ba\na\nxa") == [(1, 2), (3, 4), (6, 7)]
    assert oracle.match_full(rb"^a$", b"a")
    assert not oracle.match_anywhere(rb"^b", b"ab")


def test_word_boundaries():
    assert oracle.match_all(rb"\bcat\b", b"cat catalog concat cat") == [
        (0, 3),
        (19, 22),
    ]
    assert oracle.match_all(rb"\Bcat\B", b"concatenate cat") == [(3, 6)]


def test_full_requires_whole_text():
    assert oracle.match_full(rb"a+", b"aaa")
    assert not oracle.match_full(rb"a+", b"aab")
    assert oracle.match_full(rb"a*", b"")
    assert not oracle.match_full(rb"a", b"")


def test_dot_excludes_newline():
    assert oracle.match_all(rb".+", b"ab\ncd") == [(0, 2), (3, 5)]


def test_matches_may_touch():
    assert oracle.match_all(rb"aa", b"aaaa") == [(0, 2), (2, 4)]
    assert oracle.match_all(rb"ab", b"ababab") == [(0, 2), (2, 4), (4, 6)]


def test_bounded_repeat_longest():
    assert oracle.match_all(rb"x{2,3}", b"xxxxxxx") == [(0, 3), (3, 6)]


def test_nullable_loop_terminates():
    # (a?)* is nullable inside a loop; closure must not hang.
    assert oracle.match_first(rb"(a?)*b", b"aab") == (0, 3)
