"""Class-literal routing: fixed-width per-position byte classes ((?i)-folded
literals, \\d\\d:\\d\\d, ...) served by the literal engine's shifted-compare
scan without enumerating the variant set (compile/analysis.alt_class_literals;
the case-insensitive analog of rejit's SSE fast-forward loop, SURVEY.md
§2.1/C6). Every path is differential-tested against the oracle."""
import numpy as np
import pytest

import rejit_tpu
from rejit_tpu import Config, Pattern
from rejit_tpu.compile import parser
from rejit_tpu.compile.analysis import (
    alt_class_literals,
    analyze,
    literals_overlap_free,
)


def _oracle(pat):
    pats = [pat] if isinstance(pat, str) else pat
    return rejit_tpu.compile(pats, Config(engine="oracle"))


def _check_all_ops(pat, text):
    p = Pattern(pat)
    o = _oracle(pat)
    t = np.frombuffer(text, dtype=np.uint8)
    assert p.match_all(t) == o.match_all(t)
    assert p.match_first(t) == o.match_first(t)
    assert p.match_anywhere(t) == o.match_anywhere(t)
    assert p.match_full(t) == o.match_full(t)
    assert p.match_all_count(t) == o.match_all_count(t)
    return p


def test_analysis_detects_folded_literal():
    info = analyze([parser.parse(rb"(?i)packet")])
    assert info.literals is not None and len(info.literals) == 1
    (cl,) = info.literals
    assert not isinstance(cl, bytes)
    assert len(cl) == 6
    assert cl[0] == (ord("P"), ord("p"))
    assert info.overlap_free


def test_analysis_border_not_overlap_free():
    # Some string of the folded language ("abA"... ) overlaps itself:
    # aba at 0 and 2 in "ababa".
    info = analyze([parser.parse(rb"(?i)aba")])
    assert info.literals is not None
    assert not info.overlap_free


def test_analysis_cross_branch_width_tie_not_overlap_free():
    # Languages intersect at the same position/width ("CAT" is in both
    # branches): a per-branch count reduction would double-count.
    lits = analyze(
        [parser.parse(rb"(?i)cat|[CX][Aa][Tt]")]
    ).literals
    assert lits is not None and len(lits) == 2
    assert not literals_overlap_free(list(lits))


def test_analysis_budget_rejects_wide_classes():
    # [a-z] has 26 > 16 bytes per position: not a class-literal.
    assert alt_class_literals(parser.parse(rb"[a-z][a-z]")) is None


def test_plain_literals_unchanged():
    info = analyze([parser.parse(rb"foo|bar|baz")])
    assert all(isinstance(l, bytes) for l in info.literals)
    # Small classes still expand to plain literals via alt_literals.
    info2 = analyze([parser.parse(rb"[Bb]at")])
    assert set(info2.literals) == {b"Bat", b"bat"}


def test_case_insensitive_literal_all_ops():
    p = _check_all_ops(
        "(?i)packet", b"Packet pACKET xpacketx PACKER packet end"
    )
    assert p.engine == "literal"
    assert p.info.overlap_free


def test_case_insensitive_dense_bitmask_parity():
    rng = np.random.default_rng(3)
    text = bytearray(rng.integers(97, 123, 20_000, dtype=np.uint8).tobytes())
    for k, i in enumerate(range(0, 19_990, 8)):
        text[i : i + 6] = b"PaCkEt" if k % 2 else b"packet"
    t = np.frombuffer(bytes(text), dtype=np.uint8)
    pon = Pattern("(?i)packet")
    poff = Pattern("(?i)packet", Config(bitmask="off"))
    s1, e1, p1 = pon.match_all_arrays(t)
    s2, e2, p2 = poff.match_all_arrays(t)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(p1, p2)
    assert len(s1) >= 20_000 // 8 - 8


def test_non_overlap_free_class_literal():
    _check_all_ops("(?i)aba", b"ABabaBA aba ABA xAbAx ababab")


def test_digit_clock_pattern():
    p = _check_all_ops(
        "[0-9][0-9]:[0-9][0-9]", b"at 12:30, 04:59 11:22:33 not 1:23"
    )
    assert p.engine == "literal"
    assert not p.info.overlap_free  # 11:22:33 straddle


def test_mixed_bytes_and_class_branches():
    # (?i) is global, so mixing requires a pattern LIST: the folded
    # branch is a ClassLit, the plain one normalizes to bytes.
    # (short folds like (?i)foo stay bytes: alt_literals expands 8 <= 16
    # variants; (?i)packet's 64 variants take the ClassLit form)
    pats = ["(?i)packet", "bar"]
    p = Pattern(pats)
    o = _oracle(pats)
    t = np.frombuffer(b"PACKET bar Packet BAR barbar xpacketx", dtype=np.uint8)
    assert p.match_all(t) == o.match_all(t)
    assert p.tokenize(t) == o.tokenize(t)
    assert p.engine == "literal"
    kinds = {isinstance(l, bytes) for l in p.info.literals}
    assert kinds == {True, False}


def test_multi_pattern_tokenizer_pids():
    pats = ["(?i)cat", "(?i)dog"]
    p = Pattern(pats)
    o = _oracle(pats)
    t = np.frombuffer(b"Cat DOG cat dOg catdog", dtype=np.uint8)
    assert p.tokenize(t) == o.tokenize(t)


def test_replace_and_split():
    p = Pattern("(?i)cat")
    assert p.replace(b"Cat CAT dog cat", b"X") == b"X X dog X"
    assert p.split(b"aCATbCatc") == [b"a", b"b", b"c"]


def test_matches_may_contain_byte():
    p = Pattern("(?i)packet")
    assert p.matches_may_contain_byte(ord("P"))
    assert p.matches_may_contain_byte(ord("p"))
    assert not p.matches_may_contain_byte(0)
    assert not p.matches_may_contain_byte(ord("\n"))


def test_forced_literal_engine_accepts_clit():
    p = Pattern("(?i)cat", Config(engine="literal"))
    assert p.match_all(b"CAT cat") == [(0, 3), (4, 7)]


@pytest.mark.parametrize("seed", [0, 1])
def test_property_random_fold(seed):
    rng = np.random.default_rng(seed)
    base = b"the Cat SAT on the MAT, a cat sat pat"
    t = np.frombuffer(base, dtype=np.uint8)
    for pat in ["(?i)cat|mat", "(?i)sat"]:
        p = Pattern(pat)
        o = _oracle(pat)
        assert p.match_all(t) == o.match_all(t), pat
