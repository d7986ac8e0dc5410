"""ASCII case-insensitive matching: the '(?i)' prefix flag and
Config(ignore_case=True) (docs/SEMANTICS.md "Inline flags")."""
import re as pyre

import numpy as np
import pytest

from rejit_tpu import Config, Pattern, oracle
from rejit_tpu.compile import ir, parser
from rejit_tpu.errors import RegexpError

TEXT = (
    b"A Packet PACKET pAcKeT packet! FOO Bar bAz fOo "
    b"ing ING InG kings AaAaA aa AAAA \x00\xff Abf GHI"
)

CASES = [
    "(?i)packet",
    "(?i)foo|bar",
    "(?i)[a-f]+",
    "(?i)\\bING\\b",
    "(?i)a{2,4}",
    "(?i)[^a-y]",
    "(?i)pac.et",
]


def _re_spans(pat: str, text: bytes):
    return [
        (m.start(), m.end())
        for m in pyre.finditer(pat[4:].encode(), text, pyre.IGNORECASE)
    ]


@pytest.mark.parametrize("pat", CASES)
def test_oracle_matches_python_re(pat):
    # These patterns have coinciding leftmost-longest/leftmost-first spans.
    assert oracle.match_all(pat, TEXT) == _re_spans(pat, TEXT)


@pytest.mark.parametrize("pat", CASES)
def test_dfa_engine_matches_oracle(pat):
    p = Pattern(pat, Config(engine="dfa"))
    assert p.match_all(TEXT) == oracle.match_all(pat, TEXT)


def test_config_flag_equivalent_to_prefix():
    a = Pattern("packet", Config(ignore_case=True))
    b = Pattern("(?i)packet")
    assert a.source == b.source == (b"(?i)packet",)
    assert a.match_all(b"PACKET packet") == [(0, 6), (7, 13)]


def test_prefix_idempotent_under_config():
    p = Pattern("(?i)packet", Config(ignore_case=True))
    assert p.source == (b"(?i)packet",)


def test_multi_pattern_ignore_case():
    p = Pattern(["foo", "bar"], Config(ignore_case=True, engine="dfa"))
    spans = p.match_all(b"FOO bar BaR")
    assert spans == [(0, 3), (4, 7), (8, 11)]


def test_escaped_letter_bytes_fold():
    assert Pattern("(?i)\\x41").match_all(b"aA") == [(0, 1), (1, 2)]


def test_high_bytes_never_fold():
    # 0xE1 = 0xC1 ^ 0x20 but neither is an ASCII letter.
    assert Pattern("(?i)\\xc1").match_all(b"\xc1\xe1") == [(0, 1)]


def test_casefold_ir_forms():
    node = parser.parse("(?i)ab1")
    # 'a' and 'b' become 2-byte classes, '1' stays a literal.
    assert isinstance(node, ir.Cat)
    a, b, one = node.parts
    assert isinstance(a, ir.CharClass) and a.bitmap == ir.bit(0x41) | ir.bit(0x61)
    assert isinstance(b, ir.CharClass) and b.bitmap == ir.bit(0x42) | ir.bit(0x62)
    assert one == ir.Lit(b"1")


def test_bitmap_casefold_closure():
    m = ir.bitmap_from_ranges((ord("a"), ord("f"))) | ir.bit(ord("Z"))
    folded = ir.bitmap_casefold(m)
    assert folded == (
        ir.bitmap_from_ranges((ord("a"), ord("f")))
        | ir.bitmap_from_ranges((ord("A"), ord("F")))
        | ir.bit(ord("Z"))
        | ir.bit(ord("z"))
    )
    assert ir.bitmap_casefold(folded) == folded


def test_mid_pattern_flag_rejected():
    with pytest.raises(RegexpError):
        parser.parse("a(?i)b")


def test_other_inline_constructs_rejected():
    for bad in ("(?:ab)", "(?=x)", "(?P<n>a)"):
        with pytest.raises(RegexpError):
            parser.parse(bad)


def test_ignore_case_literal_path_falls_to_dfa():
    # Casefolded literals become classes: the auto engine must still
    # produce correct spans (via the DFA), not the literal fast path.
    p = Pattern("(?i)packet")
    t = np.frombuffer(b"xxPACKETyy packet", dtype=np.uint8)
    assert p.match_all(t) == [(2, 8), (11, 17)]


def test_replace_ignore_case():
    p = Pattern("(?i)cat", Config(engine="dfa"))
    assert p.replace(b"Cat CAT cat", b"dog") == b"dog dog dog"
