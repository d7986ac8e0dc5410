"""Multi-pattern replace_each (the regexdna IUB phase, SURVEY.md §2.1/C12)
and the class-literal expansion that routes small classes to the literal
engine (analysis.alt_literals budget expansion)."""
import re

import pytest

from rejit_tpu import Config, Pattern, oracle, replace_each
from rejit_tpu.compile import analysis, parser

IUB = [
    ("B", b"(c|g|t)"), ("D", b"(a|g|t)"), ("H", b"(a|c|t)"),
    ("K", b"(g|t)"), ("M", b"(a|c)"), ("N", b"(a|c|g|t)"),
    ("R", b"(a|g)"), ("S", b"(c|g)"), ("V", b"(a|c|g)"),
    ("W", b"(a|t)"), ("Y", b"(c|t)"),
]


def test_alt_literals_class_expansion():
    al = lambda p: analysis.alt_literals(parser.parse(p))
    assert al(rb"[Bb]") == [b"B", b"b"]
    assert al(rb"[ab]c") == [b"ac", b"bc"]
    assert al(rb"[ab]{2}") == [b"aa", b"ab", b"ba", b"bb"]
    assert al(rb"\d")[0] == b"0"
    assert al(rb"\w") is None      # 63 > budget
    assert al(rb"[a-z]+") is None  # infinite
    assert al(rb"x*") is None      # nullable


def test_small_class_routes_to_literal_engine():
    p = Pattern([r"[Bb]", r"[Dd]"])
    assert p.engine == "literal"
    text = b"xBd bD"
    assert p.tokenize(text) == oracle.OraclePattern(
        [rb"[Bb]", rb"[Dd]"]
    ).match_all_ids(text)


def test_replace_each_iub_equals_sequential():
    text = (b"acgtBDHKMNRSVWYacgt" * 9) + b"bdhkmnrswvy"
    pats = [f"[{c}{c.lower()}]" for c, _ in IUB]
    got = replace_each(pats, text, [r for _, r in IUB])
    want = text
    for code, repl in IUB:
        want = re.sub(
            f"[{code}{code.lower()}]".encode(),
            repl.replace(b"\\", b"\\\\"),
            want,
        )
    assert got == want


def test_replace_each_python_fallback_matches_native():
    text = b"xBzd Nn"
    pats = [r"[Bb]", r"[Dd]", r"[Nn]"]
    reps = [b"1", b"22", b""]
    nat = replace_each(pats, text, reps)
    py = Pattern(pats, Config(selection="python")).replace_each(text, reps)
    assert nat == py == b"x1z22 "


def test_replace_each_arity_check():
    with pytest.raises(ValueError):
        Pattern([r"a", r"b"]).replace_each(b"ab", [b"x"])
