"""regexdna sample correctness: variant counts and IUB substitution
lengths must match python `re` ground truth on a small FASTA (CPU).

Regression for the round-4 bug where hand-rolled case-insensitization
mangled classes inside the variant patterns ('[acg]' -> '[[aA][cC][gG]]')
and silently zeroed every count.
"""
import re

import numpy as np

import samples.regexdna as rd
from rejit_tpu import Pattern


def test_variant_counts_match_python_re():
    data = rd.make_fasta(30_000, seed=7)
    stripped = Pattern(rb"(>[^\n]*\n)|\n").replace(data, b"")
    any_nonzero = False
    for pat in rd.VARIANTS:
        want = len(re.findall(pat.encode(), stripped, re.I))
        got = Pattern("(?i)" + pat).match_all_count(
            np.frombuffer(stripped, np.uint8)
        )
        assert got == want, pat
        any_nonzero |= want > 0
    # The fixture must actually exercise matches, or this test proves
    # nothing (the buggy transform also produced all-zero counts).
    assert any_nonzero


def test_count_each_one_call_matches_python_re():
    """The one-dispatch nine-variant path (match_all_count_each) must
    reproduce the per-variant sequential counts exactly."""
    data = rd.make_fasta(30_000, seed=7)
    stripped = Pattern(rb"(>[^\n]*\n)|\n").replace(data, b"")
    nine = Pattern(["(?i)" + v for v in rd.VARIANTS])
    got = nine.match_all_count_each(np.frombuffer(stripped, np.uint8))
    assert nine.last_stats.op == "match_all_count_each"
    # Every variant rode the fused one-dispatch literal pass.
    assert nine.last_stats.device_time_s > 0
    for pat, g in zip(rd.VARIANTS, got):
        assert g == len(re.findall(pat.encode(), stripped, re.I)), pat
    assert got.sum() > 0


def test_count_each_nonoverlap_and_mixed_width():
    """Independent per-pattern counting with bordered literals (overlap
    suppression inside one pid) and mixed widths inside one pid."""
    p = Pattern(["aa|bbb", "ab"])
    text = b"aaaa bbbbb abab aa"
    got = p.match_all_count_each(np.frombuffer(text, np.uint8))
    assert list(got) == [
        len(re.findall(b"aa|bbb", text)),
        len(re.findall(b"ab", text)),
    ]
    # Non-literal engine: falls back to one count per pattern.
    q = Pattern([r"[a-z]+", r"\d+"])
    t2 = b"abc 123 zz9"
    got2 = q.match_all_count_each(np.frombuffer(t2, np.uint8))
    assert list(got2) == [
        len(re.findall(rb"[a-z]+", t2)),
        len(re.findall(rb"\d+", t2)),
    ]


def test_iub_substitution_matches_python_re():
    data = rd.make_fasta(10_000, seed=3)
    stripped = Pattern(rb"(>[^\n]*\n)|\n").replace(data, b"")
    iub_pat = Pattern([f"[{c}{c.lower()}]" for c, _ in rd.IUB])
    got = iub_pat.replace_each(
        stripped, [r.encode() for _, r in rd.IUB]
    )
    want = stripped
    for c, r in rd.IUB:
        want = re.sub(f"[{c}{c.lower()}]".encode(), r.encode(), want)
    assert got == want
