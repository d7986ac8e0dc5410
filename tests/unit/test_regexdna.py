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
