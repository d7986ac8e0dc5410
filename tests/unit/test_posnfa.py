"""Position-NFA bit-set engine: differential conformance vs the oracle.

The blowup-class capability (round-4 VERDICT missing #1): patterns whose
DFA explodes must run on a device engine with exact spans. Cases cover the
classic k-bit-history family at several sizes (incl. Q ~ 100 positions),
assertions (F > 1 closure variants), multi-pattern unions, case folding,
nullable patterns, and block-boundary straddles.
"""
import warnings

import numpy as np
import pytest

from rejit_tpu import Config, Pattern
from rejit_tpu.oracle import OraclePattern

# (patterns, alphabet) — every case here must exceed max_dfa_states=64
# under the test config (so the fallback chain engages) yet fit the
# position budget.
BLOWUP_CASES = [
    ([r"(a|b)*a(a|b){9}"], b"ab"),
    ([r"(a|b)*a(a|b){14}"], b"abx"),
    ([r"(?i)(a|b)*a(a|b){9}"], b"aBbA"),
    ([r"(a|b)*a(a|b){8}", r"(x|y)*x(x|y){8}"], b"abxy"),
    ([r"\b(a|b)*a(a|b){10}\b"], b"ab "),
    ([r"(a|b)*a(a|b){45}"], b"ab"),          # Q ~ 100 positions
    ([r"((a|b)*a(a|b){9})?x"], b"abx"),       # nullable head
]

CFG = Config(max_dfa_states=64)


def _compile(pats):
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("ignore")
        p = Pattern(pats, CFG)
    assert p.engine == "posnfa", (pats, p.engine)
    return p


@pytest.mark.parametrize("pats,alpha", BLOWUP_CASES)
def test_blowup_conformance(pats, alpha):
    p = _compile(pats)
    o = OraclePattern([s.encode() for s in pats])
    rng = np.random.default_rng(hash(tuple(pats)) % 2**31)
    texts = [
        b"",
        bytes(alpha),
        (bytes(alpha) * 40)[:100],
        bytes(rng.choice(list(alpha), size=200).astype(np.uint8)),
        # straddle block boundaries: long uniform run through 32/64/128
        alpha[:1] * 130,
    ]
    for t in texts:
        assert p.match_all(t) == o.match_all(t), (pats, t[:40])
        assert p.tokenize(t) == o.match_all_ids(t), (pats, t[:40])
        assert p.match_first(t) == o.match_first(t)
        assert p.match_full(t) == o.match_full(t)


def test_q100_case_is_actually_q100():
    from rejit_tpu.compile import parser, posnfa

    pt = posnfa.compile_posnfa([parser.parse(rb"(a|b)*a(a|b){45}")])
    assert 90 <= pt.Q <= 110, pt.Q
    assert pt.W >= 3


def test_forced_posnfa_matches_dfa_on_small_patterns():
    """engine='posnfa' on DFA-friendly patterns: same results (the two
    engines are differential references for each other)."""
    texts = [
        b"",
        b"singing or winging it, kingly king ing",
        b"." * 100 + b"abab" + b"." * 100,
    ]
    for pats in (["ab"], [r"\b\w+ing\b"], [r"[a-z]+", r"\d+"], [r"a*"]):
        pf = Pattern(pats, Config(engine="posnfa"))
        pd = Pattern(pats)
        for t in texts:
            assert pf.match_all(t) == pd.match_all(t), (pats, t[:30])
            assert pf.tokenize(t) == pd.tokenize(t)


def test_posnfa_block_sizes():
    """K = 32/64/128 (thread words per block) are bit-equal."""
    pat = r"(a|b)*a(a|b){9}"
    rng = np.random.default_rng(5)
    t = bytes(rng.choice(list(b"abx"), size=500).astype(np.uint8))
    want = None
    for k in (32, 64, 128):
        with warnings.catch_warnings(record=True):
            warnings.simplefilter("ignore")
            p = Pattern(pat, Config(max_dfa_states=64, posnfa_block=k))
        got = p.match_all(t)
        if want is None:
            want = got
            assert got == OraclePattern(pat).match_all(t)
        assert got == want, k


def test_posnfa_replace_and_split():
    p = _compile([r"(a|b)*a(a|b){8}"])
    o = OraclePattern(rb"(a|b)*a(a|b){8}")
    t = b"zz" + b"ab" * 8 + b"zz aba"
    spans = o.match_all(t)
    want = bytearray()
    prev = 0
    for s, e in spans:
        want += t[prev:s] + b"X"
        prev = e
    want += t[prev:]
    assert p.replace(t, b"X") == bytes(want)
    assert p.split(t) == [
        t[a:b] for a, b in zip(
            [0] + [e for _s, e in spans],
            [s for s, _e in spans] + [len(t)],
        )
    ]


def test_posnfa_chunked_streaming_exact():
    """Streaming on the position engine carries the suffix element across
    chunks (engine/nfaset.stream_match_all_nfaset): tiny chunks with
    greedy matches crossing every boundary must be exact."""
    pat = r"(a|b)*a(a|b){9}"
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("ignore")
        p = Pattern(pat, Config(max_dfa_states=64, posnfa_block=32))
    assert p.engine == "posnfa"
    rng = np.random.default_rng(9)
    t = bytes(rng.choice(list(b"aabbx"), size=5000).astype(np.uint8))
    want = OraclePattern(pat).match_all_ids(t)
    for cb in (256, 999_999):
        s, e, i = p.match_all_stream(t, chunk_bytes=cb)
        assert list(zip(s.tolist(), e.tolist(), i.tolist())) == want, cb
    pats = [r"(a|b)*a(a|b){8}", r"x+"]
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("ignore")
        p2 = Pattern(pats, Config(max_dfa_states=64, posnfa_block=32))
    s3, e3, i3 = p2.match_all_stream(t, chunk_bytes=512)
    want2 = OraclePattern([x.encode() for x in pats]).match_all_ids(t)
    assert list(zip(s3.tolist(), e3.tolist(), i3.tolist())) == want2


def test_posnfa_fuzz_differential():
    """Random ab-soup differential sweep on the flagship blowup pattern —
    every boundary's L value must agree with the oracle (spans + ids)."""
    pats = [r"(a|b)*a(a|b){11}"]
    p = _compile(pats)
    o = OraclePattern([pats[0].encode()])
    rng = np.random.default_rng(17)
    for _ in range(8):
        n = int(rng.integers(0, 400))
        t = bytes(
            rng.choice(list(b"aabbx"), size=n).astype(np.uint8)
        )
        assert p.tokenize(t) == o.match_all_ids(t), t[:50]
