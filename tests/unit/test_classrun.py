"""Class-run engine vs oracle (BASELINE config 2 fast path)."""
import numpy as np
import pytest

from rejit_tpu import Config, Pattern, oracle
from rejit_tpu.compile import parser
from rejit_tpu.kernels import classrun

TEXTS = [
    b"",
    b"abc",
    b"Make it SO, number one.",
    b"   aaa bb c    dddd",
    b"xxxxxx",
    b"a\nb\ncc\n",
    b"1 22 333 4444 55555",
]

CASES = ["[a-z]+", r"\d+", r"\w+", "[^ ]+", "x{2,3}", r"\d{2,}", "[ab]{3}", "[a-z]"]

# \b-wrapped class runs (the large-Q bounded-quantifier family): class is
# all word bytes, so the boundary tests stay elementwise (kernel docstring).
WB_CASES = [
    r"\b[a-z]{2,4}\b",
    r"\b[a-z]+\b",
    r"\b[a-z]{3,}\b",
    r"[a-z]{2,4}\b",
    r"\b[a-z]{2,4}",
    r"\b\w{1,3}\b",
    r"\bx\b",
    r"\b[a-z]+",
    r"\b\w+\b",
]


def test_detection():
    assert classrun.detect(parser.parse("[a-z]+")) is not None
    assert classrun.detect(parser.parse(r"\d{2,5}")) is not None
    assert classrun.detect(parser.parse("[a-z]")) is not None
    assert classrun.detect(parser.parse("a+")) is not None  # single-byte class
    assert classrun.detect(parser.parse("[a-z]*")) is None  # nullable
    assert classrun.detect(parser.parse("[a-z]+b")) is None
    assert classrun.detect(parser.parse("foo")) is None


def test_wb_detection():
    for pat in WB_CASES:
        bm, lo, hi, lead, trail = classrun.detect(parser.parse(pat))
        assert lead or trail, pat
    # class with non-word bytes: \b is not elementwise -> no detection
    assert classrun.detect(parser.parse(r"\b[a-z ]{2,4}\b")) is None
    assert classrun.detect(parser.parse(r"\b[a-z.]+\b")) is None
    assert classrun.detect(parser.parse(r"\B[a-z]+\B")) is None
    assert classrun.detect(parser.parse(r"^[a-z]+$")) is None
    assert classrun.detect(parser.parse(r"\b[a-z]{0,4}\b")) is None  # nullable


@pytest.mark.parametrize("pat", WB_CASES)
def test_wb_classrun_vs_oracle(pat):
    p = Pattern(pat, Config(engine="classrun"))
    orc = oracle.OraclePattern(pat.encode())
    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b"ab_ 1\nxyz.", np.uint8)
    texts = list(TEXTS) + [
        bytes(rng.choice(alpha, int(rng.integers(0, 90)))) for _ in range(25)
    ]
    for text in texts:
        assert p.match_all(text) == orc.match_all(text), (pat, text)
        assert p.match_first(text) == orc.match_first(text)
        assert p.match_full(text) == orc.match_full(text)
        assert p.match_all_count(text) == orc.match_all_count(text)


@pytest.mark.parametrize("pat", [r"\b[a-z]{2,4}\b", r"\b[a-z]+\b",
                                 r"\b[a-z]{900,1000}\b", r"[a-z]{2,}\b"])
def test_wb_classrun_padded_edge(pat):
    """Runs reaching the padded-array end (n == P) hit the cummin
    overflow path; matches ending exactly at EOT take the \\b-at-EOT
    branch."""
    p = Pattern(pat, Config(engine="classrun"))
    orc = oracle.OraclePattern(pat.encode())
    for text in [
        b" " * 1020 + b"abcd",      # match ends exactly at n == P == 1024
        b"a" * 1024,                # one run covering the whole array
        b"1" * 1020 + b"abcd",      # word (digit) before run: lead \b fails
        b" " * 1021 + b"ab_",       # trailing underscore is a word byte
        b" " * 60 + b"a" * 964,
    ]:
        assert p.match_all(text) == orc.match_all(text), (pat, text[-8:])


def test_wb_classrun_equals_dfa():
    rng = np.random.default_rng(13)
    for pat in WB_CASES:
        pc = Pattern(pat, Config(engine="classrun"))
        pd = Pattern(pat, Config(engine="dfa", block_size=8))
        for _ in range(5):
            nlen = int(rng.integers(0, 80))
            text = bytes(rng.choice(np.frombuffer(b"abx_1\n .", np.uint8), nlen))
            assert pc.match_all(text) == pd.match_all(text), (pat, text)


@pytest.mark.parametrize("pat", CASES)
def test_classrun_vs_oracle(pat):
    p = Pattern(pat)
    if pat not in ("[a-z]", "a+"):
        pass
    orc = oracle.OraclePattern(pat.encode())
    for text in TEXTS:
        assert p.match_all(text) == orc.match_all(text), (pat, text, p.engine)
        assert p.match_first(text) == orc.match_first(text)
        assert p.match_full(text) == orc.match_full(text)
        assert p.match_all_count(text) == orc.match_all_count(text)


def test_engine_selected():
    assert Pattern("[a-z]+").engine == "classrun"
    assert Pattern(r"\d{2,4}").engine == "classrun"
    assert Pattern("[a-z]+", Config(engine="dfa")).engine == "dfa"


def test_classrun_equals_dfa():
    rng = np.random.default_rng(9)
    for pat in CASES:
        pc = Pattern(pat)
        pd = Pattern(pat, Config(engine="dfa", block_size=8))
        for _ in range(5):
            nlen = int(rng.integers(0, 80))
            text = bytes(rng.choice(np.frombuffer(b"abx 1\n", np.uint8), nlen))
            assert pc.match_all(text) == pd.match_all(text), (pat, text)
