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


def test_detection():
    assert classrun.detect(parser.parse("[a-z]+")) is not None
    assert classrun.detect(parser.parse(r"\d{2,5}")) is not None
    assert classrun.detect(parser.parse("[a-z]")) is not None
    assert classrun.detect(parser.parse("a+")) is not None  # single-byte class
    assert classrun.detect(parser.parse("[a-z]*")) is None  # nullable
    assert classrun.detect(parser.parse("[a-z]+b")) is None
    assert classrun.detect(parser.parse("foo")) is None


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
