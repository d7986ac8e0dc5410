r"""Class-run + literal-suffix engine vs oracle (the Q~150 family)."""
import numpy as np
import pytest

from rejit_tpu import Config, Pattern, oracle
from rejit_tpu.compile import parser
from rejit_tpu.kernels import classlit

CASES = [
    r"[A-Za-z]{30,60}ing",   # the Q=152 conformance case
    r"[a-z]{2,4}ing",
    r"x{1,3}y",
    r"[a-z]{0,4}\.com",      # lo=0 (literal makes the pattern non-nullable)
    r"\b[a-z]{2,6}ing\b",
    r"[a-z]+ing",            # unbounded hi
    r"\b\w{1,5}ed",
    r"[in]{1,4}ing",         # suffix overlaps the class material
    r"[a-z]{2,}ing",
    r"[a-z]{2,4}ing\b",
    r"\b[a-z]{1,3}\.x",      # literal with a non-word byte
]


def test_detection():
    for pat in CASES:
        got = classlit.detect(parser.parse(pat))
        assert got is not None, pat
    # negatives
    assert classlit.detect(parser.parse(r"[a-z]+")) is None  # no literal
    assert classlit.detect(parser.parse(r"ing")) is None     # no class run
    assert classlit.detect(parser.parse(r"[a-z]+(x|y)")) is None
    assert classlit.detect(parser.parse(r"\b[a-z ]{2,4}ing")) is None  # lead \b, non-word class
    assert classlit.detect(parser.parse(r"\b[a-z]{0,4}ing")) is None   # lead \b, lo=0
    # suffix longer than the static unroll bound
    long_lit = "x" * (classlit.MAX_SUFFIX + 1)
    assert classlit.detect(parser.parse(r"[a-z]{2,4}" + long_lit)) is None


@pytest.mark.parametrize("pat", CASES)
def test_classlit_vs_oracle(pat):
    p = Pattern(pat, Config(engine="classlit"))
    orc = oracle.OraclePattern(pat.encode())
    rng = np.random.default_rng(17)
    alpha = np.frombuffer(b"abing_ 1\n.comxyed", np.uint8)
    texts = [b"", b"ing", b"aing", b"abcding and xings", b"ing" * 30] + [
        bytes(rng.choice(alpha, int(rng.integers(0, 120)))) for _ in range(30)
    ]
    for text in texts:
        assert p.match_all(text) == orc.match_all(text), (pat, text)
        assert p.match_first(text) == orc.match_first(text)
        assert p.match_full(text) == orc.match_full(text)
        assert p.match_all_count(text) == orc.match_all_count(text)


@pytest.mark.parametrize(
    "pat",
    [r"[a-z]{2,4}ing", r"[a-z]{900,1000}x", r"[a-z]+ing",
     r"\b[a-z]+ing\b", r"\b[a-z]{2,60}ing\b"],
)
def test_classlit_padded_edge(pat):
    """Matches/runs reaching the padded-array end (n == P == 1024)."""
    p = Pattern(pat, Config(engine="classlit"))
    orc = oracle.OraclePattern(pat.encode())
    for text in [
        b" " * 1017 + b"abcding",        # match ends exactly at n == P
        b"a" * 1021 + b"ing",
        b"a" * 1024,                     # run, no suffix anywhere
        b" " * 1000 + b"a" * 21 + b"ing",
        b"ing" * 341 + b"i",
    ]:
        assert p.match_all(text) == orc.match_all(text), (pat, text[-12:])


def test_classlit_equals_dfa():
    rng = np.random.default_rng(29)
    for pat in [r"[a-z]{2,4}ing", r"\b[a-z]{2,6}ing\b", r"[in]{1,4}ing"]:
        pc = Pattern(pat, Config(engine="classlit"))
        pd = Pattern(pat, Config(engine="dfa", block_size=8))
        for _ in range(5):
            nlen = int(rng.integers(0, 80))
            text = bytes(
                rng.choice(np.frombuffer(b"aing _1.", np.uint8), nlen)
            )
            assert pc.match_all(text) == pd.match_all(text), (pat, text)


def test_engine_auto_routing(monkeypatch):
    import jax

    # CPU backend: classlit whenever detected
    assert Pattern(r"[A-Za-z]{30,60}ing").engine == "classlit"
    # accelerator: only above the Q-estimate knee (hi + |S| + 2 >= 48)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert Pattern(r"[A-Za-z]{30,60}ing").engine == "classlit"
    assert Pattern(r"[a-z]{2,4}ing").engine == "dfa"
    assert Pattern(r"\w+ing").engine == "dfa"  # unbounded, small lo
    assert (
        Pattern(r"[A-Za-z]{30,60}ing", Config(schain_fused="on")).engine
        == "dfa"
    )
