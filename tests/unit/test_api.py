"""End-to-end API tests: every engine path vs the oracle."""
import numpy as np
import pytest

import rejit_tpu
from rejit_tpu import Config, Pattern, oracle

TEXTS = [
    b"",
    b"foo",
    b"xfooy foo barbaz bar\nbaz foofoo",
    b"the quick brown fox jumps over the lazy dog",
    b"aaaabaaa",
    b"singing and winging, kingly things\nsing ping\n",
    b"1 22 333 4444",
]

CASES = [
    ("foo", None),
    ("foo|bar|baz", None),
    ("[a-z]+", None),
    (r"\w+ing\b", None),
    (r"\d+", None),
    ("aa", None),  # bordered literal: overlap selection matters
    ("a|ab", None),
]


@pytest.mark.parametrize("pat,_", CASES, ids=[c[0] for c in CASES])
def test_pattern_vs_oracle(pat, _):
    p = Pattern(pat)
    orc = oracle.OraclePattern(pat)
    for text in TEXTS:
        assert p.match_all(text) == orc.match_all(text), (pat, text)
        assert p.match_first(text) == orc.match_first(text)
        assert p.match_anywhere(text) == orc.match_anywhere(text)
        assert p.match_full(text) == orc.match_full(text)
        assert p.match_all_count(text) == orc.match_all_count(text)


def test_engine_selection():
    assert Pattern("foo").engine == "literal"
    assert Pattern("foo|bar").engine == "literal"
    assert Pattern("[a-z]+").engine == "classrun"
    # run+literal-suffix family: elementwise classlit on CPU
    assert Pattern(r"\w+ing\b").engine == "classlit"
    assert Pattern(r"\b\w+ing\b").engine == "classlit"
    assert Pattern(r"[ab]+(x|yy)ing").engine == "dfa"
    assert Pattern("foo", Config(engine="dfa")).engine == "dfa"
    assert Pattern("foo", Config(engine="oracle")).engine == "oracle"


def test_fused_auto_gate_large_q(monkeypatch):
    """Auto engine routing vs the measured Mosaic compile knees
    (bench/NOTES.md "large-Q"): unrolled fused for Q <= AUTO_MAX_Q,
    ROLLED fused for Q in (AUTO_MAX_Q, AUTO_MAX_Q_ROLLED], XLA
    select-chain beyond. Backend is faked to 'tpu' — this checks the
    routing logic only (on-chip equality: tools/verify_tpu.py)."""
    import jax

    from rejit_tpu import api as api_mod
    from rejit_tpu.kernels.schain_pallas import AUTO_MAX_Q, AUTO_MAX_Q_ROLLED

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cases = [
        (r"\b\w+ing\b", 6, True, False),        # production Q: unrolled
        (r"\b[a-z]{8,16}\b", 18, True, True),   # knee < Q: rolled
        (r"\b[a-z]{16,30}\b", 32, True, True),  # rolled
        # Round 3: the r2 "compile wall" above Q=32 was a degraded
        # tunnel-compile window (fresh-key measurements: 9-115 s across
        # Q=35..134) and rolled throughput beats the XLA select-chain at
        # every Q (0.66 vs 0.01 GB/s at Q=134), so forced-dfa stays on
        # the rolled fused kernel through MAX_Q_ROLLED = 256. AUTO for
        # the \b-wrapped bounded-run family now routes hi+2 >= 48 to the
        # Q-independent classrun engine instead (rolled falls ~Q^1.5:
        # 2.9 GB/s at Q=50, 0.71 at Q=126 — bench/NOTES.md).
        (r"\b[a-z]{24,48}\b", 50, True, True),
        (r"\b[a-z]{62,124}\b", 126, True, True),
    ]
    for pat, q, want_fused, want_rolled in cases:
        p = Pattern(pat, Config(engine="dfa"))
        assert p.tables.n_states == q, pat
        assert p._use_schain_fused() == want_fused, pat
        if want_fused:
            assert p._fused_rolled() == want_rolled, pat
    # auto engine: small-Q wb-runs stay on the fused DFA; at the measured
    # crossover (hi + 2 >= 48) the classrun formulation takes over.
    assert Pattern(r"\b[a-z]{8,16}\b").engine == "dfa"
    assert Pattern(r"\b[a-z]{16,30}\b").engine == "dfa"
    assert Pattern(r"\b[a-z]{24,48}\b").engine == "classrun"
    assert Pattern(r"\b[a-z]{62,124}\b").engine == "classrun"
    assert Pattern(r"[a-z]+").engine == "dfa"  # unbounded: DFA ladder wins
    assert AUTO_MAX_Q == 16 and AUTO_MAX_Q_ROLLED == 256
    # schain_fused='on' still reaches large Q (rolled by default there);
    # schain_rolled='off' confines auto to the unrolled knee.
    p = Pattern(r"\b[a-z]{24,48}\b", Config(schain_fused="on"))
    assert p._use_schain_fused() and p._fused_rolled()
    p = Pattern(r"\b[a-z]{8,16}\b", Config(schain_rolled="off"))
    assert not p._use_schain_fused()
    del api_mod


def test_literal_and_dfa_engines_agree():
    texts = TEXTS + [b"aaaa", b"foofoofoo", b"fofoofo"]
    for pat in ["foo", "aa", "foo|bar|baz", "a|ab"]:
        pl = Pattern(pat)
        pd = Pattern(pat, Config(engine="dfa"))
        assert pl.engine == "literal" and pd.engine == "dfa"
        for text in texts:
            assert pl.match_all(text) == pd.match_all(text), (pat, text)
            assert pl.match_all_count(text) == pd.match_all_count(text)


def test_overlap_free_count_fast_path():
    p = Pattern("foo|bar|baz")
    assert p.info.overlap_free
    text = b"foo bar baz foofoo barbar bazbaz xfoox"
    assert p.match_all_count(text) == 10
    assert p.match_all_count(text) == oracle.match_all_count(
        rb"foo|bar|baz", text
    )
    p2 = Pattern("aa")  # bordered -> no fast path
    assert not p2.info.overlap_free
    assert p2.match_all_count(b"aaaaa") == 2


def test_bordered_literal_nonoverlap_selection():
    assert rejit_tpu.match_all("aa", b"aaaa") == [(0, 2), (2, 4)]
    assert rejit_tpu.match_all("aba", b"ababa") == [(0, 3)]


def test_replace():
    assert rejit_tpu.replace("foo", b"a foo b foo", b"X") == b"a X b X"
    assert rejit_tpu.replace_first("o+", b"foo boo", b"0") == b"f0 boo"
    assert rejit_tpu.replace(r"\s+", "a  b\tc", " ") == b"a b c"
    assert rejit_tpu.replace("x", b"no hits", b"!") == b"no hits"
    assert rejit_tpu.replace_all("foo", b"a foo b", b"X") == b"a X b"
    assert rejit_tpu.ReplaceAll("foo", b"a foo b", b"X") == b"a X b"


def test_split():
    import re as pyre

    cases = [
        (rb"\s+", b"a b  c"),
        (b"x*", b"axbc"),       # zero-width splits (re >= 3.7 semantics)
        (b"a*", b"baac"),
        (b",", b"a,b,,c"),
        (b"z", b"abc"),         # no match: one piece
        (b"b*", b""),
    ]
    for pat, text in cases:
        assert rejit_tpu.split(pat, text) == pyre.split(pat, text), pat
    for ms in (1, 2):
        assert Pattern(",").split(b"a,b,c", maxsplit=ms) == pyre.split(
            b",", b"a,b,c", maxsplit=ms
        )


def test_tokenizer_mode():
    p = Pattern([r"\w+", r"\s+", r"[^\w\s]+"])
    orc = oracle.OraclePattern([rb"\w+", rb"\s+", rb"[^\w\s]+"])
    for text in [b"hi, there! 2 go\nnow", b"", b"   ", b"a,b.c"]:
        assert p.tokenize(text) == orc.match_all_ids(text)


def test_str_and_array_inputs():
    p = Pattern("na")
    assert p.match_all("banana") == [(2, 4), (4, 6)]
    arr = np.frombuffer(b"banana", dtype=np.uint8)
    assert p.match_all(arr) == [(2, 4), (4, 6)]


def test_one_shot_cache_reuses_pattern():
    a = rejit_tpu.compile("cached[0-9]")
    b = rejit_tpu.compile("cached[0-9]")
    assert a is b


def test_empty_pattern_and_empty_text():
    assert rejit_tpu.match_all("a*", b"") == [(0, 0)]
    assert rejit_tpu.match_full("a*", b"")
    assert rejit_tpu.match_first("a", b"") is None
    assert rejit_tpu.match_all_count("", b"ab") == 3


def test_camelcase_aliases():
    assert rejit_tpu.MatchFull("a+", b"aaa")
    assert rejit_tpu.MatchAllCount("a", b"aaa") == 3
    assert rejit_tpu.Regej is rejit_tpu.Pattern


def test_device_corpus_staged_scanning():
    """DeviceCorpus (staged-once serving model) matches the bytes path
    across engines and repeated calls; multiple patterns share staging."""
    from rejit_tpu import Config, Pattern, stage

    txt = b"." * 300 + b"singing and winging" + b"." * 300
    corpus = stage(txt)
    cfg = Config(engine="dfa", schain_fused="on", interpret=True,
                 block_size=8)
    p = Pattern(r"\b\w+ing\b", cfg)
    assert p.match_all(txt) == p.match_all(corpus) == p.match_all(corpus)
    assert p.match_all_count(corpus) == 2
    p2 = Pattern(r"[a-z]+", cfg)
    assert p2.match_all(corpus) == p2.match_all(txt)
    # host-path engines accept the corpus too
    p3 = Pattern("singing")
    assert p3.engine == "literal"
    assert p3.match_all(corpus) == p3.match_all(txt)
    assert p3.match_first(corpus) == (300, 307)
