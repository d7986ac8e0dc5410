"""Property-based differential testing (SURVEY.md §4.2 "Property/fuzz").

Random patterns from the supported grammar x random texts; the compiled DFA
engine must agree with the oracle on every MatchType. This catches semantic
edge cases (empty matches, assertion interplay, class negation) better than
fixed cases.
"""
import numpy as np
from hypothesis import assume, given, settings, strategies as st

from rejit_tpu import Config, Pattern, oracle

# -- pattern grammar strategy ------------------------------------------------

_ALPHABET = "abz. "          # small alphabet => dense match interactions
_CLASS_ITEMS = ["a", "b", "z", "a-c", "^a", "\\d", "\\w"]


def _atom():
    return st.one_of(
        st.sampled_from([c if c != "." else "\\." for c in _ALPHABET[:3]]),
        st.just("."),
        st.sampled_from(["[ab]", "[a-c]", "[^a]", "\\w", "\\d", "\\s"]),
    )


def _quant(p):
    return st.sampled_from(["", "*", "+", "?", "{2}", "{1,3}"]).map(
        lambda q: p + q
    )


@st.composite
def patterns(draw, depth=2):
    if depth == 0:
        a = draw(_atom())
        return draw(_quant(a))
    kind = draw(st.integers(0, 3))
    if kind == 0:
        a = draw(patterns(depth=depth - 1))
        b = draw(patterns(depth=depth - 1))
        return a + b
    if kind == 1:
        a = draw(patterns(depth=depth - 1))
        b = draw(patterns(depth=depth - 1))
        return f"(?:{a}|{b})".replace("?:", "")  # no capture syntax
    if kind == 2:
        a = draw(patterns(depth=depth - 1))
        return "(" + a + ")" + draw(st.sampled_from(["", "*", "+", "?"]))
    a = draw(_atom())
    return draw(_quant(a))


texts = st.text(alphabet=_ALPHABET + "\n", max_size=40).map(
    lambda s: s.encode()
)


@settings(max_examples=60, deadline=None)
@given(pat=patterns(), text=texts)
def test_dfa_engine_matches_oracle(pat, text):
    try:
        p = Pattern(pat, Config(engine="dfa", block_size=8))
    except Exception:
        return  # pattern rejected by compiler limits: fine
    orc = oracle.OraclePattern(pat)
    assert p.match_all(text) == orc.match_all(text), (pat, text)
    assert p.match_full(text) == orc.match_full(text), (pat, text)


@settings(max_examples=40, deadline=None)
@given(pat=patterns(), text=texts)
def test_posnfa_engine_matches_oracle(pat, text):
    """The position-NFA bit-set engine over the same random grammar —
    assertion variants, nullable heads, empty matches included."""
    try:
        p = Pattern(pat, Config(engine="posnfa", posnfa_block=32))
    except Exception:
        return  # pattern rejected by compiler limits: fine
    orc = oracle.OraclePattern(pat)
    assert p.match_all(text) == orc.match_all(text), (pat, text)
    assert p.match_full(text) == orc.match_full(text), (pat, text)


@settings(max_examples=30, deadline=None)
@given(
    lits=st.lists(
        st.text(alphabet="abz", min_size=1, max_size=4), min_size=1, max_size=3
    ),
    text=texts,
)
def test_literal_engine_matches_oracle(lits, text):
    pat = "|".join(lits)
    p = Pattern(pat)
    assert p.engine == "literal"
    orc = oracle.OraclePattern(pat)
    assert p.match_all(text) == orc.match_all(text), (pat, text)
    assert p.match_all_count(text) == orc.match_all_count(text), (pat, text)


_CASED_TEXTS = st.text(alphabet=_ALPHABET + _ALPHABET.upper() + "\n",
                       max_size=40).map(lambda s: s.encode())


@settings(max_examples=60, deadline=None)
@given(pat=patterns(), text=_CASED_TEXTS)
def test_ignore_case_matches_oracle(pat, text):
    """(?i) pattern: engine vs oracle on mixed-case text, plus the
    invariant that (?i) spans on text == plain spans on text.lower()
    (true because folding never changes match WIDTHS for this grammar)."""
    try:
        p = Pattern("(?i)" + pat, Config(engine="dfa", block_size=8))
    except Exception:
        return
    orc = oracle.OraclePattern("(?i)" + pat)
    assert p.match_all(text) == orc.match_all(text), (pat, text)
    lower = text.lower()
    try:
        plain = Pattern(pat, Config(engine="dfa", block_size=8))
    except Exception:
        return
    assert p.match_all(text) == plain.match_all(lower), (pat, text)


@given(pat=patterns(), data=st.data())
@settings(deadline=None, max_examples=60)
def test_chunk_skip_analysis_sound(pat, data):
    """The fused kernel's silent-class static analysis (chunk-skip fast
    path) is semantically sound for arbitrary grammar patterns.

    Interpret-mode CI runs the kernel branchless, so the skip branch's
    premises are validated here directly against the tables and the XLA
    engine: (a) the detected dead state is absorbing and silent, (b) any
    text drawn purely from the silent byte set produces no candidate at
    any boundary before EOT, (c) every state collapses to dead after one
    silent byte.
    """
    import numpy as np

    from rejit_tpu.compile import parser as rparser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.engine import schain
    from rejit_tpu.kernels.schain_pallas import _plan

    try:
        tables = compile_patterns([rparser.parse(pat.encode())])
    except Exception:
        assume(False)
    st_ = schain.static_tables(tables)
    plan = _plan(st_, 8)
    if not plan["skip"]:
        assume(False)
    dead = plan["dead"]
    cls_runs = st_[0]
    nxt, acc = st_[2], st_[3]
    accept_eot = st_[5]
    C = len(nxt)
    Q = len(nxt[0])
    # (a) dead is absorbing + silent + no EOT accept.
    assert accept_eot[dead] < 0
    for c in range(C):
        assert nxt[c][dead] == dead and acc[c][dead] < 0
    # byte -> class map from runs
    cls_of = np.zeros(256, np.int32)
    for lo, hi, v in cls_runs:
        cls_of[lo:hi + 1] = v
    silent_bytes = []
    for lo, hi in plan["silent_runs"]:
        silent_bytes.extend(range(lo, hi + 1))
    assert silent_bytes
    # (c) every state collapses to dead on every silent byte.
    for b in silent_bytes[:: max(1, len(silent_bytes) // 16)]:
        c = cls_of[b]
        for q in range(Q):
            assert nxt[c][q] == dead
    # (b) executable check: a pure-silent text has no candidates < EOT.
    import jax.numpy as jnp

    picks = data.draw(
        st.lists(
            st.sampled_from(silent_bytes), min_size=1, max_size=48
        )
    )
    n = len(picks)
    K = 8
    P = -(-(n + 1) // K) * K
    buf = np.zeros(P, np.uint8)
    buf[:n] = picks
    L, _ = schain.l_arrays_device_schain(
        st_, jnp.asarray(buf), jnp.int32(n), block=K
    )
    assert not np.any(np.asarray(L)[:n] >= 0), (pat, picks)


# -- bitpacked extraction peel (round 4) -------------------------------------

@given(
    st.integers(0, 2**32 - 1).flatmap(
        lambda seed: st.tuples(
            st.just(seed),
            st.floats(0.0, 1.0),
            st.sampled_from([32, 64, 128]),
            st.integers(33, 900),
        )
    )
)
@settings(max_examples=60, deadline=None)
def test_extract_rows_bitmask_vs_numpy(params):
    """extract_rows_bitmask == a trivial numpy reference on random masks:
    per row_w-byte row, the first `cap` set positions in order, counts
    exact past cap."""
    import jax.numpy as jnp

    from rejit_tpu.engine import spans

    seed, density, row_w, n_raw = params
    n = -(-n_raw // row_w) * row_w
    rng = np.random.default_rng(seed)
    m = rng.random(n) < density
    words = np.zeros(n // 32, dtype=np.uint32)
    for i in np.flatnonzero(m):
        words[i // 32] |= np.uint32(1) << np.uint32(i % 32)
    cap = int(rng.integers(1, 9))
    pos, cnt = spans.extract_rows_bitmask(
        jnp.asarray(words), row_w=row_w, row_cap=cap
    )
    pos = np.asarray(pos)
    cnt = np.asarray(cnt)
    R = n // row_w
    for r in range(R):
        hits = np.flatnonzero(m[r * row_w : (r + 1) * row_w]) + r * row_w
        assert cnt[r] == len(hits)
        want = list(hits[:cap]) + [-1] * (cap - min(cap, len(hits)))
        assert pos[r].tolist() == want
