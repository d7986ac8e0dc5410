"""VMEM-fused select-chain kernel == XLA select-chain == gather pipeline.

All three DFA formulations must be bit-equal (CLAUDE.md design invariant);
the fused kernel additionally goes through the oracle differential via the
API test (`test_api_conformance_fused`).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rejit_tpu import Config, Pattern
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns
from rejit_tpu.engine import pipeline, schain
from rejit_tpu.kernels import schain_pallas
from rejit_tpu.oracle import OraclePattern

PATS = [
    [rb"\b\w+ing\b"],
    [rb"[a-z]+"],
    [rb"foo|bar|baz"],
    [rb"a*"],
    [rb"^line.*$"],
    [rb"\w+", rb"\s+", rb"[^\w\s]+"],   # multi-pattern (track_pid path)
]

SOUP = np.frombuffer(b"abc defoo barbaz ing singing\n working!", np.uint8)


def _setup(pats, K=8, CHL=8, chunks=2):
    t = compile_patterns([parser.parse(p) for p in pats])
    st = schain.static_tables(t)
    P = K * 8 * CHL * chunks
    rng = np.random.default_rng(hash(tuple(pats)) % 2**32)
    text = rng.choice(SOUP, size=P).astype(np.uint8)
    return t, st, text, P, K, CHL


@pytest.mark.parametrize(
    "pats", PATS, ids=["+".join(p.decode() for p in ps) for ps in PATS]
)
def test_fused_equals_schain_and_pipeline(pats):
    t, st, text, P, K, CHL = _setup(pats)
    ct = pipeline.device_tables(t)
    for n in [P, P - 3, P // 2 + 1, 1, 0]:
        L0, I0 = pipeline.l_arrays_device(
            ct, jnp.asarray(text), jnp.int32(n), block=K
        )
        L1, I1 = schain.l_arrays_device_schain(
            st, jnp.asarray(text), jnp.int32(n), block=K
        )
        L2, I2 = schain_pallas.l_arrays_device_schain_fused(
            st, t.n_patterns, jnp.asarray(text), jnp.int32(n),
            block=K, chl=CHL, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
        np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
        np.testing.assert_array_equal(np.asarray(I0), np.asarray(I1))
        np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))


def test_fused_block_sizes():
    """K = 16/32 (the production block sizes) stay bit-equal."""
    for K in (16, 32):
        t, st, text, P, _, CHL = _setup([rb"\b\w+ing\b"], K=K, chunks=1)
        L1, I1 = schain.l_arrays_device_schain(
            st, jnp.asarray(text), jnp.int32(P - 5), block=K
        )
        L2, I2 = schain_pallas.l_arrays_device_schain_fused(
            st, 1, jnp.asarray(text), jnp.int32(P - 5),
            block=K, chl=CHL, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
        np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))


def _corpus_cases():
    import base64
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "conformance", "corpus.json",
    )
    with open(path) as f:
        cases = json.load(f)
    # Every 3rd case: representative coverage at interpret-mode cost.
    return [
        (i, [p.encode("latin-1") for p in c["patterns"]],
         base64.b64decode(c["text_b64"]))
        for i, c in enumerate(cases)
        if i % 3 == 0
    ]


@pytest.mark.parametrize(
    "i,pats,text", _corpus_cases(), ids=[str(c[0]) for c in _corpus_cases()]
)
def test_fused_conformance_subset(i, pats, text):
    """Fused kernel L/I == gather pipeline L/I on frozen corpus cases."""
    t = compile_patterns([parser.parse(p) for p in pats])
    if t.n_states > 32:
        # The UNROLLED interpret trace is log2(CH)*Q^2 XLA CPU ops — a
        # Q=50 case measured ~20 min / >20 GB to compile (2026-08-18).
        # Large-Q fused coverage lives in the rolled differentials
        # (test_rolled_*) and the on-chip gate (verify_tpu --rolled).
        pytest.skip(f"Q={t.n_states} exceeds the interpret trace budget")
    st = schain.static_tables(t)
    ct = pipeline.device_tables(t)
    K, CHL = 8, 8
    grain = K * 8 * CHL
    n = len(text)
    P = max(grain, -(-n // grain) * grain)
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = np.frombuffer(text, np.uint8)
    L1, I1 = pipeline.l_arrays_device(
        ct, jnp.asarray(pad), jnp.int32(n), block=K
    )
    L2, I2 = schain_pallas.l_arrays_device_schain_fused(
        st, t.n_patterns, jnp.asarray(pad), jnp.int32(n),
        block=K, chl=CHL, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))


def test_api_conformance_fused():
    """Public API with the fused engine forced matches the oracle."""
    cfg = Config(engine="dfa", schain_fused="on", interpret=True,
                 block_size=8)
    for pats in ([rb"\b\w+ing\b"], [rb"\w+", rb"\s+"]):
        p = Pattern([x.decode() for x in pats], cfg)
        assert p._use_schain_fused()
        o = OraclePattern(list(pats))
        text = bytes(
            np.random.default_rng(7).choice(SOUP, size=700).tolist()
        )
        assert p.match_all(text) == [
            (s, e) for s, e, _ in o.match_all_ids(text)
        ]
        assert p.match_first(text) == o.match_first(text)
        assert p.match_anywhere(text) == o.match_anywhere(text)


# ---- chunk-skip (fast-forward) fast path --------------------------------

SKIP_PATS = [
    [rb"\b\w+ing\b"],
    [rb"[a-z]+"],
    [rb"foo|bar|baz"],
    [rb"\w+", rb"\s+"],
]


def _skip_texts(chunk):
    """Texts engineered around the chunk (K*8*CHL) skip granularity."""
    return [
        b"." * (4 * chunk),                          # fully silent
        b"." * chunk + b"singing" + b"." * chunk,    # one live island
        # match ends exactly at a chunk edge: the \b-completing space is
        # the FIRST byte of an otherwise-silent chunk (the carried-accept
        # case the UNI0 first-byte rule exists for)
        b"." * (chunk - 7) + b"singing" + b" " * chunk,
        b"." * (chunk - 3) + b"singing" + b"." * chunk,  # straddles edge
        b"sing" + b"." * (2 * chunk),                # live first chunk only
    ]


@pytest.mark.parametrize(
    "pats", SKIP_PATS, ids=["+".join(p.decode() for p in ps) for ps in SKIP_PATS]
)
def test_chunk_skip_bit_equal(pats):
    """ff-on == ff-off == XLA schain on skip-heavy corpora."""
    K, CHL = 8, 2
    chunk = K * 8 * CHL
    t = compile_patterns([parser.parse(p) for p in pats])
    st = schain.static_tables(t)
    assert schain_pallas._plan(st, K)["skip"], "skip should enable"
    for raw in _skip_texts(chunk):
        n = len(raw)
        P = -(-max(n, 1) // chunk) * chunk
        if P == n:
            P += chunk
        pad = np.zeros(P, np.uint8)
        pad[:n] = np.frombuffer(raw, np.uint8)
        td = jnp.asarray(pad)
        L1, I1 = schain.l_arrays_device_schain(st, td, jnp.int32(n), block=K)
        for use_ff in (True, False):
            L2, I2 = schain_pallas.l_arrays_device_schain_fused(
                st, t.n_patterns, td, jnp.int32(n),
                block=K, chl=CHL, interpret=True, use_ff=use_ff,
            )
            np.testing.assert_array_equal(
                np.asarray(L1), np.asarray(L2), err_msg=f"n={n} ff={use_ff}"
            )
            np.testing.assert_array_equal(
                np.asarray(I1), np.asarray(I2), err_msg=f"n={n} ff={use_ff}"
            )


def test_chunk_skip_oracle_sparse():
    """Sparse-corpus spans through the public API == oracle."""
    chunk = 8 * 8 * 2
    raw = (b"#" * chunk + b" singing kings "
           + b"." * (chunk - 7) + b"winging" + b"!" * chunk)
    cfg = Config(engine="dfa", schain_fused="on", interpret=True,
                 block_size=8, use_ff=True)
    p = Pattern(r"\b\w+ing\b", cfg)
    o = OraclePattern([rb"\b\w+ing\b"])
    assert p.match_all(raw) == [(s, e) for s, e in o.match_all(raw)]


def test_fused_large_q():
    """Q in (16, 64]: the parametric packed-bit split (m_shift) is exact."""
    pats = [rb"(abcdefgh|ijklmnop|qrstuvwx)\d{2}"]
    t = compile_patterns([parser.parse(p) for p in pats])
    assert 16 < t.n_states <= 64, t.n_states
    assert schain_pallas.m_shift(t.n_states) < 27
    st = schain.static_tables(t)
    K, CHL = 8, 2
    grain = K * 8 * CHL
    txt = b"..abcdefgh12..ijklmnop34..qrstuvwx5x.."
    n = len(txt)
    P = -(-(n + 1) // grain) * grain
    pad = np.zeros(P, np.uint8)
    pad[:n] = np.frombuffer(txt, np.uint8)
    td = jnp.asarray(pad)
    L1, I1 = schain.l_arrays_device_schain(st, td, jnp.int32(n), block=K)
    L2, I2 = schain_pallas.l_arrays_device_schain_fused(
        st, t.n_patterns, td, jnp.int32(n), block=K, chl=CHL,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))
    assert int(np.asarray(L2)[2]) == 12          # abcdefgh12 at 2..12


def test_count_mode_equals_len_match_all():
    """count_device_staged (pure reduction) == len(match_all) for
    overlap-free patterns, incl. through the public API."""
    cfg = Config(engine="dfa", schain_fused="on", interpret=True,
                 block_size=8, fused_block=8, fused_chl=2)
    for pat in (r"\b\w+ing\b", r"a+$", r"x{2,4}"):
        p = Pattern(pat, cfg)
        if not p.info.overlap_free:
            continue
        for txt in (b"", b"singing", b"." * 300 + b"singing" + b"." * 300,
                    b"sing winging xx xxxx baaa " * 10):
            assert p.match_all_count(txt) == len(p.match_all(txt)), (
                pat, txt[:20]
            )


def test_fused_accept_state_above_31():
    """Accepting state indices >= 32: the accept bitmask must split into
    31-bit word planes (a single int32 plane overflows — regression for
    the `bits |= 1 << q` trace-time OverflowError at Q in (32, 64])."""
    pats = [rb"\b[a-z]{33,35}\b"]
    t = compile_patterns([parser.parse(p) for p in pats])
    acc_idx = np.where((np.asarray(t.accept) >= 0).any(axis=1))[0]
    assert acc_idx.max() >= 32, (t.n_states, acc_idx)
    st = schain.static_tables(t)
    K, CHL = 8, 2
    grain = K * 8 * CHL
    txt = (b". " + b"x" * 34 + b" " + b"y" * 40 + b" " + b"z" * 33 + b".")
    n = len(txt)
    P = -(-(n + 1) // grain) * grain
    pad = np.zeros(P, np.uint8)
    pad[:n] = np.frombuffer(txt, np.uint8)
    td = jnp.asarray(pad)
    L1, I1 = schain.l_arrays_device_schain(st, td, jnp.int32(n), block=K)
    L2, I2 = schain_pallas.l_arrays_device_schain_fused(
        st, t.n_patterns, td, jnp.int32(n), block=K, chl=CHL,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))
    assert int(np.asarray(L2)[2]) == 2 + 34      # the 34-letter word


@pytest.mark.parametrize(
    "pats", [PATS[0], PATS[5]], ids=["single", "multi"]
)
def test_rolled_scan_bit_equal(pats):
    """The fori_loop (rolled, O(Q)-trace) kernel == the unrolled kernel.

    Runs JITTED in interpret mode: the first rolled formulation
    miscompiled under XLA CPU fusion (bench/NOTES.md "XLA CPU pitfall"),
    the scratch-band form does not — this test is the regression guard
    for exactly that. A disable_jit canary covers the op-by-op ground
    truth below. Hardware lowering: tools/verify_tpu.py --rolled."""
    t = compile_patterns([parser.parse(p) for p in pats])
    st = schain.static_tables(t)
    K, CHL = 8, 8
    P = K * 8 * CHL * 2
    rng = np.random.default_rng(7)
    text = rng.choice(SOUP, size=P).astype(np.uint8)
    td = jnp.asarray(text)
    for n in (P, P - 3, P // 2 + 1, 1):
        L0, I0 = schain_pallas.l_arrays_device_schain_fused(
            st, t.n_patterns, td, jnp.int32(n), block=K, chl=CHL,
            interpret=True,
        )
        L1, I1 = schain_pallas.l_arrays_device_schain_fused(
            st, t.n_patterns, td, jnp.int32(n), block=K, chl=CHL,
            interpret=True, rolled=True,
        )
        np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
        np.testing.assert_array_equal(np.asarray(I0), np.asarray(I1))


def test_rolled_disable_jit_canary():
    """Op-by-op (disable_jit) ground truth for the rolled kernel — the
    arbiter if the jitted differential above ever fails (XLA CPU fusion
    miscompiles reproduce only under jit; see bench/NOTES.md)."""
    import jax

    t = compile_patterns([parser.parse(p) for p in PATS[5]])
    st = schain.static_tables(t)
    K, CHL = 8, 4
    P = K * 8 * CHL * 2
    rng = np.random.default_rng(3)
    text = rng.choice(SOUP, size=P).astype(np.uint8)
    td = jnp.asarray(text)
    n = P - 5
    L0, I0 = schain_pallas.l_arrays_device_schain_fused(
        st, t.n_patterns, td, jnp.int32(n), block=K, chl=CHL,
        interpret=True,
    )
    with jax.disable_jit():
        L1, I1 = schain_pallas.l_arrays_device_schain_fused(
            st, t.n_patterns, td, jnp.int32(n), block=K, chl=CHL,
            interpret=True, rolled=True,
        )
    np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))
    np.testing.assert_array_equal(np.asarray(I0), np.asarray(I1))


def test_rolled_count_and_shard_modes():
    """Rolled kernel in count_only and emit_f (shard) modes == unrolled
    (jitted interpret)."""
    pats = [rb"\b\w+ing\b"]
    t = compile_patterns([parser.parse(p) for p in pats])
    st = schain.static_tables(t)
    K, CHL = 8, 8
    P = K * 8 * CHL * 2
    rng = np.random.default_rng(9)
    text = rng.choice(SOUP, size=P).astype(np.uint8)
    n = jnp.int32(P - 5)
    staged = schain_pallas.stage_text(st, jnp.asarray(text),
                                      block=K, chl=CHL)
    c0 = schain_pallas.count_device_staged(
        st, 1, staged, n, block=K, chl=CHL, interpret=True)
    c1 = schain_pallas.count_device_staged(
        st, 1, staged, n, block=K, chl=CHL, interpret=True, rolled=True)
    assert int(c0) == int(c1)
    Q = t.n_states
    L_u = G_u = None
    for rolled in (False, True):
        out = schain_pallas.call_fused(
            st, 1, staged, n, block=K, chl=CHL, interpret=True,
            seed=schain_pallas.neutral_seed(Q), emit_f=True,
            rolled=rolled,
        )
        if rolled:
            np.testing.assert_array_equal(
                np.asarray(L_u), np.asarray(out[0]))
            np.testing.assert_array_equal(
                np.asarray(G_u), np.asarray(out[2]))
        else:
            L_u, G_u = out[0], out[2]


def test_rolled_large_q_82():
    """Q in (64, 128]: only the ROLLED form reaches it (MAX_Q_ROLLED);
    parity vs the XLA select-chain engine."""
    t = compile_patterns([parser.parse(rb"\b[a-z]{40,80}\b")])
    assert 64 < t.n_states <= 128, t.n_states
    st = schain.static_tables(t)
    K, CHL = 8, 4
    grain = K * 8 * CHL
    txt = (b"x " + b"a" * 50 + b" " + b"b" * 40 + b"." + b"c" * 39
           + b" " + b"d" * 80 + b" " + b"e" * 81)
    n = len(txt)
    P = -(-(n + 1) // grain) * grain
    pad = np.zeros(P, np.uint8)
    pad[:n] = np.frombuffer(txt, np.uint8)
    P2 = -(-P // 1024) * 1024
    pad2 = np.zeros(P2, np.uint8)
    pad2[:n] = pad[:n]
    L1, I1 = schain.l_arrays_device_schain(
        st, jnp.asarray(pad2), jnp.int32(n), block=8)
    L2, I2 = schain_pallas.l_arrays_device_schain_fused(
        st, 1, jnp.asarray(pad), jnp.int32(n), block=K, chl=CHL,
        interpret=True, rolled=True)
    np.testing.assert_array_equal(
        np.asarray(L1)[:n + 1], np.asarray(L2)[:n + 1])
    np.testing.assert_array_equal(
        np.asarray(I1)[:n + 1], np.asarray(I2)[:n + 1])
