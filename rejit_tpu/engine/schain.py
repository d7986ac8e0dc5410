"""Gather-free select-chain DFA engine.

Measurement on the v5e (bench/NOTES.md) shows per-byte DYNAMIC GATHERS are
the enemy: compare/select ops run at ~500 GB/s-class throughput (literal
engine) while every dynamic-gather formulation of the DFA — lane
take_along_axis (engine/pipeline.py), fused Pallas dynamic_gather
(kernels/dfa_pallas.py), even one-hot matmuls at small Q
(engine/matmul.py, MXU utilization Q^2/128^2) — lands at 0.5-3.5 s per
10 MB. Even a single 256-entry byte->class LUT gather per byte costs
~80 ms / 10 MB.

This engine eliminates every dynamic gather:

  * the transition tables are STATIC at trace time (passed as hashable
    tuples), so "gather m at next(q, c)" becomes, per byte class c, a
    static column permutation `m[:, perm_c]` blended by the compare mask
    `cls == c` — a chain of C vector selects;
  * byte->class and byte->context lookups become range compares over the
    host-computed run-length form of the 256-entry tables;
  * phase-2 combine and the phase-3 tail splice use Q-term select chains
    (Q is small after minimization).

Cost ≈ 3*C*Q + O(C + Q) vector element-ops per byte — e.g. Q=3, C=10:
~120 ops/byte, vs the gather paths' effective ~300+ BYTES/s/op. Outputs
are bit-equal to pipeline.l_arrays_device
(tests/unit/test_matmul_engine.py::test_schain_bit_equal).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compile.dfa import DFATables
from . import pipeline

def _runs(table: np.ndarray):
    """Run-length encode a 256-entry table -> ((lo, hi, value), ...)."""
    out = []
    lo = 0
    for b in range(1, 257):
        if b == 256 or table[b] != table[lo]:
            out.append((lo, b - 1, int(table[lo])))
            lo = b
    return tuple(out)


def static_tables(t: DFATables):
    """Hashable static form of the tables for jit closure-by-staticarg."""
    return (
        _runs(np.asarray(t.class_of)),
        _runs(t.ctx_table()),
        tuple(tuple(int(x) for x in t.next[:, c]) for c in range(t.n_classes)),
        tuple(tuple(int(x) for x in t.accept[:, c]) for c in range(t.n_classes)),
        tuple(int(x) for x in t.start_states),
        tuple(int(x) for x in t.accept_eot),
    )


def _by_runs(b, runs, dtype=jnp.int32):
    """Elementwise table lookup via range compares (no gather)."""
    out = jnp.zeros(b.shape, dtype)
    for lo, hi, v in runs:
        if v == 0:
            continue
        m = (b >= lo) & (b <= hi) if lo != hi else (b == lo)
        out = jnp.where(m, jnp.asarray(v, dtype), out)
    return out


def _sel_q(idx, cols):
    """result[..., q] = cols_value_at(idx[..., q]) via Q-term select.

    idx: (..., Q) int32 state indices; cols: (..., Q) source (same batch),
    selecting source column idx: out[b, q] = src[b, idx[b, q]].
    """
    Q = cols.shape[-1]
    out = jnp.full(idx.shape, -1, cols.dtype)
    for q in range(Q):
        out = jnp.where(idx == q, cols[..., q : q + 1], out)
    return out


def _combine_schain(a, b):
    """pipeline.combine with the lane gather replaced by Q-term selects."""
    fa, ma, ia = a
    fb, mb, ib = b
    f = _sel_q(fa, fb)
    mg = _sel_q(fa, mb)
    ig = _sel_q(fa, ib)
    later = mg >= 0
    return f, jnp.where(later, mg, ma), jnp.where(later, ig, ia)


def _suffix_scan_schain(summaries, tail):
    """pipeline.suffix_scan with the select-chain combine."""
    f, m, i = summaries
    nb, Q = f.shape
    ident = (
        jnp.arange(Q, dtype=jnp.int32)[None, :],
        jnp.full((1, Q), -1, jnp.int32),
        jnp.full((1, Q), -1, jnp.int32),
    )

    def shift(x, d, fill_row):
        pad = jnp.broadcast_to(fill_row, (min(d, nb), Q))
        return jnp.concatenate([x[d:], pad], axis=0)

    S = (
        shift(f, 1, tail[0][None, :]),
        shift(m, 1, tail[1][None, :]),
        shift(i, 1, tail[2][None, :]),
    )
    d = 1
    while d < nb:
        shifted = (
            shift(S[0], d, ident[0]),
            shift(S[1], d, ident[1]),
            shift(S[2], d, ident[2]),
        )
        S = _combine_schain(S, shifted)
        d *= 2
    return S


def finish_scan(
    L_bk, I_bk, F_bk, m_f, i_f, f_f, *, accept_eot, start_eot, n, K
):
    """Phase 2 + tail splice shared by the XLA and fused-Pallas scans.

    L_bk/I_bk/F_bk: (nb, K) per-boundary emissions (L block-relative);
    m_f/i_f/f_f: (nb, Q) final block summaries (m block-relative);
    accept_eot: static tuple; start_eot: device scalar (state at boundary P).
    Returns (L, I) of length P+1 with entries past n masked to -1.
    """
    nb, Kk = L_bk.shape
    assert Kk == K
    Q = f_f.shape[1]
    P = nb * K

    base = jnp.arange(nb, dtype=jnp.int32) * K
    m1 = jnp.where(m_f >= 0, base[:, None] + m_f, -1)
    eot = (
        jnp.arange(Q, dtype=jnp.int32),
        jnp.where(jnp.asarray(accept_eot, jnp.int32) >= 0, n, -1).astype(
            jnp.int32
        ),
        jnp.asarray(accept_eot, jnp.int32),
    )
    suf = _suffix_scan_schain((f_f, m1, i_f), eot)

    # Tail splice via Q-term selects on (nb, K).
    m_tail = jnp.full((nb, K), -1, jnp.int32)
    i_tail = jnp.full((nb, K), -1, jnp.int32)
    for q in range(Q):
        sel = F_bk == q
        m_tail = jnp.where(sel, suf[1][:, q][:, None], m_tail)
        i_tail = jnp.where(sel, suf[2][:, q][:, None], i_tail)
    L_loc = jnp.where(L_bk >= 0, base[:, None] + L_bk, -1)
    later = m_tail >= 0
    L = jnp.where(later, m_tail, L_loc).reshape(P)
    I = jnp.where(later, i_tail, I_bk).reshape(P)

    ae = jnp.asarray(accept_eot, jnp.int32)
    eot_pid = _sel_q(start_eot[None, None], ae[None, :])[0, 0]
    L_P = jnp.where(eot_pid >= 0, n, -1).astype(jnp.int32)
    L = jnp.concatenate([L, L_P[None]])
    I = jnp.concatenate([I, eot_pid[None]])
    bidx = jnp.arange(P + 1, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I


@functools.partial(jax.jit, static_argnames=("st", "block"))
def l_arrays_device_schain(
    st,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    block: int = pipeline.DEFAULT_BLOCK,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for pipeline.l_arrays_device; `st` = static_tables(tables)."""
    cls_runs, ctx_runs, nxt_cols, acc_cols, start_by_ctx, accept_eot = st
    C = len(nxt_cols)
    Q = len(nxt_cols[0])
    P = text.shape[0]
    K = block
    assert P % K == 0 and P > 0
    nb = P // K

    b = text.astype(jnp.int32)
    cls = _by_runs(b, cls_runs)
    ctx = _by_runs(b, ctx_runs)
    sbc = jnp.asarray(start_by_ctx, dtype=jnp.int32)
    starts = jnp.concatenate(
        [sbc[:1], _by_runs(b[:-1], tuple(
            (lo, hi, start_by_ctx[v]) for lo, hi, v in ctx_runs
        ))]
    )
    # start state of the EOT boundary (context = last byte).
    start_eot = _by_runs(b[-1:], tuple(
        (lo, hi, start_by_ctx[v]) for lo, hi, v in ctx_runs
    ))[0]

    pos = jnp.arange(P, dtype=jnp.int32)
    cls_kb = pipeline.block_views(cls, nb, K)
    pos_kb = pipeline.block_views(pos, nb, K)
    startsb = pipeline.block_views(starts, nb, K)

    m0 = jnp.full((nb, Q), -1, jnp.int32)
    i0 = jnp.full((nb, Q), -1, jnp.int32)
    f0 = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None, :], (nb, Q))

    def step(carry, xs):
        m, i, f = carry
        c, p_row, stt, k = xs                            # (nb,) each
        valid = (p_row < n)[:, None]
        mc = [(c == cc)[:, None] for cc in range(C)]     # C masks (nb, 1)
        g_m = jnp.full((nb, Q), -1, jnp.int32)
        g_i = jnp.full((nb, Q), -1, jnp.int32)
        g_f = f0
        hit = jnp.zeros((nb, Q), jnp.bool_)
        pid = jnp.full((nb, Q), -1, jnp.int32)
        for cc in range(C):
            perm = list(nxt_cols[cc])                    # static ints
            g_m = jnp.where(mc[cc], m[:, perm], g_m)
            g_i = jnp.where(mc[cc], i[:, perm], g_i)
            g_f = jnp.where(mc[cc], f[:, perm], g_f)
            arow = acc_cols[cc]                          # static pids
            hrow = jnp.asarray([a >= 0 for a in arow], jnp.bool_)
            prow = jnp.asarray(arow, jnp.int32)
            hit = jnp.where(mc[cc], hrow[None, :], hit)
            pid = jnp.where(mc[cc], prow[None, :], pid)
        later = g_m >= 0
        k_col = k[:, None]
        m_new = jnp.where(later, g_m, jnp.where(hit, k_col, -1))
        i_new = jnp.where(later, g_i, jnp.where(hit, pid, -1))
        m2 = jnp.where(valid, m_new, m)
        i2 = jnp.where(valid, i_new, i)
        f2 = jnp.where(valid, g_f, f)
        # Per-boundary emission at the boundary's start state (Q selects).
        stt_q = stt[:, None]
        L_row = _sel_q(
            jnp.broadcast_to(stt_q, (nb, 1)), m2
        )[:, 0]
        I_row = _sel_q(jnp.broadcast_to(stt_q, (nb, 1)), i2)[:, 0]
        F_row = _sel_q(jnp.broadcast_to(stt_q, (nb, 1)), f2)[:, 0]
        return (m2, i2, f2), (L_row, I_row, F_row)

    ks = jnp.arange(K - 1, -1, -1, dtype=jnp.int32)
    kb = jnp.broadcast_to(ks[:, None], (K, nb))
    (m_f, i_f, f_f), (L_r, I_r, F_r) = jax.lax.scan(
        step, (m0, i0, f0),
        (cls_kb[::-1], pos_kb[::-1], startsb[::-1], kb),
    )
    return finish_scan(
        L_r[::-1].T, I_r[::-1].T, F_r[::-1].T, m_f, i_f, f_f,
        accept_eot=accept_eot, start_eot=start_eot, n=n, K=K,
    )
