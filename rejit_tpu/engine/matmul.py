"""MXU (matmul) formulation of the DFA sweep.

The gather-based byte-stepping phases (engine/pipeline.py phases 1/3) are
bound by VPU dynamic-gather throughput — measured ~0.6-3.5 s per 10 MB on
v5e, i.e. ~100x below target. This module reformulates both phases as
one-hot boolean matrix algebra so the inner loop runs on the MXU, where
the chip's FLOPs live (TPU-first design rule #1):

  * a DFA step is function composition; with states one-hot, composition
    is boolean matrix product (entries stay exactly 0/1 — bf16-safe);
  * per byte-class transition matrices T[c] ∈ {0,1}^(Q x Q) are contracted
    against the byte's one-hot class vector — a (nb,C) x (C,Q*Q) matmul —
    and the per-state suffix carries (m, i, f) are gathered by a
    (nb,Q) x (Q,) one-hot row product instead of a dynamic gather.

One backward sweep per block (k = K-1..0) produces BOTH the phase-1 block
summaries (carry at k=0) and the per-boundary phase-3 rows (emitted at
each k), sharing phase 2 (suffix_scan) with the reference pipeline.
Cost ≈ (C+3)*Q^2 MACs/byte — e.g. Q=3, C=10: ~120 MACs/byte, which the
MXU does at >100 GB/s equivalent. Exactness: every product row is one-hot,
so each "sum" has exactly one nonzero term; values are small ints
(step < K <= 256, state < Q <= 256, pid+1 <= 255), all exact in bf16.

Outputs are bit-equal to pipeline.l_arrays_device
(tests/unit/test_matmul_engine.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from . import pipeline
from .pipeline import DeviceTables

MAX_BLOCK = 256  # step indices must stay exact in bf16


def _onehot(idx, depth):
    return (idx[..., None] == jnp.arange(depth, dtype=idx.dtype)).astype(
        jnp.bfloat16
    )


@functools.partial(jax.jit, static_argnames=("block",))
def l_arrays_device_matmul(
    ct: DeviceTables,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    block: int = pipeline.DEFAULT_BLOCK,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for pipeline.l_arrays_device (same contract)."""
    P = text.shape[0]
    K = block
    assert P % K == 0 and P > 0 and K <= MAX_BLOCK
    nb = P // K
    Q = ct.n_states
    C = ct.n_classes
    assert Q <= MAX_BLOCK

    packed2d = ct.packed.reshape(Q, C)
    nxt = packed2d >> 8                                  # (Q, C)
    acc = (packed2d & 255) - 1                           # (Q, C) pid | -1
    # T[c, q, r] = [next(q, c) == r]; Ab[c, q] = accepts; Ap[c, q] = pid+1.
    T = (
        nxt.T[:, :, None] == jnp.arange(Q, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)                               # (C, Q, Q)
    Ab = (acc.T >= 0).astype(jnp.bfloat16)               # (C, Q)
    Ap = (acc.T + 1).astype(jnp.bfloat16)                # (C, Q)

    cls, ctx = pipeline.classify(ct, text)
    starts = jnp.concatenate(
        [ct.start_by_ctx[:1], ct.start_by_ctx[ctx[:-1]]]
    )
    start_eot = ct.start_by_ctx[ctx[-1]]
    pos = jnp.arange(P, dtype=jnp.int32)
    cls_kb = pipeline.block_views(cls, nb, K)            # (K, nb)
    pos_kb = pipeline.block_views(pos, nb, K)
    startsb = pipeline.block_views(starts, nb, K)

    f32 = jnp.float32
    m0 = jnp.full((nb, Q), -1.0, f32)
    i0 = jnp.full((nb, Q), -1.0, f32)
    f0 = jnp.broadcast_to(
        jnp.arange(Q, dtype=f32)[None, :], (nb, Q)
    )

    def step(carry, xs):
        m, i, f = carry
        c, p_row, st, k = xs                             # (nb,) each
        valid = (p_row < n)[:, None]                     # (nb, 1)
        oh = _onehot(c, C)                               # (nb, C) bf16
        # z[b] = T[c_b] — one (nb,C)x(C,Q*Q) matmul on the MXU.
        z = jax.lax.dot_general(
            oh, T.reshape(C, Q * Q),
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).reshape(nb, Q, Q)
        zb = z.astype(jnp.bfloat16)
        gather = lambda v: jax.lax.dot_general(
            zb, v.astype(jnp.bfloat16)[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )[:, :, 0]                                       # (nb, Q)
        g_m, g_i, g_f = gather(m), gather(i), gather(f)
        hit = jnp.einsum(
            "bc,cq->bq", oh, Ab, preferred_element_type=f32
        ) > 0.5
        pid = jnp.einsum(
            "bc,cq->bq", oh, Ap, preferred_element_type=f32
        ) - 1.0
        later = g_m >= 0
        k_col = k.astype(f32)[:, None]                   # (nb, 1)
        m_new = jnp.where(later, g_m, jnp.where(hit, k_col, -1.0))
        i_new = jnp.where(later, g_i, jnp.where(hit, pid, -1.0))
        m2 = jnp.where(valid, m_new, m)
        i2 = jnp.where(valid, i_new, i)
        f2 = jnp.where(valid, g_f, f)
        # Emit this boundary's rows: pick the start-state entry.
        oh_st = _onehot(st, Q).astype(f32)               # (nb, Q)
        L_row = jnp.sum(oh_st * m2, axis=1)
        I_row = jnp.sum(oh_st * i2, axis=1)
        F_row = jnp.sum(oh_st * f2, axis=1)
        return (m2, i2, f2), (L_row, I_row, F_row)

    ks = jnp.arange(K - 1, -1, -1, dtype=jnp.int32)
    kb = jnp.broadcast_to(ks[:, None], (K, nb))
    (m_f, i_f, f_f), (L_rows_r, I_rows_r, F_rows_r) = jax.lax.scan(
        step, (m0, i0, f0),
        (cls_kb[::-1], pos_kb[::-1], startsb[::-1], kb),
    )
    # Rows came out in reverse-k order.
    L_rows = L_rows_r[::-1].astype(jnp.int32)            # (K, nb) step | -1
    I_rows = I_rows_r[::-1].astype(jnp.int32)
    F_rows = F_rows_r[::-1].astype(jnp.int32)

    # Phase 1 summaries from the k=0 carry, then the shared phase 2.
    base = (jnp.arange(nb, dtype=jnp.int32) * K)         # (nb,)
    f1 = f_f.astype(jnp.int32)
    m1 = m_f.astype(jnp.int32)
    m1 = jnp.where(m1 >= 0, base[:, None] + m1, -1)
    i1 = i_f.astype(jnp.int32)
    suf = pipeline.suffix_scan((f1, m1, i1), pipeline.eot_seed(ct, n))

    # Phase-3 tail splice: threads alive at block end continue into suf.
    bidx_nb = jnp.arange(nb, dtype=jnp.int32)[None, :]   # (1, nb)
    m_tail = suf[1][bidx_nb, F_rows]                     # (K, nb)
    i_tail = suf[2][bidx_nb, F_rows]
    L_loc = jnp.where(L_rows >= 0, base[None, :] + L_rows, -1)
    later = m_tail >= 0
    L = jnp.where(later, m_tail, L_loc).T.reshape(P)
    I = jnp.where(later, i_tail, I_rows).T.reshape(P)

    L_P = jnp.where(ct.accept_eot[start_eot] >= 0, n, -1).astype(jnp.int32)
    I_P = ct.accept_eot[start_eot]
    L = jnp.concatenate([L, L_P[None]])
    I = jnp.concatenate([I, I_P[None]])
    bidx = jnp.arange(P + 1, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I
