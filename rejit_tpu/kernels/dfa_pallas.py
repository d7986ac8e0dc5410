"""Fused Pallas kernels for the DFA pipeline's byte-stepping phases.

The XLA lax.scan/fori_loop forms of phase 1/phase 3 (engine/pipeline.py)
round-trip the (K, nb) state arrays through HBM on every byte-step; these
kernels keep S/m/i in VMEM (registers) across all K statically-unrolled
steps, so HBM traffic drops to "read classes once, write results once".
Same algebra, same results — pipeline selects them on TPU and falls back to
the jnp forms elsewhere (and under interpret-mode tests).

Layouts match engine/pipeline.py: states/thread-rows on sublanes, block
columns on lanes; the packed next+accept table lives in VMEM and every step
is one lane-dimension take_along_axis + ALU ops.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024  # block-columns per grid step


LANE = 128


def _table_gather(tab_row, idx):
    """val[r, l] = table[idx[r, l]] within Mosaic's gather limits.

    tpu.dynamic_gather needs (a) indices and operand of identical shape and
    (b) the operand to span a single vreg (<=128 lanes) along the gathered
    dimension. So: table segments of 128 entries, indices processed in
    128-lane column chunks, segment results merged with selects. Tables with
    Q*C <= 128 (every conformance pattern) use exactly one gather per chunk.
    """
    rows, ch = idx.shape
    QC = tab_row.shape[1]
    nseg = -(-QC // LANE)
    pad = nseg * LANE - QC
    if pad:
        tab_row = jnp.concatenate(
            [tab_row, jnp.zeros((1, pad), jnp.int32)], axis=1
        )
    out_chunks = []
    for c0 in range(0, ch, LANE):
        idx_c = idx[:, c0 : c0 + LANE]
        val = None
        for seg in range(nseg):
            tab_b = jnp.broadcast_to(
                tab_row[:, seg * LANE : (seg + 1) * LANE], (rows, LANE)
            )
            rel = idx_c - seg * LANE
            safe = jnp.clip(rel, 0, LANE - 1)
            g = jnp.take_along_axis(tab_b, safe, axis=-1)
            if val is None:
                val = g
            else:
                val = jnp.where(rel >= 0, g, val)
        out_chunks.append(val)
    return jnp.concatenate(out_chunks, axis=1)


def _p1_kernel(n_ref, tab_ref, cls_ref, f_ref, m_ref, i_ref, *, K, Q, C):
    ch = cls_ref.shape[1]
    i = pl.program_id(0)
    n = n_ref[0]
    tab = tab_ref[:]                                    # (1, Q*C)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
    base = (i * ch + col) * K                           # (1, ch) block base

    S = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0), (Q, ch)
    )
    m = jnp.full((Q, ch), -1, dtype=jnp.int32)
    pid = jnp.full((Q, ch), -1, dtype=jnp.int32)
    for k in range(K):
        c = cls_ref[k, :][None, :]                      # (1, ch)
        pos = base + k
        valid = pos < n                                  # (1, ch)
        val = _table_gather(tab, S * C + c)
        acc = (val & 255) - 1
        hit = valid & (acc >= 0)
        m = jnp.where(hit, pos, m)
        pid = jnp.where(hit, acc, pid)
        S = jnp.where(valid, val >> 8, S)
    f_ref[:] = S
    m_ref[:] = m
    i_ref[:] = pid


@functools.partial(jax.jit, static_argnames=("n_classes", "K", "interpret"))
def phase1_pallas(
    packed: jnp.ndarray,
    n_classes: int,
    cls_kb: jnp.ndarray,
    n: jnp.ndarray,
    *,
    K: int,
    interpret: bool = False,
):
    """(f, m, i) each (nb, Q) — fused phase-1 summaries."""
    Kk, nb = cls_kb.shape
    assert Kk == K and nb % CHUNK == 0
    C = n_classes
    Q = packed.shape[0] // C
    grid = (nb // CHUNK,)
    nlim = jnp.asarray([n], dtype=jnp.int32)
    out = pl.pallas_call(
        functools.partial(_p1_kernel, K=K, Q=Q, C=C),
        out_shape=(
            jax.ShapeDtypeStruct((Q, nb), jnp.int32),
            jax.ShapeDtypeStruct((Q, nb), jnp.int32),
            jax.ShapeDtypeStruct((Q, nb), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Q * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((Q, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(3)
        ),
        interpret=interpret,
    )(nlim, packed.reshape(1, Q * C), cls_kb)
    f, m, pid = out
    return f.T, m.T, pid.T


def _p3_kernel(
    n_ref, tab_ref, posbase_ref, cls_ref, starts_ref, sm_ref, si_ref,
    L_ref, I_ref, *, K, Q, C,
):
    ch = cls_ref.shape[1]
    n = n_ref[0]
    tab = tab_ref[:]                                    # (1, Q*C)
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    # Explicit per-block byte offsets (supports gathered candidate blocks).
    base = posbase_ref[:] + rows                        # (K, ch) boundary pos

    cls = cls_ref[:]                                    # (K, ch)
    zpad = jnp.zeros((K, ch), dtype=jnp.int32)
    S = starts_ref[:]
    m = jnp.full((K, ch), -1, dtype=jnp.int32)
    pid = jnp.full((K, ch), -1, dtype=jnp.int32)
    for j in range(K):
        # Row k consumes byte k+j: classes shifted up by j (static slice).
        c_j = jnp.concatenate([cls[j:], zpad[:j]], axis=0) if j else cls
        pos = base + j
        active = (rows + j < K) & (pos < n)
        val = _table_gather(tab, S * C + c_j)
        acc = (val & 255) - 1
        hit = active & (acc >= 0)
        m = jnp.where(hit, pos, m)
        pid = jnp.where(hit, acc, pid)
        S = jnp.where(active, val >> 8, S)

    # Splice the block's suffix summary (select chain over Q, runs once).
    m_tail = jnp.full((K, ch), -1, dtype=jnp.int32)
    i_tail = jnp.full((K, ch), -1, dtype=jnp.int32)
    for q in range(Q):
        sel = S == q
        m_tail = jnp.where(sel, sm_ref[q, :][None, :], m_tail)
        i_tail = jnp.where(sel, si_ref[q, :][None, :], i_tail)
    later = m_tail >= 0
    L_ref[:] = jnp.where(later, m_tail, m)
    I_ref[:] = jnp.where(later, i_tail, pid)


@functools.partial(jax.jit, static_argnames=("n_classes", "K", "interpret"))
def phase3_pallas(
    packed: jnp.ndarray,
    n_classes: int,
    suf,
    cls_kb: jnp.ndarray,
    startsb: jnp.ndarray,
    n: jnp.ndarray,
    posbase=None,
    *,
    K: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, I) of shape (nb*K,) boundary-ordered — fused phase-3 emission.

    suf: (f, m, i) each (nb, Q) exclusive suffixes (f is not needed:
    deadness is already encoded in m/i). posbase: (nb,) byte offset of each
    block (defaults to contiguous b*K; the FF path passes gathered bases)."""
    Kk, nb = cls_kb.shape
    assert Kk == K and nb % CHUNK == 0
    C = n_classes
    Q = packed.shape[0] // C
    grid = (nb // CHUNK,)
    nlim = jnp.asarray([n], dtype=jnp.int32)
    if posbase is None:
        posbase = jnp.arange(nb, dtype=jnp.int32) * K
    _, m_suf, i_suf = suf
    L, I = pl.pallas_call(
        functools.partial(_p3_kernel, K=K, Q=Q, C=C),
        out_shape=(
            jax.ShapeDtypeStruct((K, nb), jnp.int32),
            jax.ShapeDtypeStruct((K, nb), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Q * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        nlim,
        packed.reshape(1, Q * C),
        posbase[None, :],
        cls_kb,
        startsb,
        m_suf.T,
        i_suf.T,
    )
    P = K * nb
    return L.T.reshape(P), I.T.reshape(P)
