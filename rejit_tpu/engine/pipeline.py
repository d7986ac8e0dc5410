"""JIT-compiled L-array engine: the general match pipeline on device.

TPU-native replacement for rejit's generated matching code (reference:
rejit:src/x64/codegen-x64.cc state-ring hot loops, unverified recall —
SURVEY.md §3.1): instead of per-byte branchy stepping, the text is cut into
blocks and the DFA is run as a *state-map algebra* (see
rejit_tpu/engine/reference.py for the algebra and its numpy validation):

  phase 1  per-block (f, m, i) suffix summaries — lax.scan over block bytes,
           batched over all blocks; transitions via take_along_axis (lane
           -dimension dynamic gather, fast on TPU VPU)
  phase 2  jax.lax.associative_scan (reverse) composing block summaries —
           the "simultaneous DFA" construction (PAPERS.md:8,:9)
  phase 3  re-run blocks seeded with their suffix summary, emitting
           L[s] = longest match end from s, I[s] = pattern id, for every s

Everything is static-shaped: texts are padded to a block multiple and the
true length `n` is a device scalar; steps past `n` are identity, which makes
padding semantically invisible (EOT acceptance is injected by the scan seed).

The same phases power the sharded multi-device path
(rejit_tpu/dist/sharded.py): phase 2 simply extends across shards.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compile.dfa import DFATables

jax.config.update("jax_enable_x64", False)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceTables:
    """Device-resident, replicated DFA tables (CompiledPattern payload)."""

    class_of: jnp.ndarray   # (256,) int32: byte -> class
    nextT: jnp.ndarray      # (C, Q) int32: class-major transition
    acceptT: jnp.ndarray    # (C, Q) int32: pattern id or -1
    accept_eot: jnp.ndarray  # (Q,) int32
    start_by_ctx: jnp.ndarray  # (4,) int32
    ctx_of: jnp.ndarray     # (256,) int32: byte -> context class

    def tree_flatten(self):
        return (
            (self.class_of, self.nextT, self.acceptT, self.accept_eot,
             self.start_by_ctx, self.ctx_of),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_states(self) -> int:
        return self.nextT.shape[1]


def device_tables(t: DFATables) -> DeviceTables:
    return DeviceTables(
        class_of=jnp.asarray(t.class_of, dtype=jnp.int32),
        nextT=jnp.asarray(t.next.T, dtype=jnp.int32),
        acceptT=jnp.asarray(t.accept.T, dtype=jnp.int32),
        accept_eot=jnp.asarray(t.accept_eot, dtype=jnp.int32),
        start_by_ctx=jnp.asarray(t.start_states, dtype=jnp.int32),
        ctx_of=jnp.asarray(t.ctx_table(), dtype=jnp.int32),
    )


def combine(a, b):
    """Compose summaries: `a` covers earlier text, `b` the suffix after it.

    Each summary is (f, m, i) with state-indexed last axis (reference.py
    documents the algebra and its associativity)."""
    fa, ma, ia = a
    fb, mb, ib = b
    f = jnp.take_along_axis(fb, fa, axis=-1)
    mg = jnp.take_along_axis(mb, fa, axis=-1)
    ig = jnp.take_along_axis(ib, fa, axis=-1)
    later = mg >= 0
    return f, jnp.where(later, mg, ma), jnp.where(later, ig, ia)


def _masked_step(ct: DeviceTables, carry, c, pos, n):
    """One backward byte-step of the (f, m, i) summary; identity past n."""
    f, m, i = carry
    valid = (pos < n)[:, None]
    step_f = jnp.take(ct.nextT, c, axis=0)          # (nb, Q)
    acc = jnp.take(ct.acceptT, c, axis=0)           # (nb, Q)
    f_new = jnp.take_along_axis(f, step_f, axis=1)
    m_g = jnp.take_along_axis(m, step_f, axis=1)
    i_g = jnp.take_along_axis(i, step_f, axis=1)
    later = m_g >= 0
    m_new = jnp.where(later, m_g, jnp.where(acc >= 0, pos[:, None], -1))
    i_new = jnp.where(later, i_g, acc)
    f = jnp.where(valid, f_new, f)
    m = jnp.where(valid, m_new, m)
    i = jnp.where(valid, i_new, i)
    return f, m, i


def phase1_summaries(ct: DeviceTables, clsb, posb, n):
    """Per-block (f, m, i) summaries. clsb/posb are (K, nb) byte-reversed
    column-major views (row k = byte K-1-k of each block)."""
    nb = clsb.shape[1]
    Q = ct.n_states
    ident = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (nb, Q))
    neg = jnp.full((nb, Q), -1, dtype=jnp.int32)

    def bstep(carry, xs):
        c, pos = xs
        return _masked_step(ct, carry, c, pos, n), None

    (f, m, i), _ = jax.lax.scan(bstep, (ident, neg, neg), (clsb, posb))
    return f, m, i


def suffix_scan(summaries, tail):
    """Exclusive suffix composition across the block axis (axis 0).

    `tail` is the summary of everything after the last block (EOT seed, or a
    cross-shard suffix). Returns per-block exclusive suffixes."""
    fs = jnp.concatenate([summaries[0], tail[0][None]], axis=0)
    ms = jnp.concatenate([summaries[1], tail[1][None]], axis=0)
    is_ = jnp.concatenate([summaries[2], tail[2][None]], axis=0)
    # With reverse=True, associative_scan feeds the combiner
    # (aggregate-of-later-text, earlier-element) — verified empirically —
    # so swap into combine's (earlier, later) convention.
    fS, mS, iS = jax.lax.associative_scan(
        lambda a, b: combine(b, a), (fs, ms, is_), reverse=True, axis=0
    )
    return fS[1:], mS[1:], iS[1:]


def phase3_emit(ct: DeviceTables, suf, clsb, posb, startsb, n):
    """Seeded backward re-run emitting (L, I) per boundary.

    Returns (L, I) of shape (nb*K,), boundary-ordered."""
    def estep(carry, xs):
        c, pos, st = xs
        f, m, i = _masked_step(ct, carry, c, pos, n)
        st2 = st[:, None]
        L_k = jnp.take_along_axis(m, st2, axis=1)[:, 0]
        I_k = jnp.take_along_axis(i, st2, axis=1)[:, 0]
        return (f, m, i), (L_k, I_k)

    _, (Lr, Ir) = jax.lax.scan(estep, suf, (clsb, posb, startsb))
    P = Lr.size
    L = Lr[::-1].T.reshape(P)
    I = Ir[::-1].T.reshape(P)
    return L, I


def eot_seed(ct: DeviceTables, n):
    Q = ct.n_states
    f = jnp.arange(Q, dtype=jnp.int32)
    m = jnp.where(ct.accept_eot >= 0, n, -1).astype(jnp.int32)
    return f, m, ct.accept_eot


def classify(ct: DeviceTables, text):
    """(cls, ctx) int32 arrays for a uint8 text."""
    ti = text.astype(jnp.int32)
    return ct.class_of[ti], ct.ctx_of[ti]


def block_views(arr, nb: int, K: int):
    """(P,) -> (K, nb) byte-reversed column-major view for the scans."""
    return arr.reshape(nb, K).T[::-1]


@functools.partial(jax.jit, static_argnames=("block",))
def l_arrays_device(
    ct: DeviceTables, text: jnp.ndarray, n: jnp.ndarray, *, block: int = 256
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, I) int32 arrays of length P+1 (P = padded length).

    Entries for boundaries > n are -1. `text` must be uint8 of length P,
    a multiple of `block`; `n` is the true byte length (int32 scalar).
    """
    P = text.shape[0]
    K = block
    assert P % K == 0 and P > 0
    nb = P // K

    cls, ctx = classify(ct, text)
    # Start state for a thread beginning at boundary s (0..P-1):
    # s=0 -> CTX_BEGIN state; else by context of byte s-1.
    starts = jnp.concatenate(
        [ct.start_by_ctx[:1], ct.start_by_ctx[ctx[:-1]]]
    )
    start_eot = ct.start_by_ctx[ctx[-1]]                # boundary P

    pos = jnp.arange(P, dtype=jnp.int32)
    clsb = block_views(cls, nb, K)
    posb = block_views(pos, nb, K)
    startsb = block_views(starts, nb, K)

    summaries = phase1_summaries(ct, clsb, posb, n)
    suf = suffix_scan(summaries, eot_seed(ct, n))
    suf0 = (suf[0], suf[1], suf[2])
    L, I = phase3_emit(ct, suf0, clsb, posb, startsb, n)

    # Boundary P from the bare EOT seed; boundaries > n masked to -1.
    L_P = jnp.where(ct.accept_eot[start_eot] >= 0, n, -1).astype(jnp.int32)
    I_P = ct.accept_eot[start_eot]
    L = jnp.concatenate([L, L_P[None]])
    I = jnp.concatenate([I, I_P[None]])
    bidx = jnp.arange(P + 1, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I


def l_arrays(
    t_or_ct, text: np.ndarray, n: int, *, block: int = 256
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: numpy in (already padded), numpy out (trimmed to n+1)."""
    ct = device_tables(t_or_ct) if isinstance(t_or_ct, DFATables) else t_or_ct
    L, I = l_arrays_device(
        ct, jnp.asarray(text, dtype=jnp.uint8), jnp.int32(n), block=block
    )
    return np.asarray(L)[: n + 1], np.asarray(I)[: n + 1]
