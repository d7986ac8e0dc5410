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


def _combine(a, b):
    """Compose summaries: `a` covers earlier text, `b` the suffix after it."""
    fa, ma, ia = a
    fb, mb, ib = b
    f = jnp.take_along_axis(fb, fa, axis=-1)
    mg = jnp.take_along_axis(mb, fa, axis=-1)
    ig = jnp.take_along_axis(ib, fa, axis=-1)
    later = mg >= 0
    return f, jnp.where(later, mg, ma), jnp.where(later, ig, ia)


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
    Q = ct.n_states

    cls = ct.class_of[text.astype(jnp.int32)]          # (P,)
    ctx = ct.ctx_of[text.astype(jnp.int32)]            # (P,)
    # Start state for a thread beginning at boundary s (0..P-1):
    # s=0 -> CTX_BEGIN state; else by context of byte s-1.
    starts = jnp.concatenate(
        [ct.start_by_ctx[:1], ct.start_by_ctx[ctx[:-1]]]
    )                                                   # (P,)
    start_eot = ct.start_by_ctx[ctx[-1]]                # boundary P

    clsb = cls.reshape(nb, K).T                         # (K, nb)
    posb = jnp.arange(P, dtype=jnp.int32).reshape(nb, K).T
    startsb = starts.reshape(nb, K).T

    ident = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (nb, Q))
    neg = jnp.full((nb, Q), -1, dtype=jnp.int32)

    def bstep(carry, xs):
        f, m, i = carry
        c, pos = xs
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
        return (f, m, i), None

    # Phase 1: per-block summaries (right-to-left within each block).
    xs = (clsb[::-1], posb[::-1])
    (f1, m1, i1), _ = jax.lax.scan(bstep, (ident, neg, neg), xs)

    # Phase 2: exclusive suffix across blocks. Append the EOT seed, scan
    # inclusively from the right, then shift: suffix_excl[b] = incl[b + 1].
    eot_f = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32), (1, Q))
    eot_m = jnp.where(ct.accept_eot >= 0, n, -1)[None, :].astype(jnp.int32)
    eot_i = ct.accept_eot[None, :]
    fs = jnp.concatenate([f1, eot_f], axis=0)           # (nb+1, Q)
    ms = jnp.concatenate([m1, eot_m], axis=0)
    is_ = jnp.concatenate([i1, eot_i], axis=0)
    # With reverse=True, associative_scan feeds the combiner
    # (aggregate-of-later-text, earlier-element) — verified empirically —
    # so swap into _combine's (earlier, later) convention.
    fS, mS, iS = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), (fs, ms, is_), reverse=True, axis=0
    )
    suf = (fS[1:], mS[1:], iS[1:])                      # exclusive, (nb, Q)

    # Phase 3: re-run blocks seeded with their suffix summary, emitting L/I.
    def estep(carry, xs):
        f, m, i = carry
        c, pos, st = xs
        valid = (pos < n)[:, None]
        step_f = jnp.take(ct.nextT, c, axis=0)
        acc = jnp.take(ct.acceptT, c, axis=0)
        f_new = jnp.take_along_axis(f, step_f, axis=1)
        m_g = jnp.take_along_axis(m, step_f, axis=1)
        i_g = jnp.take_along_axis(i, step_f, axis=1)
        later = m_g >= 0
        m_new = jnp.where(later, m_g, jnp.where(acc >= 0, pos[:, None], -1))
        i_new = jnp.where(later, i_g, acc)
        f = jnp.where(valid, f_new, f)
        m = jnp.where(valid, m_new, m)
        i = jnp.where(valid, i_new, i)
        st2 = st[:, None]
        L_k = jnp.take_along_axis(m, st2, axis=1)[:, 0]
        I_k = jnp.take_along_axis(i, st2, axis=1)[:, 0]
        return (f, m, i), (L_k, I_k)

    xs3 = (clsb[::-1], posb[::-1], startsb[::-1])
    _, (Lr, Ir) = jax.lax.scan(estep, suf, xs3)
    L = Lr[::-1].T.reshape(P)                           # boundaries 0..P-1
    I = Ir[::-1].T.reshape(P)

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
