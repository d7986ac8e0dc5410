"""JIT-compiled L-array engine: the general match pipeline on device.

TPU-native replacement for rejit's generated matching code (reference:
rejit:src/x64/codegen-x64.cc state-ring hot loops, unverified recall —
SURVEY.md §3.1). The text is cut into blocks of K bytes and the DFA runs as a
*state-map algebra* (rejit_tpu/engine/reference.py documents the algebra and
is its numpy validation):

  phase 1  per-block forward (f, m, i) summaries: f = end state per start
           state, m/i = last accepting boundary + pattern id
  phase 2  doubling scan composing block summaries — the "simultaneous
           DFA" construction (PAPERS.md:8,:9)
  phase 3  per-position forward threads (one per boundary) run to their
           block end, then splice the block's suffix summary, emitting
           L[s] = longest match end from s and I[s] = pattern id

TPU layout decisions (measured, not guessed — the naive (blocks, Q) layout
with Q on the 128-lane axis ran ~1000x slower):
  * big state arrays put the SMALL axis (Q states / K thread rows) on
    sublanes and the LARGE axis (blocks) on lanes;
  * (next, accept) are packed into one int32 flat table so each byte-step is
    a single lane-dimension take_along_axis (TPU dynamic gather) + ALU ops;
  * cross-state combines on small per-block arrays (phase 2 / suffix splice)
    use take_along_axis on a (blocks, Q) layout or Q-term select chains —
    they run once per block, not once per byte.

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

DEFAULT_BLOCK = 32


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceTables:
    """Device-resident, replicated DFA tables (CompiledPattern payload)."""

    class_of: jnp.ndarray    # (256,) int32: byte -> class
    packed: jnp.ndarray      # (Q*C,) int32: next*256 + (accept_pid+1)
    accept_eot: jnp.ndarray  # (Q,) int32
    start_by_ctx: jnp.ndarray  # (4,) int32
    ctx_of: jnp.ndarray      # (256,) int32: byte -> context class
    n_classes: int
    dead: int
    ff_class: jnp.ndarray    # (C,) int32: fast-forward candidate classes

    def tree_flatten(self):
        return (
            (self.class_of, self.packed, self.accept_eot,
             self.start_by_ctx, self.ctx_of, self.ff_class),
            (self.n_classes, self.dead),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:5], n_classes=aux[0], dead=aux[1],
                   ff_class=children[5])

    @property
    def n_states(self) -> int:
        return self.packed.shape[0] // self.n_classes


def ff_class_mask(t: DFATables) -> np.ndarray:
    """(C,) 0/1: byte classes on which a *fresh* thread can make progress
    (move off dead, or accept immediately). A boundary whose byte class is
    not in this set provably has L[s] = -1, so its block can skip phase 3.
    Sound for every pattern (nullable/assertion starts included: acceptance
    terms keep their classes candidates). This is the table-level analog of
    rejit's fast-forward element set (SURVEY.md §2.1/C4)."""
    mask = np.zeros(t.n_classes, dtype=np.int32)
    for s in set(int(x) for x in t.start_states):
        mask |= (
            (t.next[s] != t.dead) | (t.accept[s] >= 0)
        ).astype(np.int32)
    return mask


def device_tables(t: DFATables) -> DeviceTables:
    assert t.n_patterns < 255, "pattern id must fit packed accept byte"
    packed = (
        t.next.astype(np.int32) * 256
        + (t.accept.astype(np.int32) + 1)
    ).reshape(-1)
    return DeviceTables(
        class_of=jnp.asarray(t.class_of, dtype=jnp.int32),
        packed=jnp.asarray(packed, dtype=jnp.int32),
        accept_eot=jnp.asarray(t.accept_eot, dtype=jnp.int32),
        start_by_ctx=jnp.asarray(t.start_states, dtype=jnp.int32),
        ctx_of=jnp.asarray(t.ctx_table(), dtype=jnp.int32),
        n_classes=t.n_classes,
        dead=t.dead,
        ff_class=jnp.asarray(ff_class_mask(t), dtype=jnp.int32),
    )


# ---------------------------------------------------------------------------
# Summary algebra on (nb, Q) arrays (used once per block, not per byte)
# ---------------------------------------------------------------------------


def combine(a, b):
    """Compose summaries: `a` covers earlier text, `b` the suffix after it.

    Each summary is (f, m, i) with a state-indexed LAST axis."""
    fa, ma, ia = a
    fb, mb, ib = b
    f = jnp.take_along_axis(fb, fa, axis=-1)
    mg = jnp.take_along_axis(mb, fa, axis=-1)
    ig = jnp.take_along_axis(ib, fa, axis=-1)
    later = mg >= 0
    return f, jnp.where(later, mg, ma), jnp.where(later, ig, ia)


def suffix_scan(summaries, tail):
    """Exclusive suffix composition across the block axis (axis 0).

    summaries: (f, m, i) each (nb, Q); tail: (Q,) summary of everything after
    the last block (EOT seed or cross-shard suffix). Returns per-block
    exclusive suffixes, each (nb, Q).

    Implemented as a manual Hillis-Steele doubling scan: S[j] ⊕= S[j+d] for
    d = 1,2,4,... with identity padding. jax.lax.associative_scan's Blelloch
    -style lowering produced multi-minute XLA compiles at large nb; this
    form is log2(nb) simple shift+combine levels and compiles fast."""
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

    # Exclusive seed: S0[j] = elems[j+1], with `tail` after the last block.
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
        S = combine(S, shifted)
        d *= 2
    return S


def eot_seed(ct: DeviceTables, n):
    Q = ct.n_states
    f = jnp.arange(Q, dtype=jnp.int32)
    m = jnp.where(ct.accept_eot >= 0, n, -1).astype(jnp.int32)
    return f, m, ct.accept_eot


# ---------------------------------------------------------------------------
# Phase 1: per-block forward summaries, states on sublanes
# ---------------------------------------------------------------------------


def phase1_summaries(ct: DeviceTables, cls_kb, pos_kb, n):
    """Per-block forward (f, m, i) summaries.

    cls_kb/pos_kb: (K, nb) forward order (row k = byte k of each block).
    Returns (f, m, i) each (nb, Q) for the suffix scan."""
    K, nb = cls_kb.shape
    Q = ct.n_states
    C = ct.n_classes
    tab = jnp.broadcast_to(ct.packed[None, :], (Q, Q * C))

    S0 = jnp.broadcast_to(
        jnp.arange(Q, dtype=jnp.int32)[:, None], (Q, nb)
    )
    neg = jnp.full((Q, nb), -1, dtype=jnp.int32)

    def step(carry, xs):
        S, m, i = carry
        c, pos = xs                                   # (nb,)
        valid = (pos < n)[None, :]
        val = jnp.take_along_axis(tab, S * C + c[None, :], axis=-1)
        acc = (val & 255) - 1
        hit = valid & (acc >= 0)
        m = jnp.where(hit, pos[None, :], m)
        i = jnp.where(hit, acc, i)
        S = jnp.where(valid, val >> 8, S)
        return (S, m, i), None

    (S, m, i), _ = jax.lax.scan(step, (S0, neg, neg), (cls_kb, pos_kb))
    return S.T, m.T, i.T


# ---------------------------------------------------------------------------
# Phase 3: per-position forward threads, thread rows on sublanes
# ---------------------------------------------------------------------------


def phase3_emit(ct: DeviceTables, suf, cls_kb, pos_kb, startsb, n):
    """Per-boundary thread emission.

    suf: (f, m, i) each (nb, Q) — exclusive suffix after each block.
    cls_kb/pos_kb/startsb: (K, nb) forward order.
    Returns (L, I) of shape (K*nb,), boundary-ordered (b*K + k)."""
    K, nb = cls_kb.shape
    Q = ct.n_states
    C = ct.n_classes
    tab = jnp.broadcast_to(ct.packed[None, :], (K, Q * C))

    # Row k holds the thread starting at in-block offset k; at step j it
    # consumes byte k+j, i.e. row k of cls shifted up by j.
    cls_pad = jnp.concatenate(
        [cls_kb, jnp.zeros((K, nb), dtype=jnp.int32)], axis=0
    )
    rows = jnp.arange(K, dtype=jnp.int32)[:, None]     # (K, 1)

    S = startsb
    m = jnp.full((K, nb), -1, dtype=jnp.int32)
    i = jnp.full((K, nb), -1, dtype=jnp.int32)

    def step(j, carry):
        S, m, i = carry
        c_j = jax.lax.dynamic_slice(cls_pad, (j, 0), (K, nb))
        pos_j = pos_kb + j
        active = (rows + j < K) & (pos_j < n)
        val = jnp.take_along_axis(tab, S * C + c_j, axis=-1)
        acc = (val & 255) - 1
        hit = active & (acc >= 0)
        m = jnp.where(hit, pos_j, m)
        i = jnp.where(hit, acc, i)
        S = jnp.where(active, val >> 8, S)
        return (S, m, i)

    S, m, i = jax.lax.fori_loop(0, K, step, (S, m, i))

    # Splice the block's suffix summary for threads alive at block end:
    # Q-term select chain (runs once per block, not per byte).
    f_suf, m_suf, i_suf = suf
    m_tail = jnp.full((K, nb), -1, dtype=jnp.int32)
    i_tail = jnp.full((K, nb), -1, dtype=jnp.int32)
    for q in range(Q):
        sel = S == q
        m_tail = jnp.where(sel, m_suf[:, q][None, :], m_tail)
        i_tail = jnp.where(sel, i_suf[:, q][None, :], i_tail)
    later = m_tail >= 0
    L = jnp.where(later, m_tail, m)
    I = jnp.where(later, i_tail, i)
    return L.T.reshape(K * nb), I.T.reshape(K * nb)


def classify(ct: DeviceTables, text):
    """(cls, ctx) int32 arrays for a uint8 text."""
    ti = text.astype(jnp.int32)
    return ct.class_of[ti], ct.ctx_of[ti]


def block_views(arr, nb: int, K: int):
    """(P,) -> (K, nb) forward column-major view (row k = byte k of block)."""
    return arr.reshape(nb, K).T


@functools.partial(jax.jit, static_argnames=("block",))
def l_arrays_device(
    ct: DeviceTables,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
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
    cls_kb = block_views(cls, nb, K)
    pos_kb = block_views(pos, nb, K)
    startsb = block_views(starts, nb, K)

    summaries = phase1_summaries(ct, cls_kb, pos_kb, n)
    suf = suffix_scan(summaries, eot_seed(ct, n))
    L, I = phase3_emit(ct, suf, cls_kb, pos_kb, startsb, n)

    # Boundary P from the bare EOT seed; boundaries > n masked to -1.
    L_P = jnp.where(ct.accept_eot[start_eot] >= 0, n, -1).astype(jnp.int32)
    I_P = ct.accept_eot[start_eot]
    L = jnp.concatenate([L, L_P[None]])
    I = jnp.concatenate([I, I_P[None]])
    bidx = jnp.arange(P + 1, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I


# ---------------------------------------------------------------------------
# Fused Pallas execution path (VMEM-resident byte stepping)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def l_arrays_device_pallas(
    ct: DeviceTables,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """l_arrays_device with phases 1/3 as fused Pallas kernels.

    Requires nb (= len(text)/block) to be a multiple of the kernel CHUNK;
    api padding guarantees this for the default sizes."""
    from ..kernels import dfa_pallas

    P = text.shape[0]
    K = block
    nb = P // K

    cls, ctx = classify(ct, text)
    starts = jnp.concatenate([ct.start_by_ctx[:1], ct.start_by_ctx[ctx[:-1]]])
    start_eot = ct.start_by_ctx[ctx[-1]]
    cls_kb = block_views(cls, nb, K)
    startsb = block_views(starts, nb, K)

    summaries = dfa_pallas.phase1_pallas(
        ct.packed, ct.n_classes, cls_kb, n, K=K, interpret=interpret
    )
    suf = suffix_scan(summaries, eot_seed(ct, n))
    L, I = dfa_pallas.phase3_pallas(
        ct.packed, ct.n_classes, suf, cls_kb, startsb, n,
        K=K, interpret=interpret,
    )

    L_P = jnp.where(ct.accept_eot[start_eot] >= 0, n, -1).astype(jnp.int32)
    I_P = ct.accept_eot[start_eot]
    L = jnp.concatenate([L, L_P[None]])
    I = jnp.concatenate([I, I_P[None]])
    bidx = jnp.arange(P + 1, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I


# ---------------------------------------------------------------------------
# Fast-forward filtered execution: phase 3 only on candidate blocks
# ---------------------------------------------------------------------------


def _views(ct, text, n, block):
    P = text.shape[0]
    K = block
    nb = P // K
    cls, ctx = classify(ct, text)
    starts = jnp.concatenate([ct.start_by_ctx[:1], ct.start_by_ctx[ctx[:-1]]])
    pos = jnp.arange(P, dtype=jnp.int32)
    return (
        block_views(cls, nb, K),
        block_views(pos, nb, K),
        block_views(starts, nb, K),
        ctx,
    )


@functools.partial(jax.jit, static_argnames=("block", "use_pallas"))
def ff_phase12(
    ct: DeviceTables, text, n, *, block: int = DEFAULT_BLOCK,
    use_pallas: bool = False,
):
    """Phase 1+2 plus the candidate-block mask. Returns
    (suf (nb,Q) x3, cand_block (nb,) bool, n_cand_blocks)."""
    P = text.shape[0]
    K = block
    nb = P // K
    cls_kb, pos_kb, _startsb, _ctx = _views(ct, text, n, block)
    if use_pallas:
        from ..kernels import dfa_pallas

        summaries = dfa_pallas.phase1_pallas(
            ct.packed, ct.n_classes, cls_kb, n, K=K
        )
    else:
        summaries = phase1_summaries(ct, cls_kb, pos_kb, n)
    suf = suffix_scan(summaries, eot_seed(ct, n))
    is_cand = (ct.ff_class[cls_kb] > 0) & (pos_kb < n)      # (K, nb)
    cand_block = jnp.any(is_cand, axis=0)                   # (nb,)
    # The block holding boundary n must run (it emits L[n] via the seed).
    holds_n = (pos_kb[0] <= n) & (n < pos_kb[0] + K)
    cand_block = cand_block | holds_n
    return suf, cand_block, jnp.sum(cand_block, dtype=jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("block", "cap", "use_pallas")
)
def ff_phase3(
    ct: DeviceTables, text, n, suf, cand_block,
    *, block: int = DEFAULT_BLOCK, cap: int = 1, use_pallas: bool = False,
):
    """Phase 3 restricted to candidate blocks, scattered back to (P+1,)."""
    P = text.shape[0]
    K = block
    nb = P // K
    cls_kb, pos_kb, startsb, ctx = _views(ct, text, n, block)

    (idx,) = jnp.nonzero(cand_block, size=cap, fill_value=nb)
    safe = jnp.minimum(idx, nb - 1)
    cls_c = cls_kb[:, safe]
    pos_c = jnp.where(idx[None, :] < nb, pos_kb[:, safe], n)  # masked cols
    starts_c = startsb[:, safe]
    suf_c = tuple(x[safe] for x in suf)

    if use_pallas:
        from ..kernels import dfa_pallas

        L_c, I_c = dfa_pallas.phase3_pallas(
            ct.packed, ct.n_classes, suf_c, cls_c, starts_c, n,
            posbase=pos_c[0], K=K,
        )
    else:
        L_c, I_c = phase3_emit(ct, suf_c, cls_c, pos_c, starts_c, n)
    L2 = jnp.full((nb, K), -1, dtype=jnp.int32)
    I2 = jnp.full((nb, K), -1, dtype=jnp.int32)
    L2 = L2.at[idx].set(L_c.reshape(cap, K), mode="drop")
    I2 = I2.at[idx].set(I_c.reshape(cap, K), mode="drop")
    L = L2.reshape(P)
    I = I2.reshape(P)

    start_eot = ct.start_by_ctx[ctx[-1]]
    L_P = jnp.where(ct.accept_eot[start_eot] >= 0, n, -1).astype(jnp.int32)
    I_P = ct.accept_eot[start_eot]
    L = jnp.concatenate([L, L_P[None]])
    I = jnp.concatenate([I, I_P[None]])
    bidx = jnp.arange(P + 1, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I


def _bucket_cap(c: int, lo: int = 16) -> int:
    cap = lo
    while cap < c:
        cap *= 4
    return cap


def l_arrays_device_ff(
    ct: DeviceTables, text, n, *, block: int = DEFAULT_BLOCK,
    min_skip_fraction: float = 0.25, force: bool = False,
    pallas: bool = False,
):
    """Host-orchestrated FF execution: run phase 3 on candidate blocks only.

    Falls back to the single-program path when filtering would skip less
    than `min_skip_fraction` of blocks (unless `force`, the rejit force_ff
    analog). With `pallas`, byte-stepping phases run as fused kernels."""
    from ..kernels.dfa_pallas import CHUNK

    P = text.shape[0]
    nb = P // block
    pallas = pallas and nb % CHUNK == 0
    suf, cand_block, n_cand = ff_phase12(
        ct, text, n, block=block, use_pallas=pallas
    )
    c = int(n_cand)
    if not force and c >= nb * (1.0 - min_skip_fraction):
        if pallas:
            return l_arrays_device_pallas(ct, text, n, block=block)
        return l_arrays_device(ct, text, n, block=block)
    cap = min(_bucket_cap(c), nb)
    use_pallas = pallas and cap % CHUNK == 0
    return ff_phase3(
        ct, text, n, suf, cand_block, block=block, cap=cap,
        use_pallas=use_pallas,
    )


def l_arrays(
    t_or_ct, text: np.ndarray, n: int, *, block: int = DEFAULT_BLOCK
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: numpy in (already padded), numpy out (trimmed to n+1)."""
    ct = device_tables(t_or_ct) if isinstance(t_or_ct, DFATables) else t_or_ct
    L, I = l_arrays_device(
        ct, jnp.asarray(text, dtype=jnp.uint8), jnp.int32(n), block=block
    )
    return np.asarray(L)[: n + 1], np.asarray(I)[: n + 1]
