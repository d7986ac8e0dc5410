r"""Position-NFA bit-set engine: device-speed execution for DFA blowups.

Executes the position automaton compiled by rejit_tpu/compile/posnfa.py with
the same three-phase L-array architecture as the DFA pipeline
(rejit_tpu/engine/pipeline.py), but over SETS of NFA positions instead of
single DFA states — the TPU equivalent of the reference's state ring, whose
memory and per-byte work are linear in pattern size precisely where the DFA
explodes (reference: rejit:src/codegen.cc state ring, unverified recall —
SURVEY.md §2.1/C6, §3.1).

The TPU-first trick is the **column-major occupancy layout**: instead of one
bit-set per thread (which needs a Q-term select chain per thread per byte),
the state is `col[j]` = a packed word of WHICH THREADS currently occupy
position j, shaped (Q, nb) with blocks on lanes. One byte-step is then

    col'[j'] = (OR_{j in pred(j')} col[j]) & admits(j', class)

where pred() comes from the STATIC follow graph — the unions compile to a
fixed OR network (no gathers, no selects over Q), and `admits` is a handful
of class-equality compares. Thread birth is an injection into col[0] (the
virtual start position), so phase 3 runs all K threads of a block through
ONE pass over the block's bytes. Phase 1 reuses the same step with the Q
singleton starts as the "threads", yielding the block's transfer relation in
transposed form; phase 2 composes relations with the manual doubling scan
(jax.lax.associative_scan is banned on large nb — see pipeline.suffix_scan).

Semantics (leftmost-longest, boundary flags, EOT acceptance) are pinned to
docs/SEMANTICS.md and differential-tested against the oracle.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compile.posnfa import PosTables

U32 = jnp.uint32
DEFAULT_BLOCK = 32


# ---------------------------------------------------------------------------
# Static (trace-time) views of the PosTables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _static(pt: PosTables):
    """Python-side lookup structures derived from the static tables:
    everything here bakes into the traced program as constants."""
    Q, W, F, n_pat = pt.Q, pt.W, pt.F, pt.n_patterns

    def bits_of(packed: Tuple[int, ...]) -> set:
        s = set()
        for w, word in enumerate(packed):
            x = word
            while x:
                b = x & -x
                s.add(32 * w + b.bit_length() - 1)
                x ^= b
        return s

    # pred[j'] -> for each source j, the set of variants with edge j->j'.
    pred = [dict() for _ in range(Q)]
    for f in range(F):
        for j in range(Q):
            for jp in bits_of(pt.follow[f][j]):
                pred[jp].setdefault(j, set()).add(f)
    all_f = frozenset(range(F))
    # Padded predecessor matrices, grouped by variant set: row k of a
    # (D_g, Q) matrix holds the k-th predecessor of each position (row Q =
    # an always-zero pad row), so one byte-step's transition is D_g
    # STATIC row-gathers + ORs over whole (Q, nb) arrays — no per-row
    # slicing, no per-row stacks (the per-op dispatch killer).
    by_group = {}
    for jp in range(Q):
        for j, fs in pred[jp].items():
            key = all_f if len(fs) == F else frozenset(fs)
            by_group.setdefault(key, [[] for _ in range(Q)])[jp].append(j)
    # Matrices cover Q+1 output rows: row Q is a PERSISTENT zero pad row
    # (self-mapping, never admitted by any class), so the per-step
    # transition needs no concat-with-zero copy of the state.
    pred_groups = []
    for key in sorted(by_group, key=sorted):
        lists = by_group[key]
        D = max((len(x) for x in lists), default=0)
        mat = np.full((max(D, 1), Q + 1), Q, dtype=np.int32)
        for jp in range(Q):
            for k, j in enumerate(sorted(lists[jp])):
                mat[k, jp] = j
        pred_groups.append(
            (None if key == all_f else key, mat)
        )

    # Accepting positions per pid, with their variant sets.
    acc = [dict() for _ in range(n_pat)]
    for f in range(F):
        for p in range(n_pat):
            for j in bits_of(pt.accept[f][p]):
                acc[p].setdefault(j, set()).add(f)
    acc_pos = [
        tuple(sorted(
            (j, frozenset(fs) if len(fs) != F else all_f)
            for j, fs in acc[p].items()
        ))
        for p in range(n_pat)
    ]

    # (C, Q+1) bool: class c admits position j (pad row Q: never).
    admit_bool = np.zeros((pt.n_classes, Q + 1), dtype=bool)
    for c in range(pt.n_classes):
        for jp in range(Q):
            if (pt.bmask[c][jp // 32] >> (jp % 32)) & 1:
                admit_bool[c, jp] = True

    # (F, n_pat, Q) bool EOT/accept expansion for device-side seeds.
    acc_bool = np.zeros((F, n_pat, Q), dtype=bool)
    for f in range(F):
        for p in range(n_pat):
            for j in bits_of(pt.accept[f][p]):
                acc_bool[f, p, j] = True

    return pred_groups, acc_pos, admit_bool, acc_bool


def _expand(words: List[jnp.ndarray], R: int) -> jnp.ndarray:
    """W-list of (...,) uint32 -> (R, ...) bool, bit r of word r//32."""
    parts = []
    shift = jnp.arange(32, dtype=U32)
    for w in range((R + 31) // 32):
        sh = shift.reshape((32,) + (1,) * words[w].ndim)
        parts.append((words[w][None, ...] >> sh) & U32(1))
    return jnp.concatenate(parts)[:R] != 0


# ---------------------------------------------------------------------------
# Shared byte-step over column-major occupancy words
# ---------------------------------------------------------------------------


def _step(pt, st, cols, m, i, cls_s, fx, valid, pos, R):
    """One byte-step: acceptance at the boundary, then transition.

    cols: n_occ-list of (Q, nb) uint32 (bit r of cols[r//32][j] = unit r
    occupies position j); m/i: (R, nb) int32; cls_s: (nb,) int32 byte
    class; fx: (nb,) int32 flag-variant index or None; valid: (nb,) bool;
    pos: (nb,) int32. Returns updated (cols, m, i).
    """
    pred_groups, acc_pos, admit_bool, _ = st
    Q, F, n_pat = pt.Q, pt.F, pt.n_patterns
    n_occ = len(cols)
    nb = cols[0].shape[1]
    zero = jnp.zeros((nb,), dtype=U32)

    fmask_cache = {}

    def fmask(fs):
        if fs not in fmask_cache:
            mm = None
            for f in sorted(fs):
                e = fx == f
                mm = e if mm is None else (mm | e)
            fmask_cache[fs] = mm
        return fmask_cache[fs]

    # Acceptance at this boundary (before consuming the byte): pid order
    # ascending, first hit claims (min-pid tie-break at equal boundary).
    # Accepting-position count is small, so per-row slicing is cheap here.
    hit_any = None
    for p in range(n_pat):
        accw = [zero] * n_occ
        for j, fs in acc_pos[p]:
            if len(fs) == F or fx is None:
                for oc in range(n_occ):
                    accw[oc] = accw[oc] | cols[oc][j]
            else:
                g = fmask(fs)
                for oc in range(n_occ):
                    accw[oc] = accw[oc] | jnp.where(g, cols[oc][j], zero)
        hit = _expand(accw, R) & valid[None, :]
        if i is None:
            # Single pattern: pid is implied (engine top-level emits
            # I = 0 where L >= 0), so only m is tracked — drops one
            # select per step and the whole i side of the suffix scan.
            m = jnp.where(hit, pos[None, :], m)
            continue
        claim = hit if hit_any is None else (hit & ~hit_any)
        m = jnp.where(claim, pos[None, :], m)
        i = jnp.where(claim, p, i)
        hit_any = hit if hit_any is None else (hit_any | hit)

    # Transition: D static row-gathers + ORs per predecessor group, then
    # one class-admission mask — whole-(Q, nb)-array ops only (class
    # admission via C compare/AND terms, not a dynamic gather: dynamic
    # gathers measured ~100x slower than compare chains on v5e).
    bb = None
    for c in range(pt.n_classes):
        contrib = (
            jnp.asarray(admit_bool[c])[:, None] & (cls_s == c)[None, :]
        )
        bb = contrib if bb is None else (bb | contrib)
    valid_row = valid[None, :]
    new_cols = []
    for oc in range(n_occ):
        ext = cols[oc]                       # (Q+1, nb), row Q always 0
        t = None
        for fs, mat in pred_groups:
            g_acc = None
            for k in range(mat.shape[0]):
                term = jnp.take(ext, jnp.asarray(mat[k]), axis=0)
                g_acc = term if g_acc is None else (g_acc | term)
            if fs is not None:
                g_acc = jnp.where(fmask(fs)[None, :], g_acc, U32(0))
            t = g_acc if t is None else (t | g_acc)
        if t is None:
            t = jnp.zeros_like(cols[oc])
        nw = jnp.where(bb, t, U32(0))
        new_cols.append(jnp.where(valid_row, nw, cols[oc]))
    return new_cols, m, i


# ---------------------------------------------------------------------------
# Phase 1: per-block transfer relations (transposed) via Q singleton starts
# ---------------------------------------------------------------------------


def _phase1(pt, st, cls_kb, fx_kb, pos_kb, n):
    Q, W = pt.Q, pt.W
    K, nb = cls_kb.shape

    init_cols = []
    for w in range(W):
        rows = np.zeros((Q + 1, 1), dtype=np.uint32)
        for j in range(Q):
            if j // 32 == w:
                rows[j, 0] = np.uint32(1 << (j % 32))
        init_cols.append(
            jnp.broadcast_to(jnp.asarray(rows), (Q + 1, nb)).astype(U32)
        )
    m0 = jnp.full((Q, nb), -1, jnp.int32)
    i0 = None if pt.n_patterns == 1 else m0

    def body(carry, xs):
        cols, m, i = carry
        cls_s, fx_s, pos_s = xs
        valid = pos_s < n
        cols, m, i = _step(
            pt, st, list(cols), m, i, cls_s,
            fx_s if pt.F > 1 else None, valid, pos_s, Q,
        )
        return (tuple(cols), m, i), None

    (cols, m, i), _ = jax.lax.scan(
        body, (tuple(init_cols), m0, i0),
        (cls_kb, fx_kb, pos_kb),
    )
    # Transposed relation: fT[w][b, e] = start-bits (word w) reaching e
    # (pad row Q dropped).
    fT = [c[:Q].T for c in cols]
    return fT, m.T, None if i is None else i.T


# ---------------------------------------------------------------------------
# Phase 2: exclusive suffix composition (manual doubling scan)
# ---------------------------------------------------------------------------


def _combine(pt, a, b):
    """a covers earlier text, b the suffix after it. Elements are
    (fT W-list of (nb, Q) uint32, m (nb, Q), i (nb, Q))."""
    Q, W = pt.Q, pt.W
    aT, ma, ia = a
    bT, mb, ib = b
    outT = [jnp.zeros_like(aT[w]) for w in range(W)]
    for r in range(Q):
        live = ((bT[r // 32] >> U32(r % 32)) & U32(1)) != 0   # (nb, Q)
        for w in range(W):
            outT[w] = outT[w] | jnp.where(live, aT[w][:, r:r + 1], U32(0))
    # m-composition per START q: mg[b, q] = max_{e in f_a[q]} mb[b, e]
    # (min-pid tie-break). Iterating q keeps every op an elementwise
    # (nb, Q)-over-e expression + one row reduction — no per-e transposes.
    neg = jnp.full(mb.shape, -1, jnp.int32)
    mg_cols = []
    for q in range(Q):
        live = ((aT[q // 32] >> U32(q % 32)) & U32(1)) != 0   # (nb, Q) e
        mg_cols.append(jnp.max(jnp.where(live, mb, neg), axis=1))
    mg = jnp.stack(mg_cols, axis=1)                            # (nb, Q) q
    if ib is None:
        ig = None
    else:
        big = jnp.full(mb.shape, 1 << 30, jnp.int32)
        ig_cols = []
        for q in range(Q):
            live = ((aT[q // 32] >> U32(q % 32)) & U32(1)) != 0
            at_max = live & (mb == mg[:, q:q + 1])
            ig_cols.append(jnp.min(jnp.where(at_max, ib, big), axis=1))
        ig = jnp.stack(ig_cols, axis=1)
        ig = jnp.where(mg >= 0, ig, -1)
    later = mg >= 0
    m_out = jnp.where(later, mg, ma)
    i_out = None if ib is None else jnp.where(later, ig, ia)
    return outT, m_out, i_out


def _suffix_scan(pt, elems, tail):
    """Exclusive suffix composition across blocks (axis 0 of each (nb, Q)
    array), seeded with `tail` after the last block. Manual Hillis-Steele
    doubling — see pipeline.suffix_scan for why not associative_scan."""
    Q, W = pt.Q, pt.W
    fT, m, i = elems
    nb = m.shape[0]

    id_rows = np.zeros((W, 1, Q), dtype=np.uint32)
    for j in range(Q):
        id_rows[j // 32, 0, j] = np.uint32(1 << (j % 32))
    neg1 = jnp.full((1, Q), -1, jnp.int32)
    identity = (
        [jnp.asarray(id_rows[w]) for w in range(W)],
        neg1,
        None if i is None else neg1,
    )

    def shift1(el, fill):
        fT_, m_, i_ = el
        fF, mF, iF = fill
        out_f = [
            jnp.concatenate([fT_[w][1:], jnp.broadcast_to(fF[w], (1, Q))])
            for w in range(W)
        ]
        out_m = jnp.concatenate([m_[1:], jnp.broadcast_to(mF, (1, Q))])
        out_i = (
            None if i_ is None
            else jnp.concatenate([i_[1:], jnp.broadcast_to(iF, (1, Q))])
        )
        return out_f, out_m, out_i

    def shift_dyn(el, d):
        """Shift up by dynamic d with identity fill: concat + slice (the
        doubling levels run under ONE fori_loop so the trace stays
        O(combine), not O(combine * log nb) — the unrolled form hit
        multi-minute XLA compiles at Q ~ 100)."""
        fT_, m_, i_ = el
        idf, idm, idi = identity

        def sl(x, fill_row):
            ext = jnp.concatenate(
                [x, jnp.broadcast_to(fill_row, (nb, Q))]
            )
            return jax.lax.dynamic_slice(ext, (d, 0), (nb, Q))

        return (
            [sl(fT_[w], idf[w]) for w in range(W)],
            sl(m_, idm),
            None if i_ is None else sl(i_, idi),
        )

    S = shift1((fT, m, i), tail)
    nlev = max(1, (nb - 1).bit_length())

    def level(lv, S):
        return _combine(pt, S, shift_dyn(S, jnp.int32(1) << lv))

    S = jax.lax.fori_loop(0, nlev, level, S)
    return S


def _eot_tail(pt, st, ctx_last, n):
    """Tail element after the last block: identity relation + EOT accepts.

    ctx_last: int32 scalar context of byte n-1 (CTX_BEGIN when n == 0)."""
    Q, W, F, n_pat = pt.Q, pt.W, pt.F, pt.n_patterns
    _, _, _, acc_bool = st
    f_eot = jnp.asarray(np.asarray(pt.fidx_eot, np.int32))[ctx_last]
    accs = jnp.asarray(acc_bool)[f_eot] if n_pat else None  # (n_pat, Q)
    m_t = jnp.full((1, Q), -1, jnp.int32)
    single = n_pat == 1
    i_t = None if single else jnp.full((1, Q), -1, jnp.int32)
    for p in range(n_pat):
        claim = accs[p][None, :] & (m_t < 0)
        m_t = jnp.where(claim, n, m_t)
        if not single:
            i_t = jnp.where(claim, p, i_t)
    id_rows = np.zeros((W, 1, Q), dtype=np.uint32)
    for j in range(Q):
        id_rows[j // 32, 0, j] = np.uint32(1 << (j % 32))
    fT = [jnp.asarray(id_rows[w]) for w in range(W)]
    return (fT, m_t, i_t)


# ---------------------------------------------------------------------------
# Phase 3: injected per-boundary threads + suffix splice
# ---------------------------------------------------------------------------


def _phase3(pt, st, suf, cls_kb, fx_kb, pos_kb, n):
    Q = pt.Q
    K, nb = cls_kb.shape
    n_occ = K // 32

    init_cols = tuple(
        jnp.zeros((Q + 1, nb), dtype=U32) for _ in range(n_occ)
    )
    m0 = jnp.full((K, nb), -1, jnp.int32)

    inj = np.zeros((K, n_occ), dtype=np.uint32)
    for t in range(K):
        inj[t, t // 32] = np.uint32(1 << (t % 32))
    inj = jnp.asarray(inj)

    def body(carry, xs):
        cols, m, i = carry
        cls_s, fx_s, pos_s, inj_s = xs
        # Birth: the thread starting at this boundary enters col[0]
        # (virtual start) BEFORE the acceptance check, so empty matches
        # at the start boundary are seen.
        cols = [
            c.at[0].set(c[0] | inj_s[oc]) for oc, c in enumerate(cols)
        ]
        valid = pos_s < n
        cols, m, i = _step(
            pt, st, cols, m, i, cls_s,
            fx_s if pt.F > 1 else None, valid, pos_s, K,
        )
        return (tuple(cols), m, i), None

    single = pt.n_patterns == 1
    (cols, m, i), _ = jax.lax.scan(
        body, (init_cols, m0, None if single else m0),
        (cls_kb, fx_kb, pos_kb, inj),
    )

    # Splice the block's exclusive suffix for threads alive at block end.
    _, m_suf, i_suf = suf
    m_tail = jnp.full((K, nb), -1, jnp.int32)
    i_tail = None if single else jnp.full((K, nb), -1, jnp.int32)
    for e in range(Q):
        occ = _expand([cols[oc][e] for oc in range(n_occ)], K)  # (K, nb)
        me = m_suf[:, e][None, :]
        if single:
            better = occ & (me > m_tail)
            m_tail = jnp.where(better, me, m_tail)
            continue
        ie = i_suf[:, e][None, :]
        better = occ & ((me > m_tail) | ((me == m_tail) & (ie < i_tail)))
        m_tail = jnp.where(better, me, m_tail)
        i_tail = jnp.where(better, ie, i_tail)
    later = m_tail >= 0
    L = jnp.where(later, m_tail, m)
    I = None if single else jnp.where(later, i_tail, i)
    return (
        L.T.reshape(K * nb),
        None if single else I.T.reshape(K * nb),
    )


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("pt", "block"))
def l_arrays_device_nfaset(
    pt: PosTables,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    block: int = DEFAULT_BLOCK,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, I) int32 arrays of length P+1 — the same contract as
    pipeline.l_arrays_device, so every downstream MatchType/selection path
    works unchanged. `text` is uint8 of length P (a multiple of `block`,
    which must be a multiple of 32); `n` is the true length."""
    st = _static(pt)
    P = text.shape[0]
    K = block
    assert K % 32 == 0 and P % K == 0 and P > 0
    nb = P // K
    Q = pt.Q

    class_arr = jnp.asarray(np.asarray(pt.class_of, np.int32))
    ctx_arr = jnp.asarray(pt.ctx_table())
    fidx_arr = jnp.asarray(
        np.asarray(pt.fidx, np.int32).reshape(4, pt.n_classes)
    )

    ti = text.astype(jnp.int32)
    cls = class_arr[ti]
    ctx = ctx_arr[ti]
    # Boundary s uses the context of byte s-1 (CTX_BEGIN at s=0).
    ctx_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), ctx[:-1]])
    fx = fidx_arr[ctx_prev, cls]
    pos = jnp.arange(P, dtype=jnp.int32)

    def kb(a):
        return a.reshape(nb, K).T

    cls_kb, fx_kb, pos_kb = kb(cls), kb(fx), kb(pos)

    summaries = _phase1(pt, st, cls_kb, fx_kb, pos_kb, n)
    ctx_last = jnp.where(
        n > 0, ctx_arr[text[jnp.maximum(n - 1, 0)].astype(jnp.int32)], 0
    )
    tail = _eot_tail(pt, st, ctx_last, n)
    suf = _suffix_scan(pt, summaries, tail)
    L, I = _phase3(pt, st, suf, cls_kb, fx_kb, pos_kb, n)

    # Boundary P: EOT acceptance of a fresh thread ({bit 0}).
    _, m_t, i_t = tail
    L_P = m_t[0, 0][None]
    L = jnp.concatenate([L, L_P])
    bidx = jnp.arange(P + 1, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    if I is None:
        # Single pattern: pid 0 wherever a match ends.
        I = jnp.where(L >= 0, 0, -1)
        return L, I
    I_P = i_t[0, 0][None]
    I = jnp.concatenate([I, I_P])
    I = jnp.where(bidx <= n, I, -1)
    return L, I


def l_arrays(
    pt: PosTables, text: np.ndarray, n: int, *, block: int = DEFAULT_BLOCK
) -> Tuple[np.ndarray, np.ndarray]:
    """Host wrapper: numpy in (already padded), numpy out (trimmed)."""
    L, I = l_arrays_device_nfaset(
        pt, jnp.asarray(text, dtype=jnp.uint8), jnp.int32(n), block=block
    )
    return np.asarray(L)[: n + 1], np.asarray(I)[: n + 1]


# ---------------------------------------------------------------------------
# Exact chunked streaming (corpora larger than one device call)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("pt", "block"))
def chunk_l_arrays_device_nfaset(
    pt: PosTables,
    text: jnp.ndarray,
    n: jnp.ndarray,
    offset: jnp.ndarray,
    ctx_prev0: jnp.ndarray,
    tail,
    *,
    block: int = DEFAULT_BLOCK,
):
    """One chunk of the right-to-left streaming sweep.

    `tail` is the suffix element of EVERYTHING after this chunk
    ((W, Q) packed relation, (Q,) m, (Q,) i or None) — the same algebra
    the DFA stream carries across chunks (engine/stream.py), so matches
    crossing any number of chunk boundaries are exact. Returns the
    chunk's (L, I) for its own boundaries (global positions) plus the
    composed summary covering this chunk AND its tail, which becomes the
    next (left) chunk's tail.
    """
    st = _static(pt)
    P = text.shape[0]
    K = block
    nb = P // K
    Q, W = pt.Q, pt.W

    class_arr = jnp.asarray(np.asarray(pt.class_of, np.int32))
    ctx_arr = jnp.asarray(pt.ctx_table())
    fidx_arr = jnp.asarray(
        np.asarray(pt.fidx, np.int32).reshape(4, pt.n_classes)
    )
    ti = text.astype(jnp.int32)
    cls = class_arr[ti]
    ctx = ctx_arr[ti]
    ctx_prev = jnp.concatenate([ctx_prev0[None], ctx[:-1]])
    fx = fidx_arr[ctx_prev, cls]
    pos = offset + jnp.arange(P, dtype=jnp.int32)

    def kb(a):
        return a.reshape(nb, K).T

    cls_kb, fx_kb, pos_kb = kb(cls), kb(fx), kb(pos)
    summaries = _phase1(pt, st, cls_kb, fx_kb, pos_kb, n)

    tf, tm, ti_ = tail
    tail_el = (
        [tf[w][None, :] for w in range(W)],
        tm[None, :],
        None if ti_ is None else ti_[None, :],
    )
    suf = _suffix_scan(pt, summaries, tail_el)
    L, I = _phase3(pt, st, suf, cls_kb, fx_kb, pos_kb, n)

    # Composed summary of (this chunk + tail) = combine(block 0's own
    # element, the exclusive suffix after block 0).
    fT, m1, i1 = summaries
    elem0 = (
        [fT[w][:1] for w in range(W)], m1[:1],
        None if i1 is None else i1[:1],
    )
    sufT, sufm, sufi = suf
    suf0 = (
        [sufT[w][:1] for w in range(W)], sufm[:1],
        None if sufi is None else sufi[:1],
    )
    nf, nm, ni = _combine(pt, elem0, suf0)
    new_tail = (
        jnp.stack([nf[w][0] for w in range(W)]),
        nm[0],
        None if ni is None else ni[0],
    )

    bidx = offset + jnp.arange(P, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    if I is None:
        I = jnp.where(L >= 0, 0, -1)
    else:
        I = jnp.where(bidx <= n, I, -1)
    return L, I, new_tail


def eot_tail_arrays(pt: PosTables, last_byte, n):
    """Initial (rightmost) tail: identity relation + EOT acceptance.
    `last_byte`: int32 scalar (value of byte n-1; ignored when n == 0)."""
    st = _static(pt)
    ctx_arr = jnp.asarray(pt.ctx_table())
    ctx_last = jnp.where(n > 0, ctx_arr[last_byte], 0)
    fT, m_t, i_t = _eot_tail(pt, st, ctx_last, n)
    return (
        jnp.stack([fT[w][0] for w in range(pt.W)]),
        m_t[0],
        None if i_t is None else i_t[0],
    )


def stream_match_all_nfaset(
    pt: PosTables,
    data: np.ndarray,
    *,
    chunk_bytes: int = 8 << 20,
    block: int = DEFAULT_BLOCK,
):
    """Exact chunked MatchAll on the position engine: chunks scanned from
    the corpus END backward with the carried suffix element (the DFA
    stream's architecture, engine/stream.py). Device positions are global
    int32, so the corpus is capped at 2 GiB (the DFA stream has no such
    cap; posnfa streaming trades that for the set-valued carry).

    Returns (starts, ends, pids) int64 arrays after leftmost-longest
    non-overlap selection over the sparse candidate list.
    """
    from . import select

    n = len(data)
    if n >= (1 << 31):
        raise ValueError("posnfa streaming caps corpora at 2 GiB")
    K = block
    cb = max(K, chunk_bytes // K * K)
    starts = list(range(0, max(n, 1), cb))
    tail = eot_tail_arrays(
        pt, jnp.int32(int(data[n - 1]) if n else 0), jnp.int32(n)
    )
    out = []
    for s in reversed(starts):
        chunk = np.asarray(data[s : s + cb])
        P = -(-max(len(chunk), 1) // K) * K
        if s + cb >= n and P <= (n - s):
            P += K  # the last chunk must hold boundary n strictly inside
        pad = np.zeros(P, np.uint8)
        pad[: len(chunk)] = chunk
        ctx0 = jnp.int32(0 if s == 0 else int(
            np.asarray(pt.ctx_table())[int(data[s - 1])]
        ))
        L, I, tail = chunk_l_arrays_device_nfaset(
            pt, jnp.asarray(pad), jnp.int32(n), jnp.int32(s), ctx0, tail,
            block=K,
        )
        # Device-side sparse compaction: transferring the full per-chunk
        # (L, I) arrays costs 8 B/byte of text over the host link — on
        # the tunneled rig that alone was 30x the scan (measured 2.4 s
        # for 10 MB); candidates_host ships O(matches) instead.
        from . import spans as spans_mod

        p_, e_, i_ = spans_mod.candidates_host(L, I)
        out.append((s + p_.astype(np.int64), e_, i_))
    pos = np.concatenate([a for a, _b, _c in reversed(out)]).astype(np.int64)
    ends = np.concatenate([b for _a, b, _c in reversed(out)]).astype(np.int64)
    pids = np.concatenate([c for _a, _b, c in reversed(out)]).astype(np.int64)
    return select.match_all_candidates(pos, ends, pids)
