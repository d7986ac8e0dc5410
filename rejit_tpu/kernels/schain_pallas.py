"""VMEM-fused select-chain DFA kernel (the round-2 performance engine).

The XLA select-chain engine (engine/schain.py) eliminated dynamic gathers
but still round-trips its (nb, Q) carries through HBM on every byte-step
(~170 B of carry traffic per text byte) and pays XLA per-op materialization;
it measured 0.40 GB/s on the 10 MB `\\b\\w+ing\\b` corpus (bench/NOTES.md).
This kernel runs the same backward scan with every carry resident in
VMEM/vregs across all K statically-unrolled steps. The remaining traffic is
"read each text byte once (uint8), write the per-boundary emission once".

Design (measured rationale in bench/NOTES.md and the round-1 layout notes):

  * one grid step owns CH = 8*CHL text blocks laid out as full (8, CHL)
    vreg tiles — every elementwise op runs at 100% VPU lane utilization
    (the (1, nb) row layout wastes 7/8 of the sublanes);
  * the per-state carries are Q *separate* (8, CHL) arrays, so the static
    column permutation `carry[:, next[:, c]]` of engine/schain.py becomes
    Python list reindexing — zero shuffle instructions;
  * (f, m) are packed into one int32 per state (`f << mb | m+1`), halving
    the per-class blend to one select per (class, state); the byte-class
    partition is disjoint, so blends against the *dominant* class are
    skipped entirely (the dominant class is the chain's default branch);
  * byte classification, accept flags, and start-state selection are
    computed in-kernel from the raw uint8 text with range compares —
    no 256-entry lookup tables, no precomputed class arrays in HBM;
  * per-boundary L/F emission is packed into one int32 output row.

Bit-equal to engine/schain.py's scan (tests/kernels/test_schain_pallas.py
checks all three engines against each other and the oracle).

Capability reference: this is the TPU replacement for rejit's generated
match loops (rejit:src/x64/codegen-x64.cc state-ring hot loops, unverified
recall — SURVEY.md §2.2, §3.1).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..engine import schain as schain_mod

DEFAULT_CHL = 128   # lane-columns per grid step; CH = 8*CHL blocks/step

MAX_Q = 30          # accept bitmask must fit an int32 bit-plane


def _runs_by_value(runs):
    """((lo, hi, v), ...) -> {v: ((lo, hi), ...)}."""
    out = {}
    for lo, hi, v in runs:
        out.setdefault(v, []).append((lo, hi))
    return {v: tuple(r) for v, r in out.items()}


def _merge_runs(runs):
    """Coalesce adjacent runs with equal value."""
    out = []
    for lo, hi, v in runs:
        if out and out[-1][2] == v and out[-1][1] + 1 == lo:
            out[-1] = (out[-1][0], hi, v)
        else:
            out.append((lo, hi, v))
    return tuple(tuple(r) for r in out)


def _coverage(runs_v):
    return sum(hi - lo + 1 for lo, hi in runs_v)


def _range_mask(b, runs_v):
    """OR of byte-range compares (the gather-free class test)."""
    m = None
    for lo, hi in runs_v:
        t = (b == lo) if lo == hi else ((b >= lo) & (b <= hi))
        m = t if m is None else (m | t)
    return m


def _plan(st, K: int):
    """Static kernel plan derived from schain.static_tables output."""
    cls_runs, ctx_runs, nxt_cols, acc_cols, start_by_ctx, accept_eot = st
    C = len(nxt_cols)
    Q = len(nxt_cols[0])
    mb = (K + 1).bit_length()          # bits for m+1 in [0, K]
    assert Q <= MAX_Q and (Q - 1) < (1 << (31 - mb))
    class_runs = _runs_by_value(cls_runs)
    # Dominant class = the chain's default branch. Prefer a non-accepting
    # class (its accept blend then needs no complement mask).
    def dom_key(cc):
        accepts = any(a >= 0 for a in acc_cols[cc])
        return (not accepts, _coverage(class_runs.get(cc, ())))
    dom = max(range(C), key=dom_key)
    # Byte -> start state (prev-byte context folded through start_by_ctx).
    start_runs = _merge_runs(
        tuple((lo, hi, start_by_ctx[v]) for lo, hi, v in ctx_runs)
    )
    srun_by_state = _runs_by_value(start_runs)
    # Default start = widest coverage; other starts get range masks.
    s_vals = sorted(srun_by_state, key=lambda s: -_coverage(srun_by_state[s]))
    s_def, s_rest = s_vals[0], tuple(s_vals[1:])
    # k = 0 boundaries read precomputed states (incl. the BEGIN context).
    us0 = tuple(sorted(set(start_by_ctx)))
    return dict(
        C=C, Q=Q, mb=mb, dom=dom,
        class_runs=class_runs, nxt_cols=nxt_cols, acc_cols=acc_cols,
        s_def=s_def, s_rest=s_rest, srun_by_state=srun_by_state, us0=us0,
    )


def _kernel(n_ref, sk0_ref, text_ref, lf_ref, sum_ref, *refs,
            K, CHL, plan, track_pid):
    C, Q, mb = plan["C"], plan["Q"], plan["mb"]
    dom = plan["dom"]
    nxt, acc = plan["nxt_cols"], plan["acc_cols"]
    MMASK = (1 << mb) - 1
    if track_pid:
        ip_ref, isum_ref = refs

    n = n_ref[0]
    ch = pl.program_id(0)
    t32 = text_ref[:].astype(jnp.int32)                 # (K*8, CHL)
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, CHL), 0)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (8, CHL), 1)
    posK = (ch * (8 * CHL) + srow * CHL + lcol) * K     # block byte base

    # Packed carries: pk[q] = f << mb | (m+1); suffix-identity seed.
    pk = [jnp.full((8, CHL), q << mb, jnp.int32) for q in range(Q)]
    if track_pid:
        pi = [jnp.full((8, CHL), -1, jnp.int32) for _ in range(Q)]

    for k in reversed(range(K)):
        b = t32[k * 8:(k + 1) * 8, :]                   # (8, CHL)
        masks = {
            cc: _range_mask(b, plan["class_runs"][cc])
            for cc in range(C)
            if cc != dom and cc in plan["class_runs"]
        }
        # Blend the packed carries: dominant class is the default branch;
        # per-(class, state) selects are skipped when the class agrees
        # with the dominant transition (masks are disjoint).
        g = [pk[nxt[dom][q]] for q in range(Q)]
        if track_pid:
            gi = [pi[nxt[dom][q]] for q in range(Q)]
        for cc, mcc in masks.items():
            for q in range(Q):
                if nxt[cc][q] != nxt[dom][q]:
                    g[q] = jnp.where(mcc, pk[nxt[cc][q]], g[q])
                    if track_pid:
                        gi[q] = jnp.where(mcc, pi[nxt[cc][q]], gi[q])
        # Accept bit-plane for this byte (bit q = fresh accept from q).
        hv = None
        for cc in range(C):
            bits = 0
            for q in range(Q):
                if acc[cc][q] >= 0:
                    bits |= 1 << q
            if bits:
                if cc == dom:
                    # Rare (every class accepts): dominant mask is the
                    # complement of all the others.
                    mcc = None
                    for m_o in masks.values():
                        mcc = m_o if mcc is None else (mcc | m_o)
                    mcc = ~mcc if mcc is not None else (b >= 0)
                else:
                    mcc = masks[cc]
                hv = (
                    jnp.where(mcc, bits, hv)
                    if hv is not None
                    else jnp.where(mcc, bits, 0)
                )
        valid = (posK + k) < n
        for q in range(Q):
            mg = g[q] & MMASK
            later = mg > 0
            if hv is None:
                mnew = jnp.where(later, mg, 0)
            else:
                hb = (hv >> q) & 1
                mnew = jnp.where(later, mg, hb * (k + 1))
            new = (g[q] & ~MMASK) | mnew
            pk[q] = jnp.where(valid, new, pk[q])
            if track_pid:
                fresh = None
                for cc in range(C):
                    if acc[cc][q] >= 0:
                        if cc == dom:
                            mcc = None
                            for m_o in masks.values():
                                mcc = m_o if mcc is None else (mcc | m_o)
                            mcc = ~mcc if mcc is not None else (b >= 0)
                        else:
                            mcc = masks[cc]
                        fresh = (
                            jnp.where(mcc, acc[cc][q], fresh)
                            if fresh is not None
                            else jnp.where(mcc, acc[cc][q], -1)
                        )
                if fresh is None:
                    fresh = jnp.full((8, CHL), -1, jnp.int32)
                inew = jnp.where(later, gi[q], fresh)
                pi[q] = jnp.where(valid, inew, pi[q])

        # Boundary-k emission at the boundary's start state.
        if len(plan["s_rest"]) == 0 and len(plan["us0"]) == 1:
            sel = pk[plan["s_def"]]
            isel = pi[plan["s_def"]] if track_pid else None
        elif k >= 1:
            bprev = t32[(k - 1) * 8:k * 8, :]
            sel = pk[plan["s_def"]]
            isel = pi[plan["s_def"]] if track_pid else None
            for us in plan["s_rest"]:
                mu = _range_mask(bprev, plan["srun_by_state"][us])
                sel = jnp.where(mu, pk[us], sel)
                if track_pid:
                    isel = jnp.where(mu, pi[us], isel)
        else:
            sk0 = sk0_ref[:]
            sel = pk[plan["us0"][0]]
            isel = pi[plan["us0"][0]] if track_pid else None
            for us in plan["us0"][1:]:
                mu = sk0 == us
                sel = jnp.where(mu, pk[us], sel)
                if track_pid:
                    isel = jnp.where(mu, pi[us], isel)
        # Packed emission: F << mb | (L_rel + 1).
        lf_ref[k * 8:(k + 1) * 8, :] = sel
        if track_pid:
            ip_ref[k * 8:(k + 1) * 8, :] = isel

    for q in range(Q):
        sum_ref[q * 8:(q + 1) * 8, :] = pk[q]
        if track_pid:
            isum_ref[q * 8:(q + 1) * 8, :] = pi[q]


@functools.partial(
    jax.jit,
    static_argnames=("st", "n_patterns", "block", "chl", "interpret"),
)
def l_arrays_device_schain_fused(
    st,
    n_patterns: int,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    block: int = 32,
    chl: int = DEFAULT_CHL,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for engine/schain.l_arrays_device_schain.

    `st` = schain.static_tables(tables); `text` uint8 of length P, a
    multiple of block*8*chl; `n` the true length (int32 scalar).
    """
    cls_runs, ctx_runs, nxt_cols, acc_cols, start_by_ctx, accept_eot = st
    K = block
    CHL = chl
    CH = 8 * CHL
    P = text.shape[0]
    assert P % (K * CH) == 0 and P > 0
    nb = P // K
    nbc = nb // CH
    plan = _plan(st, K)
    Q, mb = plan["Q"], plan["mb"]
    MMASK = (1 << mb) - 1
    track_pid = n_patterns > 1

    # Tile layout: row k*8+s, lane l holds byte k of block ch*CH + s*CHL + l.
    tiles = (
        text.reshape(nbc, 8, CHL, K)
        .transpose(0, 3, 1, 2)
        .reshape(nbc * K * 8, CHL)
    )
    # k = 0 start states (prev byte = last byte of the previous block).
    start_runs = tuple(
        (lo, hi, start_by_ctx[v]) for lo, hi, v in ctx_runs
    )
    lastb = text.reshape(nb, K)[:, K - 1].astype(jnp.int32)
    prevb = jnp.concatenate([jnp.zeros(1, jnp.int32), lastb[:-1]])
    sk0 = schain_mod._by_runs(prevb, start_runs)
    sk0 = sk0.at[0].set(start_by_ctx[0])
    sk0_t = sk0.reshape(nbc * 8, CHL)

    nlim = jnp.asarray([n], dtype=jnp.int32)
    out_shapes = [
        jax.ShapeDtypeStruct((nbc * K * 8, CHL), jnp.int32),   # packed L/F
        jax.ShapeDtypeStruct((nbc * Q * 8, CHL), jnp.int32),   # packed f/m
    ]
    out_specs = [
        pl.BlockSpec((K * 8, CHL), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Q * 8, CHL), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    if track_pid:
        out_shapes += [
            jax.ShapeDtypeStruct((nbc * K * 8, CHL), jnp.int32),
            jax.ShapeDtypeStruct((nbc * Q * 8, CHL), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec(
                (K * 8, CHL), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Q * 8, CHL), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ]

    out = pl.pallas_call(
        functools.partial(
            _kernel, K=K, CHL=CHL, plan=plan, track_pid=track_pid
        ),
        grid=(nbc,),
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, CHL), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (K * 8, CHL), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(nlim, sk0_t, tiles)

    lf = out[0]
    summ = out[1]

    def untile(a, rows):
        return (
            a.reshape(nbc, rows, 8, CHL)
            .transpose(0, 2, 3, 1)
            .reshape(nb, rows)
        )

    lf_bk = untile(lf, K)                               # (nb, K)
    L_bk = (lf_bk & MMASK) - 1
    F_bk = lf_bk >> mb
    sm = untile(summ, Q)                                # (nb, Q)
    m_f = (sm & MMASK) - 1
    f_f = sm >> mb
    if track_pid:
        I_bk = untile(out[2], K)
        i_f = untile(out[3], Q)
    else:
        I_bk = jnp.where(L_bk >= 0, 0, -1)
        i_f = jnp.where(m_f >= 0, 0, -1)

    start_eot = schain_mod._by_runs(
        text[-1:].astype(jnp.int32), start_runs
    )[0]
    return schain_mod.finish_scan(
        L_bk, I_bk, F_bk, m_f, i_f, f_f,
        accept_eot=accept_eot, start_eot=start_eot, n=n, K=K,
    )
