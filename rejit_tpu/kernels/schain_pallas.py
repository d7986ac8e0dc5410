r"""VMEM-fused select-chain DFA engine: the whole match pipeline one kernel.

Round-2 measurement history (bench/NOTES.md): the XLA select-chain engine
(engine/schain.py) reads 0.40 GB/s on the 10 MB `\b\w+ing\b` corpus; a first
fused kernel that kept only the K-byte-step scan in VMEM measured the scan
at **131 GB/s** while the XLA phase-2 suffix scan + tail splice consumed
12.2 of the 12.3 ms total. So this kernel internalizes *everything*:

  grid step = one chunk of CH = 8*CHL blocks, executed RIGHT-TO-LEFT —
  a TPU Pallas grid runs sequentially on the TensorCore, so the global
  suffix state (Q per-state scalars) carries across grid steps in SMEM
  scratch, exactly like a matmul accumulator carries across k-steps:

    1. backward K-step select-chain scan over the chunk's blocks
       (carries in VMEM/vregs; per-boundary emissions stashed in VMEM);
    2. cross-column Hillis-Steele suffix scan INSIDE the kernel
       (lane/sublane rolls over the (8, CHL) tiles), seeded at the right
       edge with the carried global suffix;
    3. tail splice per boundary -> absolute L (and I) tiles out;
    4. the chunk's total summary is composed into the SMEM carry for the
       next (leftward) chunk.

  XLA's only remaining work is the text tiling transpose, the output
  untiling, and the EOT boundary row — no (nb, Q) arrays ever reach HBM.

Layout/trick inventory (all measured round-1/2, see bench/NOTES.md):
  * blocks on full (8, CHL) vreg tiles — 100% VPU lane utilization;
  * per-state carries as separate Python-list arrays, so the select-chain's
    static column permutation is list reindexing (zero shuffles);
  * (f, m) packed one int32 per state: `f << mb | m_rel+1` in the scan,
    `f << ms | m_abs+1` in the suffix algebra, ms = 31 - ceil(log2 Q)
    (Q <= 16 -> 128 MB per call; Q <= 64 -> 32 MB; see m_shift/max_p);
  * byte classes / accept bits / start states from raw uint8 text via
    range compares in-kernel — no lookup tables, no class arrays in HBM;
  * dominant byte class is the blend's default branch: one select per
    (class, state) minus every (class, state) agreeing with the dominant.

Bit-equal to engine/schain.py and engine/pipeline.py
(tests/kernels/test_schain_pallas.py; on-TPU gate: tools/verify_tpu.py).

Capability reference: replaces rejit's generated match loops
(rejit:src/x64/codegen-x64.cc state-ring hot loops, unverified recall —
SURVEY.md §2.2, §3.1).
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

MAX_Q = 64          # UNROLLED-form state cap: its trace is
# log2(CH)*Q^2 selects and Mosaic compile time blows up far below this
# (a Q=18 kernel at the default geometry did not compile in 900 s;
# Q=82 didn't in 14 min — bench/NOTES.md "large-Q").

MAX_Q_ROLLED = 256  # ROLLED-form cap = the packed-algebra bound: f takes
# ceil(log2 Q) bits below the sign bit; Q=256 leaves 23 position bits
# (8 MB/call; larger texts go through chunked-fused streaming — see
# api._fused_chunk_bytes). Round-3 fresh-key compile measurements killed
# the round-2 "compile wall" theory: Q=50 compiled in 18.5 s, Q=82 in
# 9.3 s, Q=126 in 11.5 s, Q=134 in ~60 s — the r2 multi-minute walls
# were degraded tunnel-compile windows, not Mosaic scaling
# (bench/NOTES.md round-3 "large-Q knee re-measured"). Throughput falls
# with the packed row count: 10.1 (Q=18), 4.9 (Q=35), 2.9 (Q=50),
# 1.37 (Q=82), 0.71 (Q=126), 0.66 (Q=134) GB/s.

AUTO_MAX_Q = 16     # auto-engine compile-knee gate: a Q=18 kernel at the
# default K=128/CHL=128 geometry did not finish Mosaic compilation in
# 900 s (v5e, 2026-08-18) while the production Q<=8 kernels compile in
# ~1 min. Auto selection stays at/below this; schain_fused='on' may go
# to MAX_Q (unrolled) / MAX_Q_ROLLED (rolled).

AUTO_MAX_Q_ROLLED = 256  # auto gate for the ROLLED form = the cap:
# round-3 measurements (fresh cache keys, good tunnel window) put cold
# compiles at 9-115 s across Q=35..134 and rolled throughput ABOVE the
# XLA select-chain fallback at every Q — 2.9 vs ~0.4 at Q=50 and 0.66
# vs 0.01 at Q=134 (the XLA form collapses at large Q) — so auto always
# prefers the rolled fused kernel; the one-time compile cost is bounded
# by the tunnel window, not Q, and the persistent cache amortizes it.

_NEG = -(1 << 31) + 1


def m_shift(Q: int) -> int:
    """Bits for m_abs+1 in the packed (f << ms | m_abs+1) suffix algebra.

    f needs ceil(log2(Q)) bits below the sign bit; the rest hold absolute
    positions, so the per-call text limit is max_p(Q). Q <= 16 keeps the
    historical 27-bit/128 MB split; Q = 64 still allows 32 MB per call
    (larger corpora go through the sharded or streaming wrappers)."""
    fbits = max(1, (Q - 1).bit_length())
    return 31 - fbits


def max_p(Q: int) -> int:
    return (1 << m_shift(Q)) - 2


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
    mb = (K + 1).bit_length()          # bits for m_rel+1 in [0, K]
    assert Q <= MAX_Q_ROLLED
    ms = m_shift(Q)
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

    # ---- chunk-skip (fast-forward) analysis --------------------------
    # The TPU analog of rejit's FastForwardGen SSE scan (SURVEY.md §3.1
    # HOT LOOP A): a chunk whose bytes are all SILENT — uniform
    # transition of every state to an absorbing dead state, with no
    # accepts reachable from any boundary start state — contributes a
    # constant state-map and all-(-1) L rows, so the kernel can emit them
    # directly at streaming speed instead of running the K-step scan.
    # The chunk's FIRST byte is only required to be UNIFORM (accepts from
    # carried states allowed — that is how a match ending exactly at the
    # chunk edge, e.g. the \b-completing space after "singing", is still
    # recorded): its per-state accepts are folded into the scalar
    # G-carry update and the boundary-0 emission.
    dead = None
    for q in range(Q):
        if accept_eot[q] < 0 and all(
            nxt_cols[c][q] == q and acc_cols[c][q] < 0 for c in range(C)
        ):
            dead = q
            break
    silent_runs = ()
    uni0_runs = ()
    if dead is not None:
        starts = set(us0) | {dead}
        uni_cls = set(
            c for c in range(C)
            if all(nxt_cols[c][q] == dead for q in range(Q))
        )
        silent_cls = set(
            c for c in uni_cls
            if all(acc_cols[c][s] < 0 for s in starts)
        )
        def pair_runs(keep):
            out = []
            for lo, hi, v in cls_runs:
                if v in keep:
                    if out and out[-1][1] + 1 == lo:
                        out[-1] = (out[-1][0], hi)
                    else:
                        out.append((lo, hi))
            return tuple(out)

        silent_runs = pair_runs(silent_cls)
        uni0_runs = pair_runs(uni_cls)
    # Enable only when the silent set covers enough of the byte space for
    # sparse corpora to exist at chunk granularity (flag costs ~7 ops/byte
    # on the heavy path).
    skip = dead is not None and _coverage(silent_runs) >= 64
    return dict(
        C=C, Q=Q, mb=mb, ms=ms, dom=dom,
        class_runs=class_runs, nxt_cols=nxt_cols, acc_cols=acc_cols,
        s_def=s_def, s_rest=s_rest, srun_by_state=srun_by_state, us0=us0,
        accept_eot=tuple(accept_eot),
        skip=skip, dead=dead, silent_runs=silent_runs, uni0_runs=uni0_runs,
    )


def _dom_complement(masks, b):
    m = None
    for m_o in masks.values():
        m = m_o if m is None else (m | m_o)
    return ~m if m is not None else (b >= 0)


def _sel_scalar(t, vals, default=0):
    """Scalar select chain: vals[t] for a traced scalar t."""
    out = jnp.int32(default)
    for q, v in enumerate(vals):
        out = jnp.where(t == q, v, out)
    return out


def _shift_cols(x, d, CHL, srow, lcol, fill):
    """x at column j+d (j = srow*CHL + lcol), `fill` past the last column.

    `fill` is a scalar (or broadcastable) value shifted in at j+d >= CH."""
    # jnp.roll semantics: y[i] = x[i-shift]; we want y[i] = x[i+d], i.e.
    # shift = size - d (non-negative as required). NOTE: pltpu.roll
    # misexecutes in interpret mode inside this composed graph (observed
    # 2026-08-17: level-2 combine of the doubling scan corrupted with
    # pltpu.roll, bit-correct with jnp.roll); jnp.roll lowers to the same
    # Mosaic rotate on real TPUs, so use it unconditionally.
    if d < CHL:
        a = jnp.roll(x, CHL - d, axis=1)
        b = jnp.roll(a, 7, axis=0)
        y = jnp.where(lcol < CHL - d, a, b)
        return jnp.where((srow == 7) & (lcol >= CHL - d), fill, y)
    m = d // CHL
    assert d == m * CHL
    y = jnp.roll(x, 8 - m, axis=0)
    return jnp.where(srow >= 8 - m, fill, y)


def _roll_dyn(x, shift, axis, interpret):
    """Rotate by a TRACED shift amount.

    Hardware path: pltpu.roll (Mosaic tpu.dynamic_rotate). Interpret path:
    jnp.roll — pltpu.roll misexecutes under interpret in this composed
    graph (see _shift_cols), while jnp.roll handles traced shifts exactly;
    both have identical semantics (y[i] = x[i - shift])."""
    if interpret:
        return jnp.roll(x, shift, axis=axis)
    return pltpu.roll(x, shift, axis=axis)


def _combine_packed(A, B, Ai=None, Bi=None, Q=None, ms=27):
    """Suffix-compose packed (f<<ms|m+1) lists: A earlier, B later."""
    MM = (1 << ms) - 1
    out = []
    outi = [] if Ai is not None else None
    for q in range(Q):
        t = A[q] >> ms
        cmps = [t == qq for qq in range(Q)]
        r = B[0]
        for qq in range(1, Q):
            r = jnp.where(cmps[qq], B[qq], r)
        mbp = r & MM
        later = mbp > 0
        out.append(jnp.where(later, r, (r & ~MM) | (A[q] & MM)))
        if Ai is not None:
            ri = Bi[0]
            for qq in range(1, Q):
                ri = jnp.where(cmps[qq], Bi[qq], ri)
            outi.append(jnp.where(later, ri, Ai[q]))
    return out, outi


def _kernel(n_ref, seed_ref, sk0_ref, text_ref, *refs, K, CHL, plan,
            track_pid, nbc, branchless=False, emit_f=False,
            count_only=False, rolled=False, interpret=False):
    C, Q, mb = plan["C"], plan["Q"], plan["mb"]
    dom = plan["dom"]
    nxt, acc = plan["nxt_cols"], plan["acc_cols"]
    MMASK = (1 << mb) - 1
    CH = 8 * CHL
    t32_scr = sx_scr = sxi_scr = g2_scr = None
    if rolled:
        if track_pid and not count_only:
            *refs, t32_scr, sx_scr, sxi_scr, g2_scr = refs
        else:
            *refs, t32_scr, sx_scr, g2_scr = refs
    if True:
        if count_only:
            (cnt_ref, gout_ref, sel_scr, g_scr) = refs
            body_refs = (cnt_ref, sel_scr, g_scr)
        elif track_pid:
            (L_ref, I_ref, gout_ref, sel_scr, isel_scr, g_scr) = refs
            body_refs = (L_ref, I_ref, sel_scr, isel_scr, g_scr)
        else:
            (L_ref, gout_ref, sel_scr, g_scr) = refs
            body_refs = (L_ref, sel_scr, g_scr)

    n = n_ref[0]
    step = pl.program_id(0)
    ch = nbc - 1 - step                                 # right-to-left
    t32 = text_ref[:].astype(jnp.int32)                 # (K*8, CHL)
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, CHL), 0)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (8, CHL), 1)
    posK = (ch * CH + srow * CHL + lcol) * K            # block byte base

    # Rightmost chunk seeds the global suffix from the seed input: the
    # EOT summary for a standalone text, or the caller's tail (identity /
    # cross-shard suffix) in shard mode.
    @pl.when(step == 0)
    def _():
        for r in range(3):
            for q in range(Q):
                g_scr[r, q] = seed_ref[r, q]
        if count_only:
            cnt_ref[0, 0] = 0

    # ---- chunk classification: pad / silent-skip / heavy ---------------
    # The pad and silent-skip branches are PURE PERFORMANCE shortcuts:
    # the heavy path computes identical results on any chunk (pads are
    # valid-masked identity maps; silent chunks produce the same constant
    # maps the shortcut emits). Pallas interpret mode misexecutes large
    # conditional bodies with scratch effects (observed 2026-08-17: the
    # doubling scan inside pl.when returns off-by-small m values on dense
    # multi-pattern inputs, bit-correct unconditioned), so interpret CI
    # runs the unconditional heavy path and the branch structure is
    # validated on the real chip by tools/verify_tpu.py (incl. a sparse
    # corpus that exercises the skip branch).
    if branchless:
        _kernel_heavy(
            n, sk0_ref, t32, body_refs, K=K, CHL=CHL, plan=plan,
            track_pid=track_pid, nbc=nbc, step=step, posK=posK,
            srow=srow, lcol=lcol, emit_f=emit_f, count_only=count_only,
            rolled=rolled, interpret=interpret, text_ref=text_ref,
            t32_scr=t32_scr, sx_scr=sx_scr, sxi_scr=sxi_scr,
            g2_scr=g2_scr,
        )
        _gout(gout_ref, g_scr, Q, step, nbc)
        return
    p0 = ch * CH * K                                     # chunk byte base
    is_pad = p0 >= n                                     # all-invalid chunk
    if plan["skip"]:
        first00 = (srow == 0) & (lcol == 0)
        live = None
        for k in range(K):
            b = t32[k * 8:(k + 1) * 8, :]
            ls = ~_range_mask(b, plan["silent_runs"])
            if k == 0:
                ls = ls & ~first00                      # byte 0: UNI0 rule
            live = ls if live is None else (live | ls)
        z0 = jnp.max(jnp.where(first00, t32[0:8, :], 0))
        z0_uni = jnp.max(
            jnp.where(
                first00,
                _range_mask(t32[0:8, :], plan["uni0_runs"]).astype(
                    jnp.int32
                ),
                0,
            )
        ) > 0
        skip_ok = (
            (jnp.max(live.astype(jnp.int32)) == 0)
            & z0_uni
            & (p0 + CH * K <= n)
            & ~is_pad
        )
    else:
        skip_ok = jnp.bool_(False)

    @pl.when(is_pad)
    def _():
        # Pad bytes are identity maps: the G carry is unchanged. But when
        # n sits exactly on this chunk's left edge, boundary p0 == n IS
        # the EOT boundary: emit it from the seeded G at its start state
        # (empty-match-at-EOT, e.g. `a*` on n=0 or chunk-aligned n).
        first00 = (srow == 0) & (lcol == 0)
        sk000 = jnp.max(jnp.where(first00, sk0_ref[:], 0))
        gm = [g_scr[1, q] for q in range(Q)]
        gi = [g_scr[2, q] for q in range(Q)]
        eot_here = p0 == n
        L00 = jnp.where(eot_here, _sel_scalar(sk000, gm, -1), -1)
        I00 = jnp.where(eot_here, _sel_scalar(sk000, gi, -1), -1)
        if count_only:
            cnt_ref[0, 0] = cnt_ref[0, 0] + jnp.where(L00 >= 0, 1, 0)
            return
        neg = jnp.full((8, CHL), -1, jnp.int32)
        if emit_f:
            # Invalid bytes are identity maps: a pad boundary's shard-end
            # state is its own start state (only p0 == n survives masking).
            L00 = (sk000 << plan["ms"]) | (L00 + 1)
            neg = jnp.zeros((8, CHL), jnp.int32)
        L_ref[0:8, :] = jnp.where(first00, L00, neg)
        if track_pid:
            ineg = jnp.full((8, CHL), -1, jnp.int32)
            I_ref[0:8, :] = jnp.where(first00, I00, ineg)
        for k in range(1, K):
            L_ref[k * 8:(k + 1) * 8, :] = neg
            if track_pid:
                I_ref[k * 8:(k + 1) * 8, :] = ineg

    if plan["skip"]:
        @pl.when(skip_ok)
        def _():
            # All boundaries in the chunk are dead (L = -1) except the
            # chunk-first boundary, whose start state may accept on the
            # (uniform) first byte; carried states' first-byte accepts go
            # into the G carry so matches ending exactly at the chunk
            # edge splice correctly from the left.
            first00 = (srow == 0) & (lcol == 0)
            mcc0 = {
                cc: _range_mask(z0, plan["class_runs"][cc])
                for cc in range(C)
                if cc != dom and cc in plan["class_runs"]
            }
            acc0 = []
            for q in range(Q):
                a = jnp.int32(acc[dom][q])
                for cc, m0 in mcc0.items():
                    a = jnp.where(m0, jnp.int32(acc[cc][q]), a)
                acc0.append(a)
            sk000 = jnp.max(jnp.where(first00, sk0_ref[:], 0))
            a_b0 = _sel_scalar(sk000, acc0, jnp.int32(-1))
            if count_only:
                cnt_ref[0, 0] = cnt_ref[0, 0] + jnp.where(a_b0 >= 0, 1, 0)
                for q in range(Q):
                    g_scr[0, q] = jnp.int32(plan["dead"])
                    g_scr[1, q] = jnp.where(acc0[q] >= 0, p0, -1)
                    g_scr[2, q] = acc0[q]
                return
            L0 = jnp.where(a_b0 >= 0, p0, jnp.int32(-1))
            neg = jnp.full((8, CHL), -1, jnp.int32)
            if emit_f:
                # Every in-chunk trajectory is absorbed by dead, which is
                # also the shard-end state.
                dpk = jnp.int32(plan["dead"] << plan["ms"])
                L0 = dpk | (L0 + 1)
                neg = jnp.full((8, CHL), dpk, jnp.int32)
            L_ref[0:8, :] = jnp.where(first00, L0, neg)
            if track_pid:
                ineg = jnp.full((8, CHL), -1, jnp.int32)
                I_ref[0:8, :] = jnp.where(first00, a_b0, ineg)
            for k in range(1, K):
                L_ref[k * 8:(k + 1) * 8, :] = neg
                if track_pid:
                    I_ref[k * 8:(k + 1) * 8, :] = ineg
            for q in range(Q):
                g_scr[0, q] = jnp.int32(plan["dead"])
                g_scr[1, q] = jnp.where(acc0[q] >= 0, p0, -1)
                g_scr[2, q] = acc0[q]

    @pl.when(~is_pad & ~skip_ok)
    def _heavy():
        _kernel_heavy(
            n, sk0_ref, t32, body_refs, K=K, CHL=CHL, plan=plan,
            track_pid=track_pid, nbc=nbc, step=step, posK=posK,
            srow=srow, lcol=lcol, emit_f=emit_f, count_only=count_only,
            rolled=rolled, interpret=interpret, text_ref=text_ref,
            t32_scr=t32_scr, sx_scr=sx_scr, sxi_scr=sxi_scr,
            g2_scr=g2_scr,
        )

    _gout(gout_ref, g_scr, Q, step, nbc)


def _gout(gout_ref, g_scr, Q, step, nbc):
    """Publish the final carry (the whole text's state-map summary)."""
    @pl.when(step == nbc - 1)
    def _():
        for r in range(3):
            for q in range(Q):
                gout_ref[r, q] = g_scr[r, q]


def _kernel_heavy(n, sk0_ref, t32, refs, *, K, CHL, plan, track_pid, nbc,
                  step, posK, srow, lcol, emit_f=False, count_only=False,
                  rolled=False, interpret=False, text_ref=None,
                  t32_scr=None, sx_scr=None, sxi_scr=None, g2_scr=None):
    C, Q, mb = plan["C"], plan["Q"], plan["mb"]
    ms = plan["ms"]
    dom = plan["dom"]
    nxt, acc = plan["nxt_cols"], plan["acc_cols"]
    MMASK = (1 << mb) - 1
    CH = 8 * CHL
    if count_only:
        (cnt_ref, sel_scr, g_scr) = refs
    elif track_pid:
        (L_ref, I_ref, sel_scr, isel_scr, g_scr) = refs
    else:
        (L_ref, sel_scr, g_scr) = refs

    # ---- 1. backward K-step select-chain scan --------------------------
    pk = [jnp.full((8, CHL), q << mb, jnp.int32) for q in range(Q)]
    if track_pid:
        pi = [jnp.full((8, CHL), -1, jnp.int32) for _ in range(Q)]

    if rolled:
        # ROLLED byte scan (large-Q compile-time form): ONE traced body in
        # a fori_loop instead of K unrolled steps. k is traced, so the
        # byte rows come from dynamic sublane slices — of the INT32 text
        # staged into scratch (8-bit VMEM refs tile as (32, 128) in
        # Mosaic; 8-row dynamic slices are only tile-aligned on a 32-bit
        # copy). The k==0 / k>=1 boundary emission variants are both
        # computed and blended, and the per-boundary stash goes through a
        # dynamic sublane store.
        t32_scr[:, :] = t32

        def _byte_body(i, carry):
            pk_ = list(carry[0])
            pi_ = list(carry[1]) if track_pid else None
            k = K - 1 - i
            b = t32_scr[pl.ds(k * 8, 8), :]
            masks = {
                cc: _range_mask(b, plan["class_runs"][cc])
                for cc in range(C)
                if cc != dom and cc in plan["class_runs"]
            }
            g = [pk_[nxt[dom][q]] for q in range(Q)]
            gi = [pi_[nxt[dom][q]] for q in range(Q)] if track_pid else None
            for cc, mcc in masks.items():
                for q in range(Q):
                    if nxt[cc][q] != nxt[dom][q]:
                        g[q] = jnp.where(mcc, pk_[nxt[cc][q]], g[q])
                        if track_pid:
                            gi[q] = jnp.where(mcc, pi_[nxt[cc][q]], gi[q])
            NW = (Q + 30) // 31
            hv = [None] * NW
            for cc in range(C):
                words = [0] * NW
                for q in range(Q):
                    if acc[cc][q] >= 0:
                        words[q // 31] |= 1 << (q % 31)
                if any(words):
                    mcc = (
                        _dom_complement(masks, b) if cc == dom
                        else masks[cc]
                    )
                    for w in range(NW):
                        if not words[w]:
                            continue
                        hv[w] = (
                            jnp.where(mcc, words[w], hv[w])
                            if hv[w] is not None
                            else jnp.where(mcc, words[w], 0)
                        )
            valid = (posK + k) < n
            for q in range(Q):
                mg = g[q] & MMASK
                later = mg > 0
                hw = hv[q // 31]
                if hw is None:
                    mnew = jnp.where(later, mg, 0)
                else:
                    hb = (hw >> (q % 31)) & 1
                    mnew = jnp.where(later, mg, hb * (k + 1))
                new = (g[q] & ~MMASK) | mnew
                pk_[q] = jnp.where(valid, new, pk_[q])
                if track_pid:
                    fresh = None
                    for cc in range(C):
                        if acc[cc][q] >= 0:
                            mcc = (
                                _dom_complement(masks, b)
                                if cc == dom else masks[cc]
                            )
                            fresh = (
                                jnp.where(mcc, acc[cc][q], fresh)
                                if fresh is not None
                                else jnp.where(mcc, acc[cc][q], -1)
                            )
                    if fresh is None:
                        fresh = jnp.full((8, CHL), -1, jnp.int32)
                    inew = jnp.where(later, gi[q], fresh)
                    pi_[q] = jnp.where(valid, inew, pi_[q])

            # Boundary-k emission: blend the k>=1 (prev-byte context) and
            # k==0 (precomputed sk0) variants on the traced k.
            if len(plan["s_rest"]) == 0 and len(plan["us0"]) == 1:
                sel = pk_[plan["s_def"]]
                isel = pi_[plan["s_def"]] if track_pid else None
            else:
                kprev = jnp.maximum(k - 1, 0)
                bprev = t32_scr[pl.ds(kprev * 8, 8), :]
                selB = pk_[plan["s_def"]]
                iselB = pi_[plan["s_def"]] if track_pid else None
                for us in plan["s_rest"]:
                    mu = _range_mask(bprev, plan["srun_by_state"][us])
                    selB = jnp.where(mu, pk_[us], selB)
                    if track_pid:
                        iselB = jnp.where(mu, pi_[us], iselB)
                sk0 = sk0_ref[:]
                selU = pk_[plan["us0"][0]]
                iselU = pi_[plan["us0"][0]] if track_pid else None
                for us in plan["us0"][1:]:
                    mu = sk0 == us
                    selU = jnp.where(mu, pk_[us], selU)
                    if track_pid:
                        iselU = jnp.where(mu, pi_[us], iselU)
                sel = jnp.where(k == 0, selU, selB)
                isel = (
                    jnp.where(k == 0, iselU, iselB) if track_pid else None
                )
            sel_scr[pl.ds(k * 8, 8), :] = sel
            if track_pid:
                isel_scr[pl.ds(k * 8, 8), :] = isel
            return (tuple(pk_), tuple(pi_) if track_pid else ())

        carry = (tuple(pk), tuple(pi) if track_pid else ())
        carry = jax.lax.fori_loop(0, K, _byte_body, carry)
        pk = list(carry[0])
        if track_pid:
            pi = list(carry[1])

    for k in (() if rolled else reversed(range(K))):
        b = t32[k * 8:(k + 1) * 8, :]                   # (8, CHL)
        masks = {
            cc: _range_mask(b, plan["class_runs"][cc])
            for cc in range(C)
            if cc != dom and cc in plan["class_runs"]
        }
        g = [pk[nxt[dom][q]] for q in range(Q)]
        if track_pid:
            gi = [pi[nxt[dom][q]] for q in range(Q)]
        for cc, mcc in masks.items():
            for q in range(Q):
                if nxt[cc][q] != nxt[dom][q]:
                    g[q] = jnp.where(mcc, pk[nxt[cc][q]], g[q])
                    if track_pid:
                        gi[q] = jnp.where(mcc, pi[nxt[cc][q]], gi[q])
        # Accept bits blended per class into 31-bit int32 word planes
        # (bit q lives in word q//31 — a single plane overflows int32 as
        # soon as an accepting state index reaches 32).
        NW = (Q + 30) // 31
        hv = [None] * NW
        for cc in range(C):
            words = [0] * NW
            for q in range(Q):
                if acc[cc][q] >= 0:
                    words[q // 31] |= 1 << (q % 31)
            if any(words):
                mcc = (
                    _dom_complement(masks, b) if cc == dom else masks[cc]
                )
                for w in range(NW):
                    if not words[w]:
                        continue
                    hv[w] = (
                        jnp.where(mcc, words[w], hv[w])
                        if hv[w] is not None
                        else jnp.where(mcc, words[w], 0)
                    )
        valid = (posK + k) < n
        for q in range(Q):
            mg = g[q] & MMASK
            later = mg > 0
            hw = hv[q // 31]
            if hw is None:
                mnew = jnp.where(later, mg, 0)
            else:
                hb = (hw >> (q % 31)) & 1
                mnew = jnp.where(later, mg, hb * (k + 1))
            new = (g[q] & ~MMASK) | mnew
            pk[q] = jnp.where(valid, new, pk[q])
            if track_pid:
                fresh = None
                for cc in range(C):
                    if acc[cc][q] >= 0:
                        mcc = (
                            _dom_complement(masks, b)
                            if cc == dom else masks[cc]
                        )
                        fresh = (
                            jnp.where(mcc, acc[cc][q], fresh)
                            if fresh is not None
                            else jnp.where(mcc, acc[cc][q], -1)
                        )
                if fresh is None:
                    fresh = jnp.full((8, CHL), -1, jnp.int32)
                inew = jnp.where(later, gi[q], fresh)
                pi[q] = jnp.where(valid, inew, pi[q])

        # Boundary-k emission at the boundary's start state (stashed for
        # the post-scan splice).
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
        sel_scr[k * 8:(k + 1) * 8, :] = sel
        if track_pid:
            isel_scr[k * 8:(k + 1) * 8, :] = isel

    # ---- 2. in-kernel cross-column suffix scan -------------------------
    # Absolute-position packed block summaries: f << ms | (m_abs + 1).
    S = []
    Si = [] if track_pid else None
    for q in range(Q):
        mrel = pk[q] & MMASK
        mabs1 = jnp.where(mrel > 0, posK + mrel, 0)      # m_abs + 1
        S.append(((pk[q] >> mb) << ms) | mabs1)
        if track_pid:
            Si.append(pi[q])

    # Exclusive suffix seed: shift by one block, filling the right edge
    # with the carried global suffix (per-state scalars from SMEM).
    Sx = []
    Sxi = [] if track_pid else None
    for q in range(Q):
        gfill = (g_scr[0, q] << ms) | (g_scr[1, q] + 1)
        Sx.append(_shift_cols(S[q], 1, CHL, srow, lcol, gfill))
        if track_pid:
            Sxi.append(
                _shift_cols(Si[q], 1, CHL, srow, lcol, g_scr[2, q])
            )
    if not rolled:
        d = 1
        while d < CH:
            Sh = [
                _shift_cols(Sx[q], d, CHL, srow, lcol, jnp.int32(q << ms))
                for q in range(Q)
            ]
            Shi = (
                [
                    _shift_cols(Sxi[q], d, CHL, srow, lcol, jnp.int32(-1))
                    for q in range(Q)
                ]
                if track_pid else None
            )
            Sx, Sxi = _combine_packed(Sx, Sh, Sxi, Shi, Q=Q, ms=ms)
            d *= 2
    else:
        # ---- ROLLED doubling scan (large-Q compile-time form) ----------
        # The unrolled scan traces log2(CH) levels x Q^2 selects — the
        # Mosaic compile wall at Q ~ 20+ (bench/NOTES.md "large-Q").
        # Rolled form, O(Q) trace per level family:
        #   * the running suffix lives in VMEM scratch (sx_scr, one 8-row
        #     band per state);
        #   * each level family is ONE fori_loop body (shift amounts are
        #     traced rotates): the body reads the Q bands STATICALLY into
        #     vregs, builds the shifted Sh list, then an INNER fori over
        #     output states q reads band q dynamically, applies the
        #     Q-term select chain over the vreg-resident Sh list, and
        #     writes band q back IN PLACE — safe because out[q] depends
        #     only on A[q] and the pre-level Sh values, never on other
        #     bands' updates.
        # Level family 1: d = 1..CHL/2 — lane rotates (traced) + the
        # static next-sublane fixup. Level family 2: d = CHL*2^j,
        # j = 0..2 — sublane rotates (traced).
        MM = (1 << ms) - 1
        for q in range(Q):
            sx_scr[q * 8:(q + 1) * 8, :] = Sx[q]
            if track_pid:
                sxi_scr[q * 8:(q + 1) * 8, :] = Sxi[q]

        def _level(mk_shift):
            """One level family body: mk_shift(x, lvl, fill) -> shifted."""
            def body(lvl, c):
                A = [sx_scr[q * 8:(q + 1) * 8, :] for q in range(Q)]
                Sh = [
                    mk_shift(A[q], lvl, jnp.int32(q << ms))
                    for q in range(Q)
                ]
                if track_pid:
                    Ai = [
                        sxi_scr[q * 8:(q + 1) * 8, :] for q in range(Q)
                    ]
                    Shi = [
                        mk_shift(Ai[q], lvl, jnp.int32(-1))
                        for q in range(Q)
                    ]

                def q_body(q, c2):
                    a = sx_scr[pl.ds(q * 8, 8), :]
                    t = a >> ms
                    r = Sh[0]
                    for qq in range(1, Q):
                        r = jnp.where(t == qq, Sh[qq], r)
                    later = (r & MM) > 0
                    out = jnp.where(later, r, (r & ~MM) | (a & MM))
                    sx_scr[pl.ds(q * 8, 8), :] = out
                    if track_pid:
                        ai = sxi_scr[pl.ds(q * 8, 8), :]
                        ri = Shi[0]
                        for qq in range(1, Q):
                            ri = jnp.where(t == qq, Shi[qq], ri)
                        sxi_scr[pl.ds(q * 8, 8), :] = jnp.where(
                            later, ri, ai
                        )
                    return c2

                return jax.lax.fori_loop(0, Q, q_body, c)

            return body

        def _lane_shift(x, i, fill):
            d = jnp.int32(1) << i
            edge = CHL - d
            a = _roll_dyn(x, edge, 1, interpret)
            y = jnp.where(lcol < edge, a, jnp.roll(a, 7, axis=0))
            return jnp.where((srow == 7) & (lcol >= edge), fill, y)

        def _sub_shift(x, j, fill):
            m = jnp.int32(1) << j
            a = _roll_dyn(x, 8 - m, 0, interpret)
            return jnp.where(srow >= 8 - m, fill, a)

        lane_levels = CHL.bit_length() - 1          # d = 1 .. CHL/2
        if lane_levels:
            jax.lax.fori_loop(
                0, lane_levels, _level(_lane_shift), jnp.int32(0)
            )
        jax.lax.fori_loop(0, 3, _level(_sub_shift), jnp.int32(0))
        Sx = [sx_scr[q * 8:(q + 1) * 8, :] for q in range(Q)]
        if track_pid:
            Sxi = [sxi_scr[q * 8:(q + 1) * 8, :] for q in range(Q)]

    # ---- 4. carry update: G_new = combine(block_0, Sx[0]) --------------
    mask00 = (srow == 0) & (lcol == 0)

    def at00(v):
        return jnp.max(jnp.where(mask00, v, jnp.int32(_NEG)))

    if rolled:
        # ROLLED carry update: stash the per-state at-block-0 packed
        # values in SMEM, then one fori over q with a DYNAMIC SMEM read
        # at t = f0[q] — O(Q) trace instead of the Q^2 scalar chain.
        MM = (1 << ms) - 1
        for q in range(Q):
            g2_scr[0, q] = at00(S[q])
            g2_scr[1, q] = at00(Sx[q])
            g2_scr[2, q] = at00(Si[q]) if track_pid else jnp.int32(-1)
            g2_scr[3, q] = at00(Sxi[q]) if track_pid else jnp.int32(-1)

        def _carry_body(q, c):
            s_pk = g2_scr[0, q]
            t = s_pk >> ms
            sx_pk = g2_scr[1, t]
            gm = (sx_pk & MM) - 1
            later = gm >= 0
            m_new = jnp.where(later, gm, (s_pk & MM) - 1)
            g_scr[0, q] = sx_pk >> ms
            g_scr[1, q] = m_new
            if track_pid:
                g_scr[2, q] = jnp.where(later, g2_scr[3, t], g2_scr[2, q])
            else:
                g_scr[2, q] = jnp.where(m_new >= 0, 0, -1)
            return c

        jax.lax.fori_loop(0, Q, _carry_body, jnp.int32(0))
    else:  # carry update every step; the final value is the G output
        MM = (1 << ms) - 1
        f0 = [at00(S[q]) >> ms for q in range(Q)]
        m0 = [(at00(S[q]) & MM) - 1 for q in range(Q)]
        sxf = [at00(Sx[q]) >> ms for q in range(Q)]
        sxm = [(at00(Sx[q]) & MM) - 1 for q in range(Q)]
        if track_pid:
            i0 = [at00(Si[q]) for q in range(Q)]
            sxi = [at00(Sxi[q]) for q in range(Q)]
        for q in range(Q):
            t = f0[q]
            gf = _sel_scalar(t, sxf)
            gm = _sel_scalar(t, sxm, jnp.int32(-1))
            later = gm >= 0
            g_scr[0, q] = gf
            g_scr[1, q] = jnp.where(later, gm, m0[q])
            if track_pid:
                gi_ = _sel_scalar(t, sxi, jnp.int32(-1))
                g_scr[2, q] = jnp.where(later, gi_, i0[q])
            else:
                g_scr[2, q] = jnp.where(
                    jnp.where(later, gm, m0[q]) >= 0, 0, -1
                )

    # ---- 3. tail splice: absolute L (and I) tiles (or the count) -------
    if rolled:
        # ROLLED splice: one traced body; reads/writes at dynamic sublane
        # offsets. The count variant accumulates in the loop carry.
        def _splice_body(k, csum_):
            sel = sel_scr[pl.ds(k * 8, 8), :]
            F = sel >> mb
            lrel1 = sel & MMASK
            cmps = [F == q for q in range(Q)]
            mt = Sx[0]
            for q in range(1, Q):
                mt = jnp.where(cmps[q], Sx[q], mt)
            m_tail = (mt & ((1 << ms) - 1)) - 1
            later = m_tail >= 0
            L_abs = jnp.where(lrel1 > 0, posK + lrel1 - 1, -1)
            L_val = jnp.where(later, m_tail, L_abs)
            if count_only:
                ck = ((L_val >= 0) & (posK + k <= n)).astype(jnp.int32)
                return csum_ + ck
            if emit_f:
                L_val = ((mt >> ms) << ms) | (L_val + 1)
            L_ref[pl.ds(k * 8, 8), :] = L_val
            if track_pid:
                it = Sxi[0]
                for q in range(1, Q):
                    it = jnp.where(cmps[q], Sxi[q], it)
                isel = isel_scr[pl.ds(k * 8, 8), :]
                I_ref[pl.ds(k * 8, 8), :] = jnp.where(later, it, isel)
            return csum_

        csum = jax.lax.fori_loop(
            0, K, _splice_body, jnp.zeros((8, CHL), jnp.int32)
        )
        if count_only:
            cnt_ref[0, 0] = cnt_ref[0, 0] + jnp.sum(csum, dtype=jnp.int32)
        return

    csum = None
    for k in range(K):
        sel = sel_scr[k * 8:(k + 1) * 8, :]
        F = sel >> mb
        lrel1 = sel & MMASK
        cmps = [F == q for q in range(Q)]
        mt = Sx[0]
        for q in range(1, Q):
            mt = jnp.where(cmps[q], Sx[q], mt)
        m_tail = (mt & ((1 << ms) - 1)) - 1
        later = m_tail >= 0
        L_abs = jnp.where(lrel1 > 0, posK + lrel1 - 1, -1)
        L_val = jnp.where(later, m_tail, L_abs)
        if count_only:
            # The array path masks bidx > n in its epilogue; do it here.
            ck = ((L_val >= 0) & (posK + k <= n)).astype(jnp.int32)
            csum = ck if csum is None else (csum + ck)
            continue
        if emit_f:
            # Shard mode: pack the boundary's end-of-text state (for the
            # caller's cross-shard tail splice) above the local L.
            L_val = ((mt >> ms) << ms) | (L_val + 1)
        L_ref[k * 8:(k + 1) * 8, :] = L_val
        if track_pid:
            it = Sxi[0]
            for q in range(1, Q):
                it = jnp.where(cmps[q], Sxi[q], it)
            isel = isel_scr[k * 8:(k + 1) * 8, :]
            I_ref[k * 8:(k + 1) * 8, :] = jnp.where(later, it, isel)
    if count_only:
        cnt_ref[0, 0] = cnt_ref[0, 0] + jnp.sum(csum, dtype=jnp.int32)


def start_states_for(st, prev_bytes):
    """Boundary start states from previous-byte context (shard halo)."""
    cls_runs, ctx_runs, nxt_cols, acc_cols, start_by_ctx, accept_eot = st
    start_runs = tuple(
        (lo, hi, start_by_ctx[v]) for lo, hi, v in ctx_runs
    )
    return schain_mod._by_runs(prev_bytes.astype(jnp.int32), start_runs)


def tile_text(text: jnp.ndarray, *, block: int, chl: int):
    """Pattern-independent (8, CHL) tiling of a padded text (cache this
    once per corpus x geometry; it is a full-size copy of the text)."""
    K, CHL = block, chl
    CH = 8 * CHL
    P = text.shape[0]
    assert P % (K * CH) == 0 and P > 0
    nb = P // K
    nbc = nb // CH
    # Tile layout: row k*8+s, lane l holds byte k of block ch*CH + s*CHL + l.
    return (
        text.reshape(nbc, 8, CHL, K)
        .transpose(0, 3, 1, 2)
        .reshape(nbc * K * 8, CHL)
    )


def stage_meta(st, text: jnp.ndarray, *, block: int, chl: int):
    """Pattern-DEPENDENT staging: per-block k=0 start states + the EOT
    start state (tiny vs the tiles)."""
    cls_runs, ctx_runs, nxt_cols, acc_cols, start_by_ctx, accept_eot = st
    K, CHL = block, chl
    CH = 8 * CHL
    P = text.shape[0]
    nb = P // K
    nbc = nb // CH
    start_runs = tuple(
        (lo, hi, start_by_ctx[v]) for lo, hi, v in ctx_runs
    )
    lastb = text.reshape(nb, K)[:, K - 1].astype(jnp.int32)
    prevb = jnp.concatenate([jnp.zeros(1, jnp.int32), lastb[:-1]])
    sk0 = schain_mod._by_runs(prevb, start_runs)
    sk0 = sk0.at[0].set(start_by_ctx[0])
    sk0_t = sk0.reshape(nbc * 8, CHL)
    start_eot = schain_mod._by_runs(
        text[-1:].astype(jnp.int32), start_runs
    )[0]
    return sk0_t, start_eot


def stage_text(st, text: jnp.ndarray, *, block: int, chl: int):
    """Stage a uint8 text into the kernel's device-resident corpus format.

    Returns (tiles, sk0_t, start_eot): the (8, CHL)-tiled byte layout,
    per-block k=0 start states, and the EOT-boundary start state. Staging
    is text-only work — a device-resident corpus is staged once and
    scanned many times (BASELINE.md protocol). For multi-pattern serving
    cache tile_text per corpus and stage_meta per pattern (DeviceCorpus
    does this)."""
    tiles = tile_text(text, block=block, chl=chl)
    sk0_t, start_eot = stage_meta(st, text, block=block, chl=chl)
    return tiles, sk0_t, start_eot


tile_text_device = jax.jit(
    tile_text, static_argnames=("block", "chl")
)
stage_meta_device = jax.jit(
    stage_meta, static_argnames=("st", "block", "chl")
)
stage_text_device = jax.jit(
    stage_text, static_argnames=("st", "block", "chl")
)


def solo_seed(plan, n):
    """Seed for a standalone text: identity map + EOT accepts at n."""
    Q = plan["Q"]
    ae = jnp.asarray(plan["accept_eot"], jnp.int32)
    return jnp.stack([
        jnp.arange(Q, dtype=jnp.int32),
        jnp.where(ae >= 0, jnp.int32(n), jnp.int32(-1)),
        ae,
    ])


def neutral_seed(Q):
    """Shard-mode seed: identity map, no matches beyond the text."""
    return jnp.stack([
        jnp.arange(Q, dtype=jnp.int32),
        jnp.full(Q, -1, jnp.int32),
        jnp.full(Q, -1, jnp.int32),
    ])


def call_fused(
    st,
    n_patterns: int,
    staged,
    n: jnp.ndarray,
    *,
    block: int = 32,
    chl: int = DEFAULT_CHL,
    interpret: bool = False,
    use_ff: bool = True,
    seed=None,
    emit_f: bool = False,
    count_only: bool = False,
    rolled: bool = False,
):
    """Run the kernel on staged text; returns (L_tiles, I_tiles|None,
    G, plan, shapes). `seed` is the (3, Q) suffix tail at the right edge
    (default: the standalone EOT seed); `emit_f` packs each boundary's
    end-of-text state above its local L (shard mode); G is the final
    carry — the whole text's (f, m, i) state-map summary. `count_only`
    emits no L/I at all — just the candidate count (a pure reduction; the
    MatchAllCount path for overlap-free patterns): L_tiles is then the
    (1, 1) count and I_tiles is None. `rolled` selects the fori_loop form
    of the doubling scan (large-Q compile-time mitigation; bit-equal)."""
    K = block
    CHL = chl
    assert CHL & (CHL - 1) == 0, "chl must be a power of two"
    tiles, sk0_t, _start_eot = staged
    P = tiles.shape[0] * CHL
    nb = P // K
    nbc = nb // (8 * CHL)
    plan = _plan(st, K)
    assert P <= max_p(plan["Q"]), (
        f"text of {P} bytes exceeds the packed-position limit "
        f"{max_p(plan['Q'])} for Q={plan['Q']} states; use the sharded or "
        "streaming wrappers"
    )
    plan["skip"] = plan["skip"] and use_ff
    Q = plan["Q"]
    track_pid = n_patterns > 1 and not count_only
    if count_only:
        assert not emit_f
    if seed is None:
        seed = solo_seed(plan, n)

    nlim = jnp.asarray([n], dtype=jnp.int32)
    rev = lambda i: (nbc - 1 - i, 0)  # noqa: E731  right-to-left grid
    if count_only:
        out_shapes = [jax.ShapeDtypeStruct((1, 1), jnp.int32)]
        out_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)
        ]
    else:
        out_shapes = [jax.ShapeDtypeStruct((nbc * K * 8, CHL), jnp.int32)]
        out_specs = [
            pl.BlockSpec((K * 8, CHL), rev, memory_space=pltpu.VMEM)
        ]
    scratch = [
        pltpu.VMEM((K * 8, CHL), jnp.int32),             # sel stash
        pltpu.SMEM((3, Q), jnp.int32),                   # global suffix
    ]
    if rolled:
        # int32 text copy for tile-aligned dynamic byte-row slices.
        scratch.append(pltpu.VMEM((K * 8, CHL), jnp.int32))
        # running suffix bands (one 8-row band per state) for the O(Q)
        # -trace rolled combine.
        scratch.append(pltpu.VMEM((Q * 8, CHL), jnp.int32))
        if track_pid:
            scratch.append(pltpu.VMEM((Q * 8, CHL), jnp.int32))
        # at-block-0 packed values for the rolled carry update.
        scratch.append(pltpu.SMEM((4, Q), jnp.int32))
    if track_pid:
        out_shapes.append(
            jax.ShapeDtypeStruct((nbc * K * 8, CHL), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec((K * 8, CHL), rev, memory_space=pltpu.VMEM)
        )
        scratch.insert(1, pltpu.VMEM((K * 8, CHL), jnp.int32))
    # Final-carry output (tiny, SMEM resident across the grid).
    out_shapes.append(jax.ShapeDtypeStruct((3, Q), jnp.int32))
    out_specs.append(
        pl.BlockSpec((3, Q), lambda i: (0, 0), memory_space=pltpu.SMEM)
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, K=K, CHL=CHL, plan=plan, track_pid=track_pid, nbc=nbc,
            branchless=interpret, emit_f=emit_f, count_only=count_only,
            rolled=rolled, interpret=interpret,
        ),
        grid=(nbc,),
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, CHL), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((K * 8, CHL), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Default scoped-VMEM budget is 16 MB; v5e has 128 MB
            # physical VMEM. The wide geometry (CHL=512, round 4:
            # +15-26% throughput) needs ~23-29 MB of double-buffered
            # tiles at Q~8 / multi-pattern, so raise the kernel budget
            # (measured no regression at the narrow geometry).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nlim, seed, sk0_t, tiles)
    L_tiles = out[0]
    I_tiles = out[1] if track_pid else None
    G = out[-1]
    return L_tiles, I_tiles, G, plan, (nb, nbc, K, CHL)


def untile(a, nbc, rows, CHL):
    """(nbc*rows*8, CHL) kernel tiles -> boundary-ordered (nbc*8*CHL*rows,)."""
    return (
        a.reshape(nbc, rows, 8, CHL)
        .transpose(0, 2, 3, 1)
        .reshape(nbc * 8 * CHL * rows)
    )


@functools.partial(
    jax.jit,
    static_argnames=("st", "n_patterns", "block", "chl", "interpret",
                     "use_ff", "rolled"),
)
def l_arrays_device_staged(
    st,
    n_patterns: int,
    staged,
    n: jnp.ndarray,
    *,
    block: int = 32,
    chl: int = DEFAULT_CHL,
    interpret: bool = False,
    use_ff: bool = True,
    rolled: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, I) from a staged corpus (see stage_text)."""
    L_tiles, I_tiles, _G, plan, (nb, nbc, K, CHL) = call_fused(
        st, n_patterns, staged, n, block=block, chl=chl,
        interpret=interpret, use_ff=use_ff, rolled=rolled,
    )
    P = nb * K
    L = untile(L_tiles, nbc, K, CHL)
    if I_tiles is not None:
        I = untile(I_tiles, nbc, K, CHL)
    else:
        I = jnp.where(L >= 0, 0, -1)

    # EOT boundary P + masking (as engine/schain.py finish_scan).
    start_eot = staged[2]
    ae = jnp.asarray(plan["accept_eot"], jnp.int32)
    eot_pid = schain_mod._sel_q(start_eot[None, None], ae[None, :])[0, 0]
    L_P = jnp.where(eot_pid >= 0, n, -1).astype(jnp.int32)
    L = jnp.concatenate([L, L_P[None]])
    I = jnp.concatenate([I, eot_pid[None]])
    bidx = jnp.arange(P + 1, dtype=jnp.int32)
    L = jnp.where(bidx <= n, L, -1)
    I = jnp.where(bidx <= n, I, -1)
    return L, I


@functools.partial(
    jax.jit,
    static_argnames=("st", "n_patterns", "block", "chl", "interpret",
                     "use_ff", "rolled"),
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
    use_ff: bool = True,
    rolled: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for engine/schain.l_arrays_device_schain.

    `st` = schain.static_tables(tables); `text` uint8 of length P, a
    multiple of block*8*chl (and <= max_p(Q)); `n` int32 scalar length.
    """
    staged = stage_text(st, text, block=block, chl=chl)
    return l_arrays_device_staged(
        st, n_patterns, staged, n, block=block, chl=chl,
        interpret=interpret, use_ff=use_ff, rolled=rolled,
    )


@functools.partial(
    jax.jit,
    static_argnames=("st", "n_patterns", "block", "chl", "interpret",
                     "use_ff", "rolled"),
)
def count_device_staged(
    st,
    n_patterns: int,
    staged,
    n: jnp.ndarray,
    *,
    block: int = 32,
    chl: int = DEFAULT_CHL,
    interpret: bool = False,
    use_ff: bool = True,
    rolled: bool = False,
) -> jnp.ndarray:
    """Candidate count as a pure device reduction — no L/I arrays ever
    materialize (MatchAllCount for overlap-free patterns: every candidate
    is a match, so the count IS the answer). Sparse corpora run at the
    text-streaming floor (the skip branch writes nothing)."""
    cnt, _none, _G, plan, _dims = call_fused(
        st, n_patterns, staged, n, block=block, chl=chl,
        interpret=interpret, use_ff=use_ff, count_only=True,
        rolled=rolled,
    )
    # EOT boundary: emitted by the kernel when n < P (it is an ordinary
    # in-range boundary there); only n == P needs the epilogue row.
    P = _dims[0] * _dims[2]
    start_eot = staged[2]
    ae = jnp.asarray(plan["accept_eot"], jnp.int32)
    eot_pid = schain_mod._sel_q(start_eot[None, None], ae[None, :])[0, 0]
    return cnt[0, 0] + jnp.where(
        (n == P) & (eot_pid >= 0), 1, 0
    )
