r"""Class-run + literal-suffix engine: \b?[class]{lo,hi}LIT\b?.

The second large-Q bounded-quantifier family (after the pure runs in
kernels/classrun.py): `[A-Za-z]{30,60}ing` compiles to a Q=152 DFA, where
the rolled fused kernel's ~Q^1.5 falloff leaves ~0.6 GB/s. Here the match
is decomposed elementwise, Q-independently:

  L[s] = max{ p : occ(p), s+lo <= p <= min(s+hi, e(s)) } + |S|

with occ(p) = "the literal S occurs at p" (|S| shifted compares) and
e(s) = the first non-class position at/after s — the cap "no non-class
byte in [s, p)". The windowed max collapses to THREE cumulative scans
via position-monotonicity of the occ values:

  * F = cummax(occ positions): F[x] = last occurrence <= x, and since F
    is non-decreasing, F[min(a,b)] = min(F[a], F[b]);
  * R = reverse cummin of F masked to non-class positions: R[p] =
    F[e(p)] — the min over later stops IS the first stop, again by
    monotonicity;
  * so best[s] = min(F[s+hi], R[s]) (= F[min(s+hi, e)]), taken when
    >= s+lo. No gathers, no doubling ladders (a log2(P)-round segmented
    doubling formulation measured 1.26 GB/s, HBM-bound; this is ~3x
    fewer array passes).

Optional \b's stay elementwise: leading \b needs class all word bytes and
lo >= 1 (then: previous byte non-word / BOT); trailing \b compares the
word-ness of the byte AFTER the literal against S's last byte.

Exact leftmost-longest semantics (docs/SEMANTICS.md): the longest match
at s is the largest literal position p, since total length = p - s + |S|.
Differential-tested vs the oracle; reference behavior class: rejit's
state-ring is linear in pattern size (SURVEY.md §2.1/C6, unverified
recall).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MAX_SUFFIX = 16  # static unroll bound for the occ compares


def detect(node) -> Optional[tuple]:
    """If the pattern is `\\b?[class]{lo,hi}LIT\\b?`, return
    (bitmap, lo, hi, suffix_bytes, lead_wb, trail_wb)."""
    from ..compile.analysis import classlit_of

    return classlit_of(node)


def _shl(x: jnp.ndarray, d: int, fill) -> jnp.ndarray:
    """x shifted left by d (element p reads x[p+d]), filled at the end."""
    if d == 0:
        return x
    P = x.shape[0]
    d = min(d, P)
    pad = jnp.full((d,), fill, x.dtype)
    return jnp.concatenate([x[d:], pad])


@functools.partial(
    jax.jit,
    static_argnames=(
        "lo", "has_hi", "hi", "sfx", "lead_wb", "trail_wb", "pallas_scan",
        "interpret", "class_runs", "word_runs",
    ),
)
def classlit_l_arrays_device(
    lut: jnp.ndarray,
    wlut: jnp.ndarray,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    lo: int,
    has_hi: bool,
    hi: int,
    sfx: Tuple[int, ...],
    lead_wb: bool = False,
    trail_wb: bool = False,
    pallas_scan: bool = False,
    interpret: bool = False,
    class_runs=None,
    word_runs=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, I) of length P+1 for a class-run + literal-suffix pattern."""
    P = text.shape[0]
    m = len(sfx)
    pos = jnp.arange(P, dtype=jnp.int32)
    ti = text.astype(jnp.int32)
    from .classrun import _member

    inc = _member(ti, class_runs, lut) & (pos < n)

    # occ[p]: S at p (within n), plus the trailing-\b condition.
    occ = pos + m <= n
    for j, b in enumerate(sfx):
        occ = occ & (_shl(ti, j, 0) == b)
    if trail_wb:
        # \b after the literal: word-ness flips at p+m (EOT is non-word).
        from ..compile.ir import WORD

        after_w = _shl(_member(ti, word_runs, wlut).astype(jnp.int32), m, 0) > 0
        after_w = after_w & (pos + m < n)
        s_last_w = bool((WORD >> sfx[-1]) & 1)  # static
        occ = occ & (after_w != s_last_w)
    val = jnp.where(occ, pos, -1)

    # The windowed max collapses to TWO cumulative scans because val is
    # position-monotone: F[x] = cummax(val)[x] = the LAST occ position
    # <= x, so max{occ q : q <= cap} = F[cap], and F[min(a, b)] =
    # min(F[a], F[b]) (F non-decreasing). The run cap e(s) enters as
    # R[p] = F[e(p)]: mask F to non-member (stop) positions and reverse-
    # cummin — the min over later stops IS the first stop, again by
    # monotonicity. (An earlier log2(P)-round segmented doubling measured
    # 1.26 GB/s HBM-bound; this form is 3 scans total.)
    BIG = jnp.int32(2**30)
    if pallas_scan:
        # One-pass Pallas scans (kernels/scan1d.py): measured 14x over
        # the lax lowerings on-chip, bit-equal.
        from . import scan1d

        F = scan1d.cummax(val, interpret=interpret)
        R = scan1d.rcummin(jnp.where(inc, BIG, F), interpret=interpret)
    else:
        F = jax.lax.cummax(val, axis=0)
        R = jax.lax.cummin(jnp.where(inc, BIG, F), axis=0, reverse=True)
    F_last = F[-1]
    if has_hi:
        # F[s+hi] with everything past the array covered by F_last.
        f2 = jnp.concatenate(
            [F[min(hi, P):], jnp.broadcast_to(F_last, (min(hi, P),))]
        ) if hi else F
        cand = jnp.minimum(f2, R)        # F[min(s+hi, e)]; R==BIG -> +inf
    else:
        cand = jnp.where(R >= BIG, F_last, R)       # cap is e (or EOT)
    best = jnp.where(cand >= pos + lo, cand, -1)

    L = jnp.where(best >= 0, best + m, -1)
    if lead_wb:
        # class is all word bytes and lo >= 1 (detect() guarantees), so
        # the leading \b is: previous byte non-word, or s == 0.
        w = _member(ti, word_runs, wlut)
        prev_w = jnp.concatenate([jnp.zeros(1, dtype=bool), w[:-1]])
        L = jnp.where(prev_w, jnp.int32(-1), L)
    I = jnp.where(L >= 0, 0, -1)
    L = jnp.concatenate([L, jnp.full(1, -1, jnp.int32)])
    I = jnp.concatenate([I, jnp.full(1, -1, jnp.int32)])
    return L, I
