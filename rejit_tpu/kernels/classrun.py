r"""Class-run engine: patterns of the form \b?[class]{lo,hi}\b? (incl. +).

The workhorse for BASELINE config 2 (`[a-z]+`) and tokenizer-style classes:
maximal runs of a byte class are found with a membership LUT + one reverse
cumulative-min (next non-member index) — ~5 vector ops per byte, no DFA.

Exact leftmost-longest semantics: for boundary s inside a run ending at e,
L[s] = min(s + hi, e) provided the run from s has at least `lo` bytes.
(docs/SEMANTICS.md; differential-tested vs the oracle.)

Word-boundary-wrapped runs (class all word bytes) stay elementwise — the
leading \b is "previous byte non-word", the trailing \b pins the end to
the maximal-run end e with text[e] non-word (low bit of the packed
reverse-cummin). This family is exactly the bounded-quantifier patterns
whose DFAs have Q ~ hi+2 states, where the rolled fused kernel falls off
~Q^1.5 (bench/NOTES.md "large-Q knee") — here they run at the
Q-independent classrun rate. Reference behavior: rejit's state-ring is
linear in pattern size for these (SURVEY.md §2.1/C6, unverified recall).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compile import ir


def detect(node) -> Optional[Tuple[int, int, Optional[int], bool, bool]]:
    r"""If the pattern is `\b?[class]{lo,hi}\b?` with lo >= 1 (class all
    word bytes when a \b is present), return (bitmap, lo, hi, lead_wb,
    trail_wb). CharClass alone counts as {1,1}."""
    from ..compile.analysis import bclassrun_of

    return bclassrun_of(node)


def member_lut(bitmap: int) -> np.ndarray:
    lut = np.zeros(256, dtype=np.int32)
    for b in range(256):
        lut[b] = (bitmap >> b) & 1
    return lut


MAX_RUNS = 8  # membership via range compares up to this many runs


def bitmap_runs(bitmap: int) -> Optional[Tuple[Tuple[int, int], ...]]:
    """Contiguous byte ranges of a 256-bit class bitmap, or None when
    there are more than MAX_RUNS (then the 256-entry LUT gather wins).
    Range compares are pure VPU ops; the LUT is a dynamic gather — the
    round-1 lesson (bench/NOTES.md) says compares win by a wide margin
    on this chip ([a-z] = 1 run = 2 compares; \\w = 4 runs)."""
    runs = []
    b = 0
    while b < 256:
        if (bitmap >> b) & 1:
            lo = b
            while b < 256 and (bitmap >> b) & 1:
                b += 1
            runs.append((lo, b - 1))
            if len(runs) > MAX_RUNS:
                return None
        else:
            b += 1
    return tuple(runs)


def _member(ti: jnp.ndarray, runs, lut: jnp.ndarray) -> jnp.ndarray:
    """Class membership: static range compares when `runs` is given
    (compile-time tuple), else the LUT gather."""
    if runs is None:
        return lut[ti] > 0
    m = None
    for lo, hi in runs:
        c = (ti == lo) if lo == hi else ((ti >= lo) & (ti <= hi))
        m = c if m is None else (m | c)
    if m is None:
        return jnp.zeros(ti.shape, dtype=bool)
    return m


def _rcummin(x, pallas_scan: bool, interpret: bool):
    """Reverse cummin: the Pallas one-pass scan kernel when enabled
    (kernels/scan1d.py — measured 14x over the lax lowering on-chip,
    bit-equal), else lax. Requires len(x) % scan1d.STEP == 0 when on."""
    if pallas_scan:
        from . import scan1d

        return scan1d.rcummin(x, interpret=interpret)
    return jax.lax.cummin(x, axis=0, reverse=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "lo", "has_hi", "hi", "lead_wb", "trail_wb", "pallas_scan",
        "interpret", "class_runs", "word_runs",
    ),
)
def classrun_l_arrays_device(
    lut: jnp.ndarray,
    wlut: jnp.ndarray,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    lo: int,
    has_hi: bool,
    hi: int,
    lead_wb: bool = False,
    trail_wb: bool = False,
    pallas_scan: bool = False,
    interpret: bool = False,
    class_runs=None,
    word_runs=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""(L, I) of length P+1 for a `\b?[class]{lo,hi}\b?` run pattern.

    With a \b present the class is all word bytes (detect() guarantees),
    so the boundary tests are elementwise:
      * leading \b: previous byte non-word, or s == 0;
      * trailing \b: the ONLY viable match end is the maximal-run end e
        (every in-run byte is a word byte, so no interior boundary), and
        it matches iff text[e] is non-word or e == n. The stop byte's
        word-ness rides in the low bit of the reverse-cummin word.
    """
    P = text.shape[0]
    pos = jnp.arange(P, dtype=jnp.int32)
    ti = text.astype(jnp.int32)
    inc = _member(ti, class_runs, lut) & (pos < n)
    if trail_wb:
        # stop position acceptable <=> non-word byte there, or at/past n
        stop_ok = ~_member(ti, word_runs, wlut) | (pos >= n)
        nm = jnp.where(
            inc,
            jnp.int32(2**30),
            (pos << 1) | (1 - stop_ok.astype(jnp.int32)),
        )
        ne = _rcummin(nm, pallas_scan, interpret)
        # A run reaching the padded array end stops at n (EOT: \b holds).
        over = ne >= jnp.int32(2**30)
        e = jnp.where(over, n, ne >> 1)
        run_end = jnp.minimum(e, n)
        t_ok = over | ((ne & 1) == 0)
        jlen = run_end - pos
        ok = inc & t_ok & (jlen >= lo)
        if has_hi:
            ok = ok & (jlen <= hi)
        L = jnp.where(ok, run_end, -1)
    else:
        # Next non-member boundary at/after each position (reverse cummin).
        nm_pos = jnp.where(inc, jnp.int32(2**30), pos)
        ne = _rcummin(nm_pos, pallas_scan, interpret)
        run_end = jnp.minimum(ne, n)                # run from s ends here
        L = jnp.where(
            inc & (run_end - pos >= lo),
            jnp.minimum(pos + hi, run_end) if has_hi else run_end,
            -1,
        )
    if lead_wb:
        # inc[s] implies text[s] is a word byte; \b needs prev non-word.
        w = _member(ti, word_runs, wlut)
        prev_w = jnp.concatenate([jnp.zeros(1, dtype=bool), w[:-1]])
        L = jnp.where(prev_w, jnp.int32(-1), L)
    I = jnp.where(L >= 0, 0, -1)
    # Boundary P (and any boundary >= n) has no match (lo >= 1).
    L = jnp.concatenate([L, jnp.full(1, -1, jnp.int32)])
    I = jnp.concatenate([I, jnp.full(1, -1, jnp.int32)])
    return L, I
