"""Class-run engine: patterns of the form [class]{lo,hi} (incl. +, *ish).

The workhorse for BASELINE config 2 (`[a-z]+`) and tokenizer-style classes:
maximal runs of a byte class are found with a membership LUT + one reverse
cumulative-min (next non-member index) — ~5 vector ops per byte, no DFA.

Exact leftmost-longest semantics: for boundary s inside a run ending at e,
L[s] = min(s + hi, e) provided the run from s has at least `lo` bytes.
(docs/SEMANTICS.md; differential-tested vs the oracle.)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compile import ir


def detect(node) -> Optional[Tuple[int, int, Optional[int]]]:
    """If the pattern is exactly [class]{lo,hi} with lo >= 1, return
    (bitmap, lo, hi). CharClass alone counts as {1,1}."""
    from ..compile.analysis import classrun_of

    return classrun_of(node)


def member_lut(bitmap: int) -> np.ndarray:
    lut = np.zeros(256, dtype=np.int32)
    for b in range(256):
        lut[b] = (bitmap >> b) & 1
    return lut


@functools.partial(jax.jit, static_argnames=("lo", "has_hi", "hi"))
def classrun_l_arrays_device(
    lut: jnp.ndarray,
    text: jnp.ndarray,
    n: jnp.ndarray,
    *,
    lo: int,
    has_hi: bool,
    hi: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, I) of length P+1 for a class-run pattern over padded text."""
    P = text.shape[0]
    pos = jnp.arange(P, dtype=jnp.int32)
    inc = (lut[text.astype(jnp.int32)] > 0) & (pos < n)
    # Next non-member boundary at/after each position (reverse cummin).
    nm_pos = jnp.where(inc, jnp.int32(2**30), pos)
    ne = jax.lax.cummin(nm_pos, axis=0, reverse=True)
    run_end = jnp.minimum(ne, n)                    # run from s ends here
    L = jnp.where(
        inc & (run_end - pos >= lo),
        jnp.minimum(pos + hi, run_end) if has_hi else run_end,
        -1,
    )
    I = jnp.where(L >= 0, 0, -1)
    # Boundary P (and any boundary >= n) has no match (lo >= 1).
    L = jnp.concatenate([L, jnp.full(1, -1, jnp.int32)])
    I = jnp.concatenate([I, jnp.full(1, -1, jnp.int32)])
    return L, I
