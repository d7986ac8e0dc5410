"""Device-side non-overlap selection via pointer doubling.

The MatchAll selection rule (docs/SEMANTICS.md) is sequential by definition;
SURVEY.md §7.2.5 resolves it with a pass over the *sparse candidate list*.
The host C++ walk (native/select.cc) is fine for sparse results, but dense
workloads (tokenizers: ~1 match / 3 bytes) would transfer O(text) candidate
arrays off-device. This module keeps selection ON device:

  1. candidates j (positions with L >= 0, compacted) get a jump function
     fc[j] = ordinal of the next candidate at/after the resume position of
     match j  (resume = end, or start+1 for empty matches);
  2. pointer doubling over fc yields the total selected count (gather
     -compose, log2 rounds) and the selected-orbit mask (scatter per round);
  3. only the selected matches are compacted and transferred.

fc is strictly increasing, so the doubling gathers stream monotonically.
Works for every pattern; per-shard composition for the multi-host path uses
the same tables with a D-step resume walk (rejit_tpu/dist/sharded.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rounds(k: int) -> int:
    r = 0
    while (1 << r) <= k:
        r += 1
    return r


@functools.partial(jax.jit, static_argnames=("cap",))
def selection_mask_device(
    L: jnp.ndarray, I: jnp.ndarray, *, cap: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Select non-overlapping matches among the first `cap` candidates.

    Returns (sel, pos, end, pid, n_selected): boolean orbit mask over the
    candidate slots plus the candidate arrays themselves.
    `cap` must be >= the true candidate count (two-phase sizing as in
    spans.py)."""
    (pos,) = jnp.nonzero(L >= 0, size=cap, fill_value=-1)
    pos = pos.astype(jnp.int32)
    valid = pos >= 0
    safe = jnp.where(valid, pos, 0)
    end = jnp.where(valid, L[safe], -1)
    pid = jnp.where(valid, I[safe], -1)

    # Ordinal of the next candidate at-or-after each boundary: exclusive
    # cumulative count of candidates before the boundary.
    P1 = L.shape[0]
    cand = (L >= 0).astype(jnp.int32)
    ord_ = jnp.cumsum(cand) - cand                      # (P1,)

    # Jump in candidate-ordinal space; sentinel = cap (self-loop).
    resume = jnp.maximum(end, pos + 1)                  # strictly > pos
    in_range = valid & (resume < P1)
    fc = jnp.where(
        in_range, ord_[jnp.where(in_range, resume, 0)], cap
    ).astype(jnp.int32)
    # Jumps landing past the last real candidate go to the sentinel.
    fc = jnp.where(fc >= cap, cap, fc)

    F = jnp.concatenate([fc, jnp.int32(cap)[None]])     # (cap+1,)
    C = jnp.concatenate(
        [valid.astype(jnp.int32), jnp.zeros(1, jnp.int32)]
    )
    R = jnp.zeros(cap + 1, dtype=jnp.bool_)
    has_any = valid[0] if cap > 0 else jnp.bool_(False)
    R = R.at[0].set(has_any)

    for _ in range(_rounds(cap)):
        # Orbit doubling: after round k, R holds the first 2^k chain nodes
        # and F jumps 2^k candidates at once.
        R = R | jnp.zeros_like(R).at[F].max(R)
        C = C + C[F]
        F = F[F]

    # C[j] = matches on the chain starting at candidate j (incl. j); the
    # selection chain starts at candidate ordinal 0.
    n_sel = jnp.where(has_any, C[0], 0)
    sel = R[:cap] & valid  # orbit may touch the sentinel-adjacent pad slots
    return sel, pos, end, pid, n_sel


@functools.partial(jax.jit, static_argnames=("out_cap",))
def compact_selected_device(sel, pos, end, pid, *, out_cap: int):
    (idx,) = jnp.nonzero(sel, size=out_cap, fill_value=-1)
    ok = idx >= 0
    safe = jnp.where(ok, idx, 0)
    return (
        jnp.where(ok, pos[safe], -1),
        jnp.where(ok, end[safe], -1),
        jnp.where(ok, pid[safe], -1),
    )


def _bucket(c: int) -> int:
    cap = 16
    while cap < c:
        cap *= 4
    return cap


def match_all_device(
    L_dev: jnp.ndarray, I_dev: jnp.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full device-side MatchAll: returns host (starts, ends, pids) of the
    SELECTED matches only (transfer O(#matches))."""
    from .spans import candidate_count

    c = int(candidate_count(L_dev))
    if c == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    cap = _bucket(c)
    sel, pos, end, pid, n_sel = selection_mask_device(L_dev, I_dev, cap=cap)
    k = int(n_sel)
    if k == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    out_cap = _bucket(k)
    s, e, p = compact_selected_device(sel, pos, end, pid, out_cap=out_cap)
    return (
        np.asarray(s)[:k].astype(np.int64),
        np.asarray(e)[:k].astype(np.int64),
        np.asarray(p)[:k].astype(np.int64),
    )


def match_all_count_device(L_dev: jnp.ndarray, I_dev: jnp.ndarray) -> int:
    from .spans import candidate_count

    c = int(candidate_count(L_dev))
    if c == 0:
        return 0
    cap = _bucket(c)
    _, _, _, _, n_sel = selection_mask_device(L_dev, I_dev, cap=cap)
    return int(n_sel)
