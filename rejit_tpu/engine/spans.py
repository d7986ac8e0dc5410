"""Span emission: device-side candidate compaction.

TPU-native replacement for rejit's sequential match-record epilogue
(reference: rejit:src/x64/codegen-x64.cc match recording, unverified recall —
SURVEY.md §2.2 "segmented prefix-scan span emission"): candidate positions
(L[s] >= 0) are compacted on device via cumsum-scatter (jnp.nonzero with a
static size), so host transfer is O(#candidates), not O(text).

Two-phase sizing (SURVEY.md §7.2.3): a device count picks the static
compaction capacity (bucketed to bound recompiles), then the jitted gather
fills exactly that many slots.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def candidate_count(L: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(L >= 0, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_device(
    L: jnp.ndarray, I: jnp.ndarray, *, cap: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(pos, end, pid) of the first `cap` candidates; pos == -1 past count."""
    (pos,) = jnp.nonzero(L >= 0, size=cap, fill_value=-1)
    pos = pos.astype(jnp.int32)
    valid = pos >= 0
    safe = jnp.where(valid, pos, 0)
    end = jnp.where(valid, L[safe], -1)
    pid = jnp.where(valid, I[safe], -1)
    return pos, end, pid


def _bucket_cap(c: int) -> int:
    cap = 16
    while cap < c:
        cap *= 4
    return cap


@functools.partial(jax.jit, static_argnames=("cap", "overlap_free"))
def spans_device(
    L: jnp.ndarray, I: jnp.ndarray, *, cap: int, overlap_free: bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full span production ON DEVICE: (starts, ends, pids, n_selected).

    The honest spans-out MatchAll program (bench headline): candidate
    compaction plus, for patterns whose matches can overlap, the
    pointer-doubling non-overlap selection (engine/select_device.py).
    `cap` must be >= the candidate count (two-phase sizing). For
    overlap-free patterns every candidate is a match and selection is the
    identity — that IS the algorithm, not a shortcut (the analysis proves
    no two candidate spans can overlap)."""
    if overlap_free:
        pos, end, pid = compact_device(L, I, cap=cap)
        n_sel = jnp.sum(pos >= 0, dtype=jnp.int32)
        return pos, end, pid, n_sel
    from . import select_device

    sel, pos, end, pid, n_sel = select_device.selection_mask_device(
        L, I, cap=cap
    )
    s, e, p = select_device.compact_selected_device(
        sel, pos, end, pid, out_cap=cap
    )
    return s, e, p, n_sel


def candidates_host(
    L_dev: jnp.ndarray, I_dev: jnp.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact on device, return host (pos, end, pid) arrays (sorted by pos)."""
    c = int(candidate_count(L_dev))
    if c == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z.copy(), z.copy()
    cap = _bucket_cap(c)
    pos, end, pid = compact_device(L_dev, I_dev, cap=cap)
    pos = np.asarray(pos)[:c]
    end = np.asarray(end)[:c]
    pid = np.asarray(pid)[:c]
    return pos, end, pid
