"""Literal-pattern engine: vectorized shifted-compare matching.

TPU-native equivalent of rejit's FastForwardGen SSE literal scan (reference:
rejit:src/x64/codegen-x64.cc FastForwardGen, unverified recall — SURVEY.md
§2.1/C6): instead of 16-byte pcmpeqb loops, the whole text is compared
against each literal byte at a static shift and AND-reduced — XLA fuses this
into one streaming pass per literal at VPU width. The fused match->spans
Pallas kernel lives in rejit_tpu/kernels/extract_pallas.py.

The caller pads `text` with `max_len(lits)` trailing bytes (any value) so
shifted slices stay in bounds; `n` is the true length.

Fast path: when compile analysis proves the literal set overlap-free
(rejit_tpu/compile/analysis.py), MatchAllCount == total hit count, a pure
on-device reduction with no span materialization.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _hit_mask(text_ext: jnp.ndarray, P: int, lit) -> jnp.ndarray:
    """(P,) bool: lit occurs at position i (ignoring text-length validity).

    `lit` is `bytes` or a class-literal (tuple of per-position tuples of
    byte values — analysis.ClassLit, e.g. (?i)-folded literals): a class
    position is the OR of |class| shifted compares, so the scan stays
    elementwise and XLA still fuses everything into one pass."""
    if isinstance(lit, bytes):
        eq = text_ext[0:P] == lit[0]
        for j in range(1, len(lit)):
            eq = jnp.logical_and(eq, text_ext[j : j + P] == lit[j])
        return eq
    eq = None
    for j, allowed in enumerate(lit):
        win = text_ext[j : j + P]
        pos_ok = win == allowed[0]
        for b in allowed[1:]:
            pos_ok = jnp.logical_or(pos_ok, win == b)
        eq = pos_ok if eq is None else jnp.logical_and(eq, pos_ok)
    return eq


@functools.partial(jax.jit, static_argnames=("lits", "P"))
def literal_count_device(
    text_ext: jnp.ndarray, n: jnp.ndarray, *, lits: Tuple[bytes, ...], P: int
) -> jnp.ndarray:
    """Total hit count (== MatchAllCount for overlap-free literal sets)."""
    pos = jnp.arange(P, dtype=jnp.int32)
    total = jnp.int32(0)
    for lit in lits:
        hits = _hit_mask(text_ext, P, lit) & (pos <= n - len(lit))
        total = total + jnp.sum(hits, dtype=jnp.int32)
    return total


@functools.partial(jax.jit, static_argnames=("lits", "P"))
def literal_mask_device(
    text_ext: jnp.ndarray, n: jnp.ndarray, *, lits: Tuple[bytes, ...], P: int
) -> jnp.ndarray:
    """(P,) bool candidate-start mask for EQUAL-LENGTH literal sets —
    the DIFFERENTIAL REFERENCE for literal_mask_packed_device (tests
    only; production uses the packed form + extract_rows_bitmask)."""
    assert len({len(l) for l in lits}) == 1, "fixed width required"
    pos = jnp.arange(P, dtype=jnp.int32)
    m = jnp.zeros(P, dtype=bool)
    for lit in lits:
        m = m | _hit_mask(text_ext, P, lit)
    return m & (pos <= n - len(lits[0]))


@functools.partial(jax.jit, static_argnames=("lits", "P", "row_w"))
def literal_mask_packed_device(
    text_ext: jnp.ndarray,
    n: jnp.ndarray,
    *,
    lits: Tuple[bytes, ...],
    P: int,
    row_w: int = 256,
) -> jnp.ndarray:
    """Bit-PACKED candidate-start mask for an OVERLAP-FREE literal set:
    (ceil(P/row_w)*row_w/32,) uint32, bit i of word j = candidate at
    position 32*j + i.

    Overlap-freedom (compile/analysis.py) means every candidate start IS
    a match start (no cross-candidate suppression), so the start mask —
    the OR of each literal's validity-masked hit mask — is the complete
    device-side result; the matched width and pattern id decode uniquely
    from the text bytes at the start, longest-literal-first (the L-array
    claim order, literal_l_arrays_device).

    The extraction peel (engine/spans.extract_rows_bitmask) is HBM-bound
    on its root operand; packing shrinks that operand 32x vs the bool
    mask (256x vs the (L, I) pair), so all peel rounds together cost less
    HBM traffic than one pass over the text. XLA fuses the shifted
    compares into the pack reduction — the bool mask is never
    materialized."""
    assert row_w % 32 == 0, row_w
    pos = jnp.arange(P, dtype=jnp.int32)
    m = jnp.zeros(P, dtype=bool)
    for lit in lits:
        m = m | (_hit_mask(text_ext, P, lit) & (pos <= n - len(lit)))
    Ppad = -(-P // row_w) * row_w
    m = jnp.concatenate([m, jnp.zeros(Ppad - P, dtype=bool)])
    bits = m.reshape(-1, 32).astype(jnp.uint32) << jnp.arange(
        32, dtype=jnp.uint32
    )
    return jnp.sum(bits, axis=1, dtype=jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("lits", "pids", "n_pat", "P", "row_w")
)
def literal_mask_packed_by_pid_device(
    text_ext: jnp.ndarray,
    n: jnp.ndarray,
    *,
    lits: Tuple[bytes, ...],
    pids: Tuple[int, ...],
    n_pat: int,
    P: int,
    row_w: int = 32,
) -> jnp.ndarray:
    """(n_pat, ceil(P/row_w)*row_w/32) uint32: per-pattern-id packed
    candidate-start masks, each pattern's literal set evaluated
    INDEPENDENTLY (no cross-pattern claim priority).

    This is the one-dispatch regexdna mode (reference semantics:
    rejit:sample/regexdna.cc counts each variant on its own scan —
    SURVEY.md §2.1/C12): XLA fuses every literal's shifted compares into
    ONE pass over the text; the per-pid bit-rows are the only HBM output
    (P/8 bytes each). Exact non-overlap counts are then a host-side
    greedy pass over the sparse candidate bits (api.match_all_count_each).
    """
    assert row_w % 32 == 0, row_w
    pos = jnp.arange(P, dtype=jnp.int32)
    Ppad = -(-P // row_w) * row_w
    shift = jnp.arange(32, dtype=jnp.uint32)
    rows = []
    for p in range(n_pat):
        m = jnp.zeros(P, dtype=bool)
        for lit, pid in zip(lits, pids):
            if pid != p:
                continue
            m = m | (_hit_mask(text_ext, P, lit) & (pos <= n - len(lit)))
        m = jnp.concatenate([m, jnp.zeros(Ppad - P, dtype=bool)])
        bits = m.reshape(-1, 32).astype(jnp.uint32) << shift
        rows.append(jnp.sum(bits, axis=1, dtype=jnp.uint32))
    return jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("lits", "pids", "P"))
def literal_l_arrays_device(
    text_ext: jnp.ndarray,
    n: jnp.ndarray,
    *,
    lits: Tuple[bytes, ...],
    pids: Tuple[int, ...],
    P: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, I) arrays (length P+1) for a literal-alternation pattern set.

    Leftmost-longest with lowest-pattern-id tie-break: literals are visited
    longest-first (ties by pattern id), first writer wins per position.
    """
    pos = jnp.arange(P, dtype=jnp.int32)
    L = jnp.full(P, -1, dtype=jnp.int32)
    I = jnp.full(P, -1, dtype=jnp.int32)
    order = sorted(range(len(lits)), key=lambda i: (-len(lits[i]), pids[i], i))
    for idx in order:
        lit = lits[idx]
        hits = _hit_mask(text_ext, P, lit) & (pos <= n - len(lit))
        claim = hits & (L < 0)
        L = jnp.where(claim, pos + len(lit), L)
        I = jnp.where(claim, pids[idx], I)
    L = jnp.concatenate([L, jnp.full(1, -1, jnp.int32)])
    I = jnp.concatenate([I, jnp.full(1, -1, jnp.int32)])
    return L, I


def extend_pad(text: np.ndarray, P: int, extra: int) -> np.ndarray:
    """Pad a uint8 text to length P + extra with zero bytes."""
    out = np.zeros(P + extra, dtype=np.uint8)
    out[: len(text)] = text
    return out
