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


@jax.jit
def max_width(L: jnp.ndarray) -> jnp.ndarray:
    """Largest match width among candidates (0 when none): sizes the
    packed-key extraction's end-offset bits for unbounded patterns."""
    pos = jnp.arange(L.shape[0], dtype=jnp.int32)
    return jnp.max(jnp.where(L >= 0, L - pos, 0))


@functools.partial(jax.jit, static_argnames=("row_w",))
def row_max_count(L: jnp.ndarray, *, row_w: int = 256) -> jnp.ndarray:
    """Max candidates in any row_w-boundary row (for row_cap sizing)."""
    n = L.shape[0]
    R = -(-n // row_w)
    pad = jnp.full(R * row_w - n, -1, L.dtype)
    rows = jnp.concatenate([L, pad]).reshape(R, row_w)
    return jnp.max(jnp.sum(rows >= 0, axis=1, dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("row_w", "row_cap"))
def extract_rows_device(
    L: jnp.ndarray, I: jnp.ndarray, *, row_w: int = 256, row_cap: int = 8
):
    """Gather-free candidate extraction: (pos, end, pid, counts) per row.

    jnp.nonzero-based compaction measured ~94 ms per 10 MB on v5e (XLA
    lowers it through sort/scatter — gather-class ops). This is the
    compare/select replacement: boundaries reshape to (R, row_w) rows and
    `row_cap` rounds of masked-argmin peel off the leftmost remaining
    candidate of every row simultaneously — each round is elementwise ops
    plus two lane reductions, so the whole extraction streams at VPU
    speed. Rows with more than row_cap candidates are detected via
    `counts` (two-phase: size row_cap from row_max_count).

    Returns pos/end/pid of shape (R, row_cap) (-1 padded, candidates in
    position order within each row) and counts (R,).
    """
    n = L.shape[0]
    R = -(-n // row_w)
    padL = jnp.full(R * row_w - n, -1, L.dtype)
    rows_L = jnp.concatenate([L, padL]).reshape(R, row_w)
    rows_I = jnp.concatenate([I, padL]).reshape(R, row_w)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, row_w), 1)
    base = jnp.arange(R, dtype=jnp.int32)[:, None] * row_w
    mask = rows_L >= 0
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    BIG = jnp.int32(1 << 30)
    pos_o, end_o, pid_o = [], [], []
    for _ in range(row_cap):
        cand = jnp.where(mask, lane, BIG)
        m = jnp.min(cand, axis=1)                    # (R,)
        hit = lane == m[:, None]
        got = m < BIG
        pos_o.append(jnp.where(got, m + base[:, 0], -1))
        end_o.append(
            jnp.where(got, jnp.max(jnp.where(hit, rows_L, -1), axis=1), -1)
        )
        pid_o.append(
            jnp.where(got, jnp.max(jnp.where(hit, rows_I, -1), axis=1), -1)
        )
        mask = mask & ~hit
    pos = jnp.stack(pos_o, axis=1)                   # (R, row_cap)
    end = jnp.stack(end_o, axis=1)
    pid = jnp.stack(pid_o, axis=1)
    return pos, end, pid, counts


@functools.partial(
    jax.jit, static_argnames=("row_w", "row_cap", "ebits")
)
def extract_rows_packed(
    L: jnp.ndarray, *, row_w: int = 256, row_cap: int = 8, ebits: int = 10
):
    """extract_rows_device for width-bounded single-pattern L arrays.

    When every match is at most (2**ebits - row_w) bytes wide, the
    (lane, end-rowbase) pair packs into one int32 key whose row-min IS
    the leftmost remaining candidate with its end — one masked min per
    round over ONE array (the generic path reads L and I and needs a
    second reduce for the end). Candidate pid is 0 (single pattern).

    Returns (pos, end, counts); shapes as extract_rows_device.
    """
    assert row_w <= (1 << ebits)
    n = L.shape[0]
    R = -(-n // row_w)
    padL = jnp.full(R * row_w - n, -1, L.dtype)
    rows_L = jnp.concatenate([L, padL]).reshape(R, row_w)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, row_w), 1)
    base = jnp.arange(R, dtype=jnp.int32)[:, None] * row_w
    mask = rows_L >= 0
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    BIG = jnp.int32(1 << 30)
    EMASK = (1 << ebits) - 1
    # Invalid slots are baked to BIG once; the peel then needs ONE root
    # operand per round. Keys are strictly increasing in lane, so a
    # monotone threshold replaces the per-round mask rewrite (measured
    # round 4: the rewrite was a third of the peel's HBM traffic).
    packed = jnp.where(mask, (lane << ebits) | (rows_L - base), BIG)
    prev = jnp.full(R, -1, jnp.int32)
    pos_o, end_o = [], []
    for _ in range(row_cap):
        m = jnp.min(
            jnp.where(packed > prev[:, None], packed, BIG), axis=1
        )
        got = m < BIG
        lane_m = m >> ebits
        pos_o.append(jnp.where(got, base[:, 0] + lane_m, -1))
        end_o.append(jnp.where(got, base[:, 0] + (m & EMASK), -1))
        prev = jnp.where(got, m, BIG)
    return (
        jnp.stack(pos_o, axis=1),
        jnp.stack(end_o, axis=1),
        counts,
    )


@functools.partial(jax.jit, static_argnames=("row_w", "row_cap"))
def extract_rows_fixed(
    mask: jnp.ndarray, *, row_w: int = 256, row_cap: int = 8
):
    """Bool-mask peel — kept as the DIFFERENTIAL REFERENCE for
    extract_rows_bitmask (tests/unit/test_spans.py, property fuzz); no
    production caller. Historically the round-4 intermediate: ends are
    start + width, so the peel operates on the 1-byte mask alone (the
    packed-int32 peel re-reads ~40 MB/10 MB-text per round; a bool root
    cuts that 4-8x, the bitpacked root 32x more). The lane iota is fused
    into the row-min reduce, never materialized.

    Returns (pos, counts): pos (R, row_cap) int32 start positions (-1 =
    none), counts (R,) exact per-row candidate counts (> row_cap means
    the caller must re-run with a larger cap).
    """
    n = mask.shape[0]
    R = -(-n // row_w)
    padm = jnp.zeros(R * row_w - n, mask.dtype)
    rows = jnp.concatenate([mask, padm]).reshape(R, row_w) != 0
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, row_w), 1)
    base = jnp.arange(R, dtype=jnp.int32)[:, None] * row_w
    counts = jnp.sum(rows, axis=1, dtype=jnp.int32)
    BIG = jnp.int32(1 << 30)
    # Monotone-threshold peel: each round's row-min lane is strictly
    # increasing, so round r reads the ORIGINAL mask and filters
    # `lane > m_{r-1}` — no per-round mask rewrite (the rewrite doubled
    # the peel's HBM traffic; measured round 4).
    prev = jnp.full(R, -1, jnp.int32)
    pos_o = []
    for _ in range(row_cap):
        m = jnp.min(
            jnp.where(rows & (lane > prev[:, None]), lane, BIG), axis=1
        )
        got = m < BIG
        pos_o.append(jnp.where(got, base[:, 0] + m, -1))
        prev = jnp.where(got, m, BIG)
    return jnp.stack(pos_o, axis=1), counts


@functools.partial(jax.jit, static_argnames=("row_w", "row_cap"))
def extract_rows_bitmask(
    words: jnp.ndarray, *, row_w: int = 256, row_cap: int = 8
):
    """extract_rows_fixed over a bit-PACKED candidate mask
    (kernels/literal.literal_mask_packed_device): words is (Wtot,) uint32,
    bit i of word j = candidate at position 32*j + i.

    The peel's root operand shrinks 32x vs the bool mask, so all
    `row_cap` rounds together read less HBM than one pass over the text:
    each round takes the per-word lowest set bit (w & -w, indexed via
    popcount(lsb - 1)), row-mins across the row's words, and clears the
    chosen bit with w & (w - 1). Empty words need no special case:
    lsb - 1 wraps to 0xffffffff (popcount 32) and is masked by w != 0.

    Returns (pos, counts) with the same contract as extract_rows_fixed:
    pos (R, row_cap) int32 starts (-1 = none) in increasing order per
    row, counts (R,) exact per-row candidate counts (exact even past
    row_cap)."""
    W = row_w // 32
    Wtot = words.shape[0]
    assert Wtot % W == 0, (Wtot, W)
    R = Wtot // W
    w = words.reshape(R, W)
    widx = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    wbase = widx * 32
    base = jnp.arange(R, dtype=jnp.int32) * row_w
    counts = jnp.sum(
        jax.lax.population_count(w).astype(jnp.int32), axis=1
    )
    BIG = jnp.int32(1 << 30)
    one = jnp.uint32(1)
    pos_o = []
    for _ in range(row_cap):
        lsb = w & (~w + one)
        idx = jax.lax.population_count(lsb - one).astype(jnp.int32)
        key = jnp.where(w != 0, wbase + idx, BIG)
        m = jnp.min(key, axis=1)                     # (R,)
        got = m < BIG
        pos_o.append(jnp.where(got, base + m, -1))
        chosen = got[:, None] & (widx == (m[:, None] >> 5))
        w = jnp.where(chosen, w & (w - one), w)
    return jnp.stack(pos_o, axis=1), counts


@jax.jit
def first_candidate_bitmask(words: jnp.ndarray) -> jnp.ndarray:
    """Position of the FIRST set bit in a packed candidate mask
    (kernels/literal.literal_mask_packed_device): one O(1)-output device
    reduction — the literal-engine MatchFirst / MatchAnywhere program
    (rejit stops at the first verified hit, SURVEY.md §3.3; here the
    whole scan runs at memory speed and only a scalar comes back).

    The no-match sentinel is INT32_MAX, not a small power of two: a
    1 GiB+ text's first match can sit past 1 << 30, and the key here is
    an ABSOLUTE position (the row peels' BIG compares only small
    per-row keys). Callers must compare against n, not the sentinel.
    Positions are int32 engine-wide, so single device buffers are
    < 2 GiB by construction (larger corpora stream, engine/stream.py)
    and base + idx cannot overflow."""
    one = jnp.uint32(1)
    BIG = jnp.int32(2**31 - 1)
    if not words.shape[0]:
        return BIG
    lsb = words & (~words + one)
    idx = jax.lax.population_count(lsb - one).astype(jnp.int32)
    base = 32 * jnp.arange(words.shape[0], dtype=jnp.int32)
    key = jnp.where(words != 0, base + idx, BIG)
    return jnp.min(key)


@jax.jit
def partition_select_mask(L: jnp.ndarray, I: jnp.ndarray) -> jnp.ndarray:
    """Elementwise non-overlap selection for run-partition pattern sets
    (analysis.is_run_partition): a candidate is selected iff it starts a
    maximal class run — position 0 or a class change. No sequential
    greedy, no gathers; the whole selection is one compare per byte."""
    cand = L >= 0
    prev = jnp.concatenate([jnp.full(1, -2, I.dtype), I[:-1]])
    return cand & (I != prev)


@jax.jit
def partition_count(L: jnp.ndarray, I: jnp.ndarray) -> jnp.ndarray:
    """MatchAllCount for run-partition patterns: a pure device reduction
    over the elementwise selection mask (no L/I host transfer at all)."""
    return jnp.sum(partition_select_mask(L, I), dtype=jnp.int32)


@jax.jit
def partition_pid_bytes(L: jnp.ndarray, I: jnp.ndarray) -> jnp.ndarray:
    """uint8 per-position pattern-id array (255 = no candidate): the
    minimal host-materialization format for run-partition results. Token
    spans reconstruct on host from value changes alone (runs of equal pid
    are tokens), so transfer is 1 byte/position instead of the 8 bytes of
    the raw (L, I) int32 pair — the dense-output tunnel-transfer roofline
    is bandwidth*1 byte/byte (bench/NOTES.md round-3 e2e probe)."""
    return jnp.where(L >= 0, I, 255).astype(jnp.uint8)


def partition_arrays_host(pid_u8: np.ndarray, n: int):
    """Decode (starts, ends, pids) int64 arrays from the uint8 pid-per-
    position array (host side, numpy C speed)."""
    v = pid_u8[: n + 1].copy()
    if len(v) <= n:  # L/I arrays always carry one trailing boundary
        v = np.concatenate([v, np.full(1, 255, np.uint8)])
    v[n] = 255
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    bounds = np.concatenate([[0], change]).astype(np.int64)
    vals = v[bounds]
    keep = vals != 255
    starts = bounds[keep]
    ends = np.concatenate([bounds[1:], [n]])[keep].astype(np.int64)
    return starts, ends, vals[keep].astype(np.int64)


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
    L_dev: jnp.ndarray, I_dev: jnp.ndarray, *,
    max_w=None, n_patterns=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract on device, return host (pos, end, pid) arrays (sorted by pos).

    Two-phase: a cheap device reduce sizes the per-row slot count
    (bucketed to bound recompiles), then the gather-free row extraction
    runs and the host drops the -1 padding. Transfer is O(rows * cap).
    For width-bounded single patterns (max_w + n_patterns supplied), the
    packed-key extraction halves device traffic and work."""
    c = int(candidate_count(L_dev))
    if c == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z.copy(), z.copy()
    n = int(L_dev.shape[0])
    if c * 8 > n:
        # Dense result (e.g. tokenizers: ~every boundary a candidate):
        # row extraction would degenerate to O(n * cap); a wholesale
        # transfer + host flatnonzero is the honest O(n) path.
        L = np.asarray(L_dev)
        I = np.asarray(I_dev)
        pos = np.flatnonzero(L >= 0).astype(np.int32)
        return pos, L[pos], I[pos]
    row_w = 256
    mx = int(row_max_count(L_dev, row_w=row_w))
    # Tight x2 cap bucketing: extraction cost is `cap` rounds over the
    # whole array, so cap=4 vs the old floor of 8 halves the dominant
    # constant (measured 9.5 -> 13.8 GB/s on config 3, round 3); the
    # extra shape buckets are one-time compiles (persistent cache).
    cap = 2
    while cap < mx:
        cap *= 2
    cap = min(cap, row_w)
    if n_patterns == 1 and max_w is None:
        # Unbounded pattern: bound the width by measurement (two-phase,
        # like row_max_count) so the packed-key extraction still applies.
        max_w = int(max_width(L_dev))
    if (
        n_patterns == 1
        and max_w is not None
        and (row_w + max_w).bit_length() + 8 <= 31
    ):
        ebits = (row_w + max_w).bit_length()
        pos, end, _counts = extract_rows_packed(
            L_dev, row_w=row_w, row_cap=cap, ebits=ebits
        )
        pos = np.asarray(pos).ravel()
        end = np.asarray(end).ravel()
        keep = pos >= 0
        pos, end = pos[keep], end[keep]
        return pos, end, np.zeros(len(pos), dtype=np.int32)
    pos, end, pid, _counts = extract_rows_device(
        L_dev, I_dev, row_w=row_w, row_cap=cap
    )
    pos = np.asarray(pos).ravel()
    end = np.asarray(end).ravel()
    pid = np.asarray(pid).ravel()
    keep = pos >= 0
    return pos[keep], end[keep], pid[keep]
