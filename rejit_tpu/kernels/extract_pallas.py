r"""Fused literal-match -> span-extraction Pallas kernel (ONE HBM pass).

The round-3 spans-out headline program was two-pass: XLA materializes the
(L, I) int32 candidate arrays (8 bytes written + read back per text byte)
and `engine/spans.extract_rows_packed` then makes `row_cap` more full-array
passes of masked row-min. Both passes are pure HBM bandwidth; the headline
measured 12-16 GB/s while the count-only reduction (one streaming pass, no
materialization) measured >500 GB/s on the same text.

This kernel closes that gap for literal-alternation patterns (the headline
config and rejit's FastForwardGen hot loop — reference:
rejit:src/x64/codegen-x64.cc FastForwardGen, unverified recall, SURVEY.md
§2.1/C6): text bytes stream through VMEM once; the shifted-compare hit
masks, the leftmost-longest/lowest-pid claim resolution, and ALL `cap`
extraction rounds happen on the in-VMEM block; only the compacted per-row
span slots (cap slots per 128-byte row, ~cap/32 bytes per text byte) ever
touch HBM.

Layout (scan1d.py conventions): the padded text is viewed as (Rows, 128)
row-major uint8 — byte p = 128*row + lane. A grid step owns R=512 rows
(64 KiB). Shifted byte access j -> j+d crosses the block boundary into the
NEXT block's first row, which is passed as a second (1, 128) input block
(index map g+1, clamped at the last block; validity masking `pos <= n-len`
kills any phantom hits the clamp could fabricate, because the text is
staged with >= max_len zero bytes of tail padding — see `pad_rows`).

Extraction packs (lane, end_rel, pid) into ONE int32 key so each round is
a single masked lane-min:  key = lane << (ebits+pbits) | end_rel << pbits
| pid, with end_rel = lane + len(lit) < 128 + max_len < 2**ebits and
pid < 2**pbits. Row-min of the key IS the leftmost remaining candidate
with its end and pid (same algebra as spans.extract_rows_packed, extended
with the pid field).

Overlap-free literal sets only (analysis.overlap_free): every candidate is
a match, so no non-overlap selection pass is needed — that IS the
algorithm, not a shortcut.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHL = 128        # lanes: one extraction row = 128 text bytes
R = 512          # rows per grid step (64 KiB text)
STEP = R * CHL
BIG = 1 << 30


def _shift_fwd_halo(x, nxt0, d, rrow, lcol):
    """x at sequence index j+d over a contiguous (R, CHL) row-major block;
    indices past the block end read from nxt0 = next block's row 0."""
    assert 0 < d < CHL, d
    a = jnp.roll(x, CHL - d, axis=1)
    b = jnp.roll(a, R - 1, axis=0)                # rows shifted up by one
    nb = jnp.roll(nxt0, CHL - d, axis=1)          # (1, CHL)
    y = jnp.where(lcol < CHL - d, a, b)
    return jnp.where((rrow == R - 1) & (lcol >= CHL - d), nb, y)


def _kernel(n_ref, cur_ref, nxt_ref, *out_refs,
            lits, pids, cap, ebits, pbits):
    cnt_ref = out_refs[-1]
    key_ref = out_refs[0] if cap > 0 else None
    g = pl.program_id(0)
    nv = n_ref[0]
    rrow = jax.lax.broadcasted_iota(jnp.int32, (R, CHL), 0)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (R, CHL), 1)
    pos = g * STEP + rrow * CHL + lcol
    x = cur_ref[:, :].astype(jnp.int32)
    nxt0 = nxt_ref[0:1, :].astype(jnp.int32)      # next block's row 0

    # Leftmost-longest / lowest-pid claim resolution, all in VMEM
    # (the literal.literal_l_arrays_device ordering, kernels/literal.py:65).
    wlen = jnp.full((R, CHL), -1, jnp.int32)      # match width at pos
    pid_a = jnp.zeros((R, CHL), jnp.int32)
    order = sorted(
        range(len(lits)), key=lambda i: (-len(lits[i]), pids[i], i)
    )
    for idx in order:
        lit = lits[idx]
        eq = x == lit[0]
        for j in range(1, len(lit)):
            eq = jnp.logical_and(
                eq, _shift_fwd_halo(x, nxt0, j, rrow, lcol) == lit[j]
            )
        eq = eq & (pos <= nv - len(lit))
        claim = eq & (wlen < 0)
        wlen = jnp.where(claim, len(lit), wlen)
        pid_a = jnp.where(claim, pids[idx], pid_a)

    mask = wlen >= 0
    cnt_ref[:, :] = jnp.sum(mask, axis=1, keepdims=True, dtype=jnp.int32)
    if cap == 0:                                  # count-only mode
        return
    key = (lcol << (ebits + pbits)) | ((lcol + wlen) << pbits) | pid_a
    cols = []
    for _ in range(cap):
        cand = jnp.where(mask, key, BIG)
        m = jnp.min(cand, axis=1, keepdims=True)  # (R, 1)
        cols.append(m)
        mask = mask & (lcol != (m >> (ebits + pbits)))
    # ONE wide store per block: the packed keys (BIG = empty slot); the
    # host reconstructs pos/end/pid from (row index, key) — per-column
    # strided stores measured ~6x slower than this single store.
    key_ref[:, :] = jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("lits", "pids", "cap", "ebits", "pbits", "interpret"),
)
def literal_spans_pallas(
    text_rows: jnp.ndarray,
    n: jnp.ndarray,
    *,
    lits: Tuple[bytes, ...],
    pids: Tuple[int, ...],
    cap: int,
    ebits: int = 9,
    pbits: int = 4,
    interpret: bool = False,
):
    """Fused spans-out literal MatchAll over a (Rows, 128) uint8 text view.

    Returns (keys, counts): keys (Rows, cap) packed int32 span slots
    (BIG = empty; decode with `spans_host` / `decode_keys`), candidates in
    position order within each row; counts (Rows,) is the per-row
    candidate count (two-phase sizing: if max(counts) > cap, re-call with
    a larger cap — counts is always exact). cap=0 returns (None, counts):
    the count-only MatchAllCount mode.
    """
    max_len = max(len(l) for l in lits)
    assert max_len <= CHL, "literal longer than one lane row"
    assert CHL + max_len <= (1 << ebits), (ebits, max_len)
    assert max(pids) < (1 << pbits), (pbits, pids)
    assert 7 + ebits + pbits <= 30, (ebits, pbits)
    Rows = text_rows.shape[0]
    assert Rows % R == 0 and text_rows.shape[1] == CHL, text_rows.shape
    G = Rows // R
    nlim = jnp.asarray(n, jnp.int32).reshape(1)
    out_shape = [jax.ShapeDtypeStruct((Rows, 1), jnp.int32)]
    out_specs = [
        pl.BlockSpec((R, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
    ]
    if cap > 0:
        out_shape.insert(
            0, jax.ShapeDtypeStruct((Rows, cap), jnp.int32)
        )
        out_specs.insert(
            0,
            pl.BlockSpec((R, cap), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel, lits=lits, pids=pids, cap=cap, ebits=ebits,
            pbits=pbits,
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, CHL), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            # Halo: the next block's first 8-row tile (Mosaic requires
            # block rows % 8 == 0); clamped at the last block — validity
            # masking kills any phantom hit the clamp could fabricate.
            pl.BlockSpec(
                (8, CHL),
                lambda g: (jnp.minimum((g + 1) * (R // 8), Rows // 8 - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(nlim, text_rows, text_rows)
    if cap == 0:
        return None, out[0].reshape(Rows)
    return out[0], out[1].reshape(Rows)


def pad_rows(text: np.ndarray, n: int, max_len: int) -> np.ndarray:
    """Stage a uint8 text for the kernel: zero-pad to a multiple of STEP
    with at least max_len tail bytes, viewed as (Rows, 128) row-major."""
    G = max(1, -(-(n + max_len) // STEP))
    out = np.zeros(G * STEP, dtype=np.uint8)
    out[:n] = text[:n]
    return out.reshape(G * R, CHL)


def pad_rows_device(text: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Device-side pad_rows (static length = text.shape[0])."""
    n = text.shape[0]
    G = max(1, -(-(n + max_len) // STEP))
    return jnp.pad(text, (0, G * STEP - n)).reshape(G * R, CHL)


def spans_host(keys, *, ebits: int = 9, pbits: int = 4):
    """Decode kernel keys to host (starts, ends, pids), empty slots
    dropped. Row index recovers the absolute position: key carries only
    (lane, end_rel, pid)."""
    k = np.asarray(keys)
    rowbase = (np.arange(k.shape[0], dtype=np.int64) * CHL)[:, None]
    keep = (k < BIG).ravel()
    lane = (k >> (ebits + pbits)) + rowbase
    end = ((k >> pbits) & ((1 << ebits) - 1)) + rowbase
    pid = k & ((1 << pbits) - 1)
    return (
        lane.ravel()[keep].astype(np.int64),
        end.ravel()[keep].astype(np.int64),
        pid.ravel()[keep].astype(np.int64),
    )
