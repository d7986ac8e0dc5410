"""Pallas TPU kernels: byte-lane fast-forward filter + fused literal scan.

TPU-native equivalents of rejit's FastForwardGen SSE loops (reference:
rejit:src/x64/codegen-x64.cc FastForwardGen, unverified recall — SURVEY.md
§2.2): instead of 16-byte pcmpeqb/pmovmskb iterations, whole (rows, 1024)
byte tiles are classified/compared in VMEM at VPU width (8x128 lanes).

- ff_row_mask: 256-entry membership lookup (candidate first-byte set from
  rejit_tpu/compile/analysis.first_bytes) -> per-row candidate mask. Rows
  with mask 0 can skip DFA verification entirely (BASELINE.json:5 "Pallas
  byte-lane filter").
- literal_count_rows: fused shifted-compare + popcount for a literal set
  over overlapped rows — one pass over HBM regardless of literal length
  (the XLA version reads the text once per literal byte).

Both keep data in VMEM via the grid pipeline; inputs are prepared as 2-D
row views by `overlap_rows` (pure XLA slicing, no host copies).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_W = 1024          # bytes per row (8 lanes-groups x 128)
ROW_BLOCK = 32        # rows per grid step (32 x 1024 = 32 KB tile)


def pad_rows(text: jnp.ndarray, row_w: int = ROW_W, extra: int = 0):
    """(n,) uint8 -> (R, row_w) int32 rows (zero padded), R multiple of
    ROW_BLOCK."""
    n = text.shape[0]
    R = -(-n // row_w)
    R = -(-R // ROW_BLOCK) * ROW_BLOCK
    pad = jnp.zeros(R * row_w + extra - n, dtype=text.dtype)
    flat = jnp.concatenate([text, pad])
    return flat[: R * row_w].reshape(R, row_w).astype(jnp.int32), flat


def overlap_rows(text: jnp.ndarray, hw: int, row_w: int = ROW_W):
    """(n,) uint8 -> (R, row_w + hw) int32 rows where each row carries the
    next hw bytes as a halo (so fixed-width windows never cross rows)."""
    base, flat = pad_rows(text, row_w, extra=row_w)
    R = base.shape[0]
    if hw == 0:
        return base
    tail = jax.lax.dynamic_slice(flat, (row_w,), (R * row_w,)).reshape(
        R, row_w
    )[:, :hw]
    return jnp.concatenate([base, tail.astype(jnp.int32)], axis=1)


# ---------------------------------------------------------------------------
# Fast-forward byte-lane filter
# ---------------------------------------------------------------------------


def _ff_kernel(lut_ref, rows_ref, out_ref):
    rows = rows_ref[:]                                  # (RB, W) int32
    lut = lut_ref[:]                                    # (1, 256) int32
    lut_b = jnp.broadcast_to(lut, (rows.shape[0], 256))
    is_cand = jnp.take_along_axis(lut_b, rows, axis=-1)
    out_ref[:] = jnp.sum(is_cand, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ff_row_mask(
    rows: jnp.ndarray, lut: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """Candidate-byte count per row. rows: (R, W) int32 byte values;
    lut: (1, 256) int32 0/1 membership. Returns (R, 1) int32."""
    R, W = rows.shape
    grid = (R // ROW_BLOCK,)
    return pl.pallas_call(
        _ff_kernel,
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ROW_BLOCK, W), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ROW_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(lut, rows)


def first_byte_lut(first_bytes_bitmap: int) -> jnp.ndarray:
    lut = np.zeros((1, 256), dtype=np.int32)
    for b in range(256):
        lut[0, b] = (first_bytes_bitmap >> b) & 1
    return jnp.asarray(lut)


# ---------------------------------------------------------------------------
# Fused literal scan
# ---------------------------------------------------------------------------


def _literal_kernel(rows_ref, nlim_ref, out_ref, *, lits, row_w):
    rows = rows_ref[:]                                   # (RB, W+hw) int32
    RB = rows.shape[0]
    i = pl.program_id(0)
    # Global byte index of each in-row position (for the n-limit mask).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (RB, row_w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (RB, row_w), 1)
    gpos = (i * RB + row_ids) * row_w + col_ids
    nlim = nlim_ref[0]
    total = jnp.zeros((), dtype=jnp.int32)
    for lit in lits:
        eq = rows[:, 0:row_w] == lit[0]
        for j in range(1, len(lit)):
            eq = jnp.logical_and(eq, rows[:, j : j + row_w] == lit[j])
        eq = jnp.logical_and(eq, gpos <= nlim - len(lit))
        total = total + jnp.sum(eq, dtype=jnp.int32)
    out_ref[0, 0] = total


@functools.partial(
    jax.jit, static_argnames=("lits", "row_w", "interpret")
)
def literal_count_rows(
    rows: jnp.ndarray,
    n: jnp.ndarray,
    *,
    lits: Tuple[bytes, ...],
    row_w: int = ROW_W,
    interpret: bool = False,
) -> jnp.ndarray:
    """Total literal hit count over overlapped rows (overlap_rows output)."""
    R = rows.shape[0]
    grid = (R // ROW_BLOCK,)
    nlim = jnp.asarray([n], dtype=jnp.int32)
    partial = pl.pallas_call(
        functools.partial(_literal_kernel, lits=lits, row_w=row_w),
        out_shape=jax.ShapeDtypeStruct((grid[0], 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ROW_BLOCK, rows.shape[1]),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM
        ),
        interpret=interpret,
    )(rows, nlim)
    return jnp.sum(partial, dtype=jnp.int32)
