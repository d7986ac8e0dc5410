r"""Fused 1D cumulative scans: Pallas reverse-cummin / forward-cummax.

`jax.lax.cummin/cummax` lower to O(log P) full-array passes on this
backend — measured 3.87 ms per 10M int32 (~11 GB/s effective), which is
~100% of the classrun engine's runtime and ~95% of classlit's
(bench/NOTES.md round-3 "elementwise engines"). This kernel computes the
same scan in ONE pass over HBM: the TPU Pallas grid runs sequentially on
the TensorCore, so a scalar carry rides across grid steps in SMEM
(the schain_pallas suffix-carry pattern), and each grid step combines
its whole (TR*8, 128) block in log2(STEP) = 19 vectorized shift-combine
levels — the block is a CONTIGUOUS slice of the sequence (row-major), so
one level is two rotates + two selects + one min/max on the full block,
data-parallel across all rows. (A first version scanned (8,128) tiles
serially under the carry chain — 10240 dependent ~50-op chains measured
7.2 ms, SLOWER than lax; this form has only the 19-level chain per step.)

Layout: the (P,) array is viewed as (P/128, 128) row-major — element
p = 128*row + lane — NO transposes anywhere; sequence shifts spill
across rows with the roll-and-fix trick from schain_pallas._shift_cols.

Ops supported: (reverse, min) — "value at/after p" scans (classrun's
next-non-member, classlit's F[e(p)]); (forward, max) — classlit's
last-occurrence-at-or-before. Bit-equal to lax.cummin/cummax
(tests/kernels/test_scan1d.py; on-chip via verify_tpu stage C, which
pins the classrun/classlit engines end-to-end).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHL = 128       # lanes
TR = 64         # (8, 128) tiles per grid step: 256 KB in + 256 KB out
R = TR * 8      # rows per grid step
STEP = R * CHL  # elements per grid step

BIG = (1 << 30)


def _shift_fwd(x, d, rrow, lcol, fill):
    """x at sequence index j+d over a contiguous (R, CHL) row-major
    block (j = CHL*row + lane), `fill` past the block end."""
    if d < CHL:
        a = jnp.roll(x, CHL - d, axis=1)
        b = jnp.roll(a, R - 1, axis=0)          # rows shifted up by one
        y = jnp.where(lcol < CHL - d, a, b)
        return jnp.where((rrow == R - 1) & (lcol >= CHL - d), fill, y)
    m = d // CHL
    y = jnp.roll(x, R - m, axis=0)
    return jnp.where(rrow >= R - m, fill, y)


def _shift_bwd(x, d, rrow, lcol, fill):
    """x at sequence index j-d over the block, `fill` before index 0."""
    if d < CHL:
        a = jnp.roll(x, d, axis=1)
        b = jnp.roll(a, 1, axis=0)              # rows shifted down by one
        y = jnp.where(lcol >= d, a, b)
        return jnp.where((rrow == 0) & (lcol < d), fill, y)
    m = d // CHL
    y = jnp.roll(x, m, axis=0)
    return jnp.where(rrow < m, fill, y)


def _scan_kernel(x_ref, o_ref, c_scr, *, reverse, is_min):
    g = pl.program_id(0)
    fill = jnp.int32(BIG if is_min else -BIG)
    comb = jnp.minimum if is_min else jnp.maximum
    shift = _shift_fwd if reverse else _shift_bwd

    @pl.when(g == 0)
    def _():
        c_scr[0] = fill

    rrow = jax.lax.broadcasted_iota(jnp.int32, (R, CHL), 0)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (R, CHL), 1)
    s = x_ref[:, :]
    d = 1
    while d < STEP:                  # 19 static shift-combine levels
        s = comb(s, shift(s, d, rrow, lcol, fill))
        d *= 2
    out = comb(s, c_scr[0])
    o_ref[:, :] = out
    c_scr[0] = jnp.min(out) if is_min else jnp.max(out)


@functools.partial(
    jax.jit, static_argnames=("reverse", "is_min", "interpret")
)
def _scan1d(x: jnp.ndarray, *, reverse: bool, is_min: bool,
            interpret: bool = False) -> jnp.ndarray:
    """Cumulative combine over a 1D int32 array whose length is a
    multiple of STEP. reverse+min -> lax.cummin(reverse=True);
    forward+max -> lax.cummax."""
    P = x.shape[0]
    assert P % STEP == 0, P
    G = P // STEP
    xr = x.reshape(G * R, CHL)
    if reverse:
        imap = lambda g: (G - 1 - g, 0)     # noqa: E731  right-to-left
    else:
        imap = lambda g: (g, 0)             # noqa: E731
    out = pl.pallas_call(
        functools.partial(_scan_kernel, reverse=reverse, is_min=is_min),
        grid=(G,),
        in_specs=[pl.BlockSpec((R, CHL), imap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, CHL), imap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * R, CHL), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xr)
    return out.reshape(P)


def pad_len(n: int) -> int:
    """Smallest multiple of STEP >= max(n, 1)."""
    return max(1, -(-n // STEP)) * STEP


def rcummin(x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """= lax.cummin(x, reverse=True); len(x) % STEP == 0 required."""
    return _scan1d(x, reverse=True, is_min=True, interpret=interpret)


def cummax(x: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """= lax.cummax(x); len(x) % STEP == 0 required."""
    return _scan1d(x, reverse=False, is_min=False, interpret=interpret)
