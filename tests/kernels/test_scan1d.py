"""Pallas 1D scan kernel vs lax.cummin/cummax (bit-equality)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rejit_tpu.kernels import scan1d


@pytest.mark.parametrize("n_steps", [1, 2, 3])
def test_scan1d_bit_equal(n_steps):
    rng = np.random.default_rng(3 + n_steps)
    P = scan1d.STEP * n_steps
    x = jnp.asarray(rng.integers(-(2**29), 2**29, P, dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(scan1d.rcummin(x, interpret=True)),
        np.asarray(jax.lax.cummin(x, axis=0, reverse=True)),
    )
    np.testing.assert_array_equal(
        np.asarray(scan1d.cummax(x, interpret=True)),
        np.asarray(jax.lax.cummax(x, axis=0)),
    )


def test_scan1d_monotone_and_constant():
    P = scan1d.STEP
    for x in [
        jnp.arange(P, dtype=jnp.int32),                      # increasing
        jnp.arange(P, 0, -1, dtype=jnp.int32),               # decreasing
        jnp.full(P, 7, jnp.int32),                           # constant
        jnp.where(jnp.arange(P) % 977 == 0, -5, 2**20).astype(jnp.int32),
    ]:
        np.testing.assert_array_equal(
            np.asarray(scan1d.rcummin(x, interpret=True)),
            np.asarray(jax.lax.cummin(x, axis=0, reverse=True)),
        )
        np.testing.assert_array_equal(
            np.asarray(scan1d.cummax(x, interpret=True)),
            np.asarray(jax.lax.cummax(x, axis=0)),
        )


def test_engines_pallas_scan_bit_equal():
    """classrun/classlit L arrays identical with and without the scan
    kernel (interpret mode on CPU)."""
    from rejit_tpu.kernels import classlit, classrun

    rng = np.random.default_rng(41)
    n = 3000
    text = rng.choice(
        np.frombuffer(b"aing _1.", np.uint8), n
    ).astype(np.uint8)
    P = scan1d.pad_len(n)
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = text
    td = jnp.asarray(pad)
    nd = jnp.int32(n)
    lut = jnp.asarray(classrun.member_lut(
        sum(1 << b for b in range(0x61, 0x7B))))
    from rejit_tpu.compile import ir
    wlut = jnp.asarray(classrun.member_lut(ir.WORD))

    for kw in [dict(lo=2, has_hi=True, hi=8, lead_wb=True, trail_wb=True),
               dict(lo=1, has_hi=False, hi=0)]:
        a = classrun.classrun_l_arrays_device(lut, wlut, td, nd, **kw)
        b = classrun.classrun_l_arrays_device(
            lut, wlut, td, nd, pallas_scan=True, interpret=True, **kw)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    kwl = dict(lo=1, has_hi=True, hi=6, sfx=(0x69, 0x6E, 0x67))  # 'ing'
    a = classlit.classlit_l_arrays_device(lut, wlut, td, nd, **kwl)
    b = classlit.classlit_l_arrays_device(
        lut, wlut, td, nd, pallas_scan=True, interpret=True, **kwl)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
