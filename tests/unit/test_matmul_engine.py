"""MXU matmul + select-chain engines vs the gather pipeline: bit-equal."""
import numpy as np
import pytest

import jax.numpy as jnp

import rejit_tpu
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns
from rejit_tpu.engine import matmul, pipeline, schain

PATS = [
    [rb"\b\w+ing\b"],
    [rb"a+b"],
    [rb"(foo|bar|baz)"],
    [rb"[a-z]+"],
    [rb"^a+", rb"b$"],
    [rb"\w+", rb"\s+", rb"[^\w\s]+"],
    [rb"a*"],
    [rb"a{2,5}X?"],
]


@pytest.mark.parametrize("engine", ["matmul", "schain"])
@pytest.mark.parametrize("pats", PATS, ids=[b"|".join(p).decode() for p in PATS])
@pytest.mark.parametrize("block", [8, 32])
def test_alt_engine_bit_equal(pats, block, engine):
    rng = np.random.default_rng(hash(tuple(pats)) % 2**32)
    tables = compile_patterns([parser.parse(p) for p in pats])
    ct = pipeline.device_tables(tables)
    st = schain.static_tables(tables)
    alpha = b"ab fozX\n"
    for n in (0, 1, 17, 255, 256, 731):
        P = max(block, -(-max(n, 1) // block) * block)
        if P == n:
            P += block
        data = np.zeros(P, dtype=np.uint8)
        data[:n] = np.frombuffer(
            bytes(alpha[i] for i in rng.integers(0, len(alpha), n)), np.uint8
        )
        t = jnp.asarray(data)
        L1, I1 = pipeline.l_arrays_device(ct, t, jnp.int32(n), block=block)
        if engine == "matmul":
            L2, I2 = matmul.l_arrays_device_matmul(
                ct, t, jnp.int32(n), block=block
            )
        else:
            L2, I2 = schain.l_arrays_device_schain(
                st, t, jnp.int32(n), block=block
            )
        np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2),
                                      err_msg=f"L n={n}")
        np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2),
                                      err_msg=f"I n={n}")


def test_matmul_via_pattern_conformance():
    # Against the oracle through the public API path for one dense case.
    data = b"singing and winging it, kinging all things " * 20
    p = rejit_tpu.Pattern(r"\b\w+ing\b", rejit_tpu.Config(engine="dfa"))
    want = [tuple(x) for x in zip(*p.match_all_arrays(
        np.frombuffer(data, np.uint8)))]
    n = len(data)
    block = 32
    P = -(-(n + 1) // block) * block
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = np.frombuffer(data, np.uint8)
    L, I = matmul.l_arrays_device_matmul(
        p.ct, jnp.asarray(pad), jnp.int32(n), block=block
    )
    from rejit_tpu.engine import select

    got = select.match_all(np.asarray(L)[: n + 1], np.asarray(I)[: n + 1])
    assert got == want
