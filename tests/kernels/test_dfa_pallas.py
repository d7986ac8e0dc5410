"""Fused Pallas DFA phases == jnp phases (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns
from rejit_tpu.engine import pipeline
from rejit_tpu.kernels import dfa_pallas

PATS = [rb"\w+ing\b", rb"[a-z]+", rb"foo|bar", rb"a*", rb"^line"]


def _setup(pat, nb_chunks=1, K=8):
    t = compile_patterns([parser.parse(pat)])
    ct = pipeline.device_tables(t)
    nb = dfa_pallas.CHUNK * nb_chunks
    P = nb * K
    rng = np.random.default_rng(hash(pat) % 2**32)
    text = rng.choice(
        np.frombuffer(b"abfo liner\n singing!", np.uint8), size=P
    ).astype(np.uint8)
    n = P - 3
    return ct, jnp.asarray(text), jnp.int32(n), K, nb


@pytest.mark.parametrize("pat", PATS, ids=[p.decode() for p in PATS])
def test_pallas_path_equals_jnp_path(pat):
    ct, text, n, K, nb = _setup(pat)
    L1, I1 = pipeline.l_arrays_device(ct, text, n, block=K)
    L2, I2 = pipeline.l_arrays_device_pallas(
        ct, text, n, block=K, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))


def test_phase1_pallas_equals_jnp():
    ct, text, n, K, nb = _setup(rb"\w+ing\b")
    cls, _ = pipeline.classify(ct, text)
    pos = jnp.arange(text.shape[0], dtype=jnp.int32)
    cls_kb = pipeline.block_views(cls, nb, K)
    pos_kb = pipeline.block_views(pos, nb, K)
    f1, m1, i1 = pipeline.phase1_summaries(ct, cls_kb, pos_kb, n)
    f2, m2, i2 = dfa_pallas.phase1_pallas(
        ct.packed, ct.n_classes, cls_kb, n, K=K, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_multi_chunk_grid():
    ct, text, n, K, nb = _setup(rb"[a-z]+", nb_chunks=2, K=8)
    L1, _ = pipeline.l_arrays_device(ct, text, n, block=K)
    L2, _ = pipeline.l_arrays_device_pallas(
        ct, text, n, block=K, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
