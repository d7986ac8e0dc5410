"""Fast-forward filtered execution == plain execution (SURVEY.md §4.1's
"SIMD on/off" matrix analog: FF on and off must agree everywhere)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rejit_tpu import Config, Pattern, oracle
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns
from rejit_tpu.engine import pipeline

PATS = [rb"foo", rb"\w+ing\b", rb"a*", rb"[a-z]+", rb"^x", rb"x$", rb""]
TEXTS = [
    b"",
    b"foo",
    b"a foo and singing x bar\nx starts the line",
    b"." * 100,
    (b"." * 50) + b"foo" + (b"." * 50),
    b"x" + b"." * 90 + b"x",
]


@pytest.mark.parametrize("pat", PATS, ids=[p.decode() or "empty" for p in PATS])
def test_ff_equals_plain(pat):
    t = compile_patterns([parser.parse(pat)])
    ct = pipeline.device_tables(t)
    for text in TEXTS:
        n = len(text)
        K = 8
        P = max(K, -(-n // K) * K)
        pad = np.zeros(P, np.uint8)
        pad[:n] = np.frombuffer(text, np.uint8)
        td = jnp.asarray(pad)
        L1, I1 = pipeline.l_arrays_device(ct, td, jnp.int32(n), block=K)
        L2, I2 = pipeline.l_arrays_device_ff(
            ct, td, jnp.int32(n), block=K, force=True
        )
        np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2)), (pat, text)
        np.testing.assert_array_equal(np.asarray(I1), np.asarray(I2))


def test_ff_config_path_matches_oracle():
    for cfg in (
        Config(engine="dfa", use_ff=True, force_ff=True, block_size=8),
        Config(engine="dfa", use_ff=False, block_size=8),
    ):
        p = Pattern(r"\bneedle\b", cfg)
        orc = oracle.OraclePattern(rb"\bneedle\b")
        text = (b"hay " * 40) + b"needle" + (b" hay" * 40)
        assert p.match_all(text) == orc.match_all(text)


def test_ff_class_mask_soundness():
    t = compile_patterns([parser.parse(rb"fo+")])
    mask = pipeline.ff_class_mask(t)
    f_cls = t.class_of[ord("f")]
    dot_cls = t.class_of[ord(".")]
    assert mask[f_cls] == 1
    assert mask[dot_cls] == 0
