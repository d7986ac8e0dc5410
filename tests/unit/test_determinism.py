"""SPMD determinism (SURVEY.md §5.2): identical runs give identical outputs;
the engine is integer-only so there is no accumulation nondeterminism, but
pin it as a regression test (the 'sanitizer' analog)."""
import numpy as np

from rejit_tpu import Pattern, Config
from rejit_tpu.dist.mesh import make_mesh
from rejit_tpu.dist.sharded import sharded_l_arrays
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns


def test_repeat_runs_identical():
    p = Pattern(r"\b\w+ing\b", Config(engine="dfa", block_size=8))
    text = np.frombuffer(b"winging it, singing again and again " * 20, np.uint8)
    a = p.match_all_arrays(text)
    b = p.match_all_arrays(text)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_sharded_repeat_runs_identical():
    t = compile_patterns([parser.parse(rb"[a-z]+")])
    mesh = make_mesh()
    text = np.frombuffer(b"many lower case words here ok " * 11, np.uint8)
    L1, I1 = sharded_l_arrays(t, text, mesh, block=4)
    L2, I2 = sharded_l_arrays(t, text, mesh, block=4)
    np.testing.assert_array_equal(L1, L2)
    np.testing.assert_array_equal(I1, I2)
