"""Bench harness smoke tests (no TPU needed)."""
import numpy as np

from bench.corpus import make_corpus, make_lines_corpus


def test_corpus_deterministic():
    a = make_corpus(10000, seed=7, needle=b"xx", density=0.01)
    b = make_corpus(10000, seed=7, needle=b"xx", density=0.01)
    assert a == b and len(a) == 10000
    c = make_corpus(10000, seed=8, needle=b"xx", density=0.01)
    assert a != c


def test_corpus_density_controls_needles():
    lo = make_corpus(50000, seed=1, needle=b"needle", density=0.001)
    hi = make_corpus(50000, seed=1, needle=b"needle", density=0.05)
    assert lo.count(b"needle") < hi.count(b"needle")


def test_lines_corpus_has_lines():
    t = make_lines_corpus(5000, seed=2, line_len=50)
    assert t.count(b"\n") >= 5000 // 50 - 2


def test_harness_importable():
    import bench.harness  # noqa: F401
    import bench.scaling  # noqa: F401
