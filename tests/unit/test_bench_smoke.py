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


def test_history_record_and_trends(tmp_path):
    from bench import history

    p = str(tmp_path / "h.jsonl")
    history.record({"config1": {"GBps": 10.0}}, source="t", path=p,
                   backend="cpu")
    history.record({"config1": {"GBps": 12.0},
                    "headline": {"value": 5e9}}, source="t", path=p,
                   backend="cpu")
    runs = history.load(p)
    assert len(runs) == 2 and runs[0]["backend"] == "cpu"
    tr = history.trends(p)
    assert [x[2] for x in tr["config1"]] == [10.0, 12.0]
    assert tr["headline"][0][2] == 5e9
    import io

    buf = io.StringIO()
    history.summarize(p, file=buf)
    out = buf.getvalue()
    assert "config1" in out and "+20.0%" in out
