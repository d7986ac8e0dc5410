"""Compiled-pattern serialization + disk cache tests (SURVEY.md §5.4)."""
import numpy as np

from rejit_tpu import Config, Pattern
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns
from rejit_tpu.engine import cache, reference


def test_save_load_roundtrip(tmp_path):
    t = compile_patterns([parser.parse(rb"\w+ing\b")])
    path = str(tmp_path / "tables.npz")
    cache.save_tables(path, t)
    t2 = cache.load_tables(path)
    np.testing.assert_array_equal(t.next, t2.next)
    np.testing.assert_array_equal(t.accept, t2.accept)
    np.testing.assert_array_equal(t.class_of, t2.class_of)
    np.testing.assert_array_equal(t.start_states, t2.start_states)
    assert t.dead == t2.dead and t.n_patterns == t2.n_patterns
    text = np.frombuffer(b"singing kingly", dtype=np.uint8)
    L1, _ = reference.l_array_naive(t, text)
    L2, _ = reference.l_array_naive(t2, text)
    np.testing.assert_array_equal(L1, L2)


def test_disk_cache_hit(tmp_path, monkeypatch):
    monkeypatch.setenv("REJIT_TPU_CACHE_DIR", str(tmp_path))
    cfg = Config(disk_cache=True)
    p1 = Pattern(r"[a-f]+\d", cfg)
    files = list(tmp_path.glob("*.npz"))
    assert len(files) == 1
    p2 = Pattern(r"[a-f]+\d", cfg)  # loads from cache
    np.testing.assert_array_equal(p1.tables.next, p2.tables.next)
    assert p2.match_all(b"abc1 ff2 xx") == [(0, 4), (5, 8)]


def test_cache_key_distinguishes_patterns():
    k1 = cache.cache_key([b"a"], 100, 100)
    k2 = cache.cache_key([b"b"], 100, 100)
    k3 = cache.cache_key([b"a", b"b"], 100, 100)
    k4 = cache.cache_key([b"ab"], 100, 100)
    assert len({k1, k2, k3, k4}) == 4


def test_stats_populated():
    p = Pattern(r"[a-z]+")
    p.match_all(b"some words here")
    s = p.last_stats
    assert s.engine == "classrun" and s.op == "match_all"
    assert s.n_bytes == 15 and s.n_matches == 3
    assert s.total_time_s > 0 and s.bytes_per_sec > 0
    assert "n_candidates" in s.as_dict()
