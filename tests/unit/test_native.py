"""Native C++ helper tests (skipped when the library is not built)."""
import numpy as np
import pytest

from rejit_tpu import oracle
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns
from rejit_tpu.engine import reference, select
from rejit_tpu.native import lib as native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _l_i(pat, text):
    t = compile_patterns([parser.parse(pat)])
    arr = np.frombuffer(text, dtype=np.uint8)
    return reference.l_array_naive(t, arr)


def test_select_matches_equals_python():
    for pat, text in [
        (rb"[a-z]+", b"Make it SO, number one."),
        (rb"a*", b"baac"),
        (rb"aa", b"aaaaaa"),
        (rb"foo", b"no hits here"),
    ]:
        L, I = _l_i(pat, text)
        got = native.select_matches(L, I)
        want = select._match_all_py(L, I)
        assert got == want, (pat, text)


def test_select_candidates_equals_python():
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        L = np.where(
            rng.random(n + 1) < 0.4,
            np.minimum(n, np.arange(n + 1) + rng.integers(0, 5, n + 1)),
            -1,
        ).astype(np.int64)
        I = np.where(L >= 0, 0, -1).astype(np.int64)
        pos = np.flatnonzero(L >= 0)
        end, pid = L[pos], I[pos]
        got = native.select_candidates(pos, end, pid)
        # Compare against an inline pure-python greedy walk.
        starts, ends, pids = [], [], []
        cur, i, k = 0, 0, len(pos)
        while i < k:
            s, e = int(pos[i]), int(end[i])
            starts.append(s); ends.append(e); pids.append(int(pid[i]))
            cur = e if e > s else s + 1
            i = int(np.searchsorted(pos, cur))
        assert got[0].tolist() == starts
        assert got[1].tolist() == ends
        assert got[2].tolist() == pids


def test_dfa_longest_equals_oracle():
    pat = rb"\w+ing\b"
    t = compile_patterns([parser.parse(pat)])
    orc = oracle.OraclePattern(pat)
    text = b"singing and winging, kingly things"
    arr = np.frombuffer(text, dtype=np.uint8)
    starts = reference.start_state_per_pos(t, arr)
    for s in range(len(text) + 1):
        end, pid = native.dfa_longest(arr, s, t, int(starts[s]))
        want, want_pid = orc.longest_end(text, s)
        assert end == want, s
        if want >= 0:
            assert pid == want_pid


def test_line_of_offsets():
    text = np.frombuffer(b"ab\ncde\n\nfg", dtype=np.uint8)
    offsets = np.array([0, 1, 3, 7, 8], dtype=np.int64)
    line_no, lo, hi = native.line_of_offsets(text, offsets)
    assert line_no.tolist() == [0, 0, 1, 2, 3]
    assert lo.tolist() == [0, 0, 3, 7, 8]
    assert hi.tolist() == [2, 2, 6, 7, 10]
