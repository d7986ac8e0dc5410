"""Run-partition elementwise selection (dense tokenizer fast path).

For pattern sets where every pattern is a maximal-run class pattern with
pairwise-disjoint classes (analysis.is_run_partition), greedy non-overlap
selection degenerates to "token starts = class changes" — elementwise on
device (spans.partition_select_mask) with a 1-byte/position host
materialization (spans.partition_pid_bytes + partition_arrays_host).
Differential-tested against the oracle (the executable spec).
"""
import random

import numpy as np
import pytest

from rejit_tpu import Pattern, oracle
from rejit_tpu.compile import analysis, parser
from rejit_tpu.engine import spans

TOK = [r"\w+", r"\s+", r"[^\w\s]+"]


def _irs(pats):
    return [parser.parse(p.encode()) for p in pats]


def test_is_run_partition():
    assert analysis.is_run_partition(_irs(TOK))
    assert analysis.is_run_partition(_irs([r"[a-z]+"]))
    assert analysis.is_run_partition(_irs([r"a+"]))
    # overlapping classes
    assert not analysis.is_run_partition(_irs([r"[a-z]+", r"[b-c]+"]))
    # bounded hi breaks run-maximality
    assert not analysis.is_run_partition(_irs([r"[a-z]{1,3}"]))
    # lo > 1: candidate short runs are skipped, not elementwise
    assert not analysis.is_run_partition(_irs([r"[a-z]{2,}"]))
    assert not analysis.is_run_partition(_irs([r"foo"]))
    assert not analysis.is_run_partition(_irs([r"\w+", r"foo"]))
    assert not analysis.is_run_partition([])


@pytest.mark.parametrize(
    "pats", [TOK, [r"[a-z]+"], [r"\w+", r"\s+"]], ids=["tok3", "one", "two"]
)
def test_partition_differential(pats):
    random.seed(hash(tuple(pats)) & 0xFFFF)
    alph = "abc XY.,\n\t09"
    p = Pattern(pats)
    assert p.info.run_partition
    for _ in range(15):
        text = "".join(
            random.choice(alph) for _ in range(random.randint(0, 300))
        ).encode()
        want = oracle.OraclePattern(pats).match_all_ids(text)
        assert p.tokenize(text) == want
        assert p.match_all_count(text) == len(want)


def test_partition_edges():
    p = Pattern(TOK)
    assert p.tokenize(b"") == []
    assert p.match_all_count(b"") == 0
    assert p.tokenize(b"a") == [(0, 1, 0)]
    # token runs straddling block boundaries and ending exactly at n
    text = b"x" * 300 + b" " * 5 + b"." * 40
    assert p.tokenize(text) == [(0, 300, 0), (300, 305, 1), (305, 345, 2)]
    # long single run (> 255 bytes: pid bytes are per-position, no width cap)
    one = Pattern([r"[a-z]+"])
    assert one.match_all(b"q" * 1000) == [(0, 1000)]


def test_partition_arrays_host_decode():
    # direct decode check incl. non-member gaps and trailing padding
    pid = np.array([0, 0, 255, 1, 1, 1, 255, 255, 2, 255], dtype=np.uint8)
    s, e, p = spans.partition_arrays_host(pid, 9)
    assert s.tolist() == [0, 3, 8]
    assert e.tolist() == [2, 6, 9]
    assert p.tolist() == [0, 1, 2]
    s, e, p = spans.partition_arrays_host(np.full(1, 255, np.uint8), 0)
    assert len(s) == 0
