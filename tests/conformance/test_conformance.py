"""Frozen conformance corpus: every engine path must reproduce it exactly.

The corpus (corpus.json, generated once by tools/gen_conformance.py from the
oracle) is the executable analog of rejit's CHECK-based conformance binary
(reference: rejit:tools/tests, unverified recall — SURVEY.md §4.1). The
"build-mode matrix" analog: every case runs on the dfa engine, the literal
engine where eligible, and the 8-device sharded path — all must agree
byte-for-byte (BASELINE.json:5 "exact span parity").
"""
import base64
import json
import os

import numpy as np
import pytest

from rejit_tpu import Config, Pattern
from rejit_tpu.dist.mesh import make_mesh
from rejit_tpu.dist.sharded import sharded_l_arrays
from rejit_tpu.engine import select

_HERE = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_HERE, "corpus.json")) as f:
    CASES = json.load(f)


def _ids():
    return [f"{i}:{c['note']}" for i, c in enumerate(CASES)]


def _unpack(case):
    pats = [p.encode("latin-1") for p in case["patterns"]]
    text = base64.b64decode(case["text_b64"])
    want = [tuple(t) for t in case["match_all_ids"]]
    return pats, text, want


@pytest.mark.parametrize("case", CASES, ids=_ids())
def test_auto_engine(case):
    pats, text, want = _unpack(case)
    p = Pattern(pats)
    assert p.tokenize(text) == want
    first = case["match_first"]
    assert p.match_first(text) == (tuple(first) if first else None)
    assert p.match_full(text) == case["match_full"]
    assert p.match_anywhere(text) == case["match_anywhere"]
    assert p.match_all_count(text) == len(want)


@pytest.mark.parametrize("case", CASES, ids=_ids())
def test_dfa_engine(case):
    pats, text, want = _unpack(case)
    p = Pattern(pats, Config(engine="dfa", block_size=16))
    assert p.tokenize(text) == want


@pytest.mark.parametrize("case", CASES, ids=_ids())
def test_sharded_engine(case):
    pats, text, want = _unpack(case)
    from rejit_tpu.compile import parser
    from rejit_tpu.compile.dfa import compile_patterns

    t = compile_patterns([parser.parse(p) for p in pats])
    mesh = make_mesh()
    L, I = sharded_l_arrays(t, np.frombuffer(text, np.uint8), mesh, block=8)
    pos = np.flatnonzero(L >= 0).astype(np.int64)
    starts, ends, pids = select.match_all_candidates(pos, L[pos], I[pos])
    got = list(zip(starts.tolist(), ends.tolist(), pids.tolist()))
    assert got == want
