"""Sharded execution through the PUBLIC Pattern API (round-4 VERDICT
missing #2): mesh= routes MatchAll/Count/First through dist/ with exact
cross-shard semantics, on the 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from rejit_tpu import Config, Pattern
from rejit_tpu.dist.mesh import make_mesh
from rejit_tpu.errors import CompileError
from rejit_tpu.oracle import OraclePattern


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_literal_match_all_mesh_boundary_straddles():
    mesh = make_mesh()
    # needles placed to straddle every shard edge of an 8-way split
    text = bytearray(b"." * 800)
    n = len(text)
    shard = n // 8
    hits = []
    for k in range(1, 8):
        text[k * shard - 2 : k * shard + 2] = b"need"[:4]
    text[0:6] = b"needle"
    text[-6:] = b"needle"
    for k in range(1, 8):
        text[k * shard - 3 : k * shard + 3] = b"needle"
    t = bytes(text)
    p = Pattern("needle")
    got = p.match_all(t, mesh=mesh)
    want = OraclePattern(rb"needle").match_all(t)
    assert got == want and len(want) >= 9
    assert p.last_stats.op == "match_all"
    assert p.match_all_count(t, mesh=mesh) == len(want)
    assert p.match_first(t, mesh=mesh) == want[0]
    del hits


@pytest.mark.parametrize("pat", [r"[a-z]+ing", r"foo|barbar", r"a*"])
def test_dfa_match_all_mesh_equals_single_device(pat):
    mesh = make_mesh()
    rng = np.random.default_rng(3)
    t = bytes(
        rng.choice(list(b"fobaring "), size=700).astype(np.uint8)
    )
    p = Pattern(pat)
    assert p.match_all(t, mesh=mesh) == p.match_all(t)
    assert p.match_all_count(t, mesh=mesh) == p.match_all_count(t)
    assert p.match_first(t, mesh=mesh) == p.match_first(t)


def test_multi_pattern_tokenize_mesh():
    mesh = make_mesh()
    p = Pattern([r"\w+", r"\s+"])
    t = b"some words  here\tand more " * 20
    assert p.tokenize(t, mesh=mesh) == p.tokenize(t)


def test_mesh_auto_resolution():
    # 'auto' uses all devices when >1 exist.
    p = Pattern("needle")
    t = b"x" * 100 + b"needle" + b"x" * 100
    assert p.match_all(t, mesh="auto") == [(100, 106)]
    with pytest.raises(CompileError):
        p.match_all(t, mesh="bogus")


def test_mesh_rejects_blowup_engines():
    import warnings

    with warnings.catch_warnings(record=True):
        warnings.simplefilter("ignore")
        p = Pattern(r"(a|b)*a(a|b){9}", Config(max_dfa_states=64))
    assert p.engine == "posnfa"
    with pytest.raises(CompileError):
        p.match_all(b"abab", mesh=make_mesh())
