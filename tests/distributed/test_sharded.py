"""Multi-device sharded engine tests on the 8-device CPU mesh.

Boundary fixture (SURVEY.md §4.3): matches are placed exactly on shard
edges, including matches spanning several whole shards (unbounded
quantifiers), which the cross-shard suffix scan must handle exactly.
"""
import jax
import numpy as np
import pytest

from rejit_tpu import oracle
from rejit_tpu.compile import parser
from rejit_tpu.compile.dfa import compile_patterns
from rejit_tpu.dist.mesh import make_mesh
from rejit_tpu.dist.sharded import sharded_l_arrays
from rejit_tpu.engine import select


def _tables(*pats):
    return compile_patterns([parser.parse(p) for p in pats])


def test_eight_devices_available():
    assert len(jax.devices()) == 8


PATTERNS = [rb"foo", rb"[a-z]+", rb"\w+ing\b", rb"foo|bar|baz", rb"a*", rb"^x+$"]


@pytest.mark.parametrize("pat", PATTERNS, ids=[p.decode() for p in PATTERNS])
def test_sharded_equals_oracle(pat):
    mesh = make_mesh()
    t = _tables(pat)
    orc = oracle.OraclePattern(pat)
    texts = [
        b"xfooy foo barbaz singing bar\nbaz foofoo xxxx\nabc ab " * 3,
        b"a" * 100,          # one [a-z]+ run across all shards
        b"",
        b"foo",
    ]
    for text in texts:
        arr = np.frombuffer(text, dtype=np.uint8)
        L, I = sharded_l_arrays(t, arr, mesh, block=4)
        expected = [orc.longest_end(text, s)[0] for s in range(len(text) + 1)]
        assert L.tolist() == expected, (pat, text[:20])


def test_match_straddles_shard_boundary():
    # block=4, 8 devices: with 64 padded bytes each shard is 8 bytes.
    # Plant 'needle' straddling the shard-0/1 edge at byte 8.
    mesh = make_mesh()
    t = _tables(rb"needle")
    text = bytearray(b"." * 40)
    text[5:11] = b"needle"    # crosses byte 8 boundary
    text[14:20] = b"needle"
    text = bytes(text)
    arr = np.frombuffer(text, dtype=np.uint8)
    L, I = sharded_l_arrays(t, arr, mesh, block=4)
    pos = np.flatnonzero(L >= 0)
    assert pos.tolist() == [5, 14]
    assert L[5] == 11 and L[14] == 20


def test_run_spanning_many_shards_is_exact():
    mesh = make_mesh()
    t = _tables(rb"[a-z]+")
    text = b"A" + b"z" * 70 + b"B"   # one run covering many shards
    arr = np.frombuffer(text, dtype=np.uint8)
    L, I = sharded_l_arrays(t, arr, mesh, block=4)
    assert L[1] == 71
    starts, ends, _ = select.match_all_candidates(
        *_compact(L, I)
    )
    assert starts.tolist() == [1] and ends.tolist() == [71]


def test_word_boundary_context_crosses_shards():
    # \b state depends on the previous byte, which lives in the previous
    # shard: exercises the one-byte ppermute halo.
    mesh = make_mesh()
    t = _tables(rb"\bcat")
    orc = oracle.OraclePattern(rb"\bcat")
    text = b"xxxxxxxcat ccat cat"   # 'cat' at byte 7 = shard boundary region
    arr = np.frombuffer(text, dtype=np.uint8)
    L, _ = sharded_l_arrays(t, arr, mesh, block=1)
    expected = [orc.longest_end(text, s)[0] for s in range(len(text) + 1)]
    assert L.tolist() == expected


def test_multi_pattern_sharded():
    mesh = make_mesh()
    t = _tables(rb"\w+", rb"\s+", rb"[^\w\s]+")
    orc = oracle.OraclePattern([rb"\w+", rb"\s+", rb"[^\w\s]+"])
    text = b"hi, there! go\nnow " * 4
    arr = np.frombuffer(text, dtype=np.uint8)
    L, I = sharded_l_arrays(t, arr, mesh, block=4)
    pos, end, pid = _compact(L, I)
    starts, ends, pids = select.match_all_candidates(pos, end, pid)
    assert (
        list(zip(starts.tolist(), ends.tolist(), pids.tolist()))
        == orc.match_all_ids(text)
    )


def _compact(L, I):
    pos = np.flatnonzero(L >= 0).astype(np.int64)
    return pos, L[pos], I[pos]


def test_sharded_pallas_interpret_equals_jnp():
    from rejit_tpu.kernels.dfa_pallas import CHUNK

    mesh = make_mesh()
    t = _tables(rb"\w+ing\b")
    text = (b"hay winging needle sing " * 40)[: 30 * 8 * 4]
    arr = np.frombuffer(text, dtype=np.uint8)
    L1, I1 = sharded_l_arrays(t, arr, mesh, block=4)
    L2, I2 = sharded_l_arrays(
        t, arr, mesh, block=4, use_pallas=True, interpret=True
    )
    np.testing.assert_array_equal(L1, L2)
    np.testing.assert_array_equal(I1, I2)


def test_sharded_match_all_api():
    from rejit_tpu.dist.sharded import sharded_match_all
    from rejit_tpu import oracle

    mesh = make_mesh()
    t = _tables(rb"[a-z]+")
    text = b"Make it SO, number one."
    starts, ends, _ = sharded_match_all(t, np.frombuffer(text, np.uint8), mesh, block=4)
    assert list(zip(starts.tolist(), ends.tolist())) == oracle.match_all(
        rb"[a-z]+", text
    )


# ---- fused select-chain engine per shard (production engine) ------------

FUSED_CASES = [
    [rb"\b\w+ing\b"],
    [rb"[a-z]+"],
    [rb"\w+", rb"\s+"],
    [rb"a*"],
]


@pytest.mark.parametrize(
    "pats", FUSED_CASES,
    ids=["+".join(p.decode() for p in ps) for ps in FUSED_CASES],
)
def test_sharded_fused_equals_pipeline(pats):
    """One-pass fused kernel + cross-shard tail splice == gather pipeline
    scan, bit-equal, across boundary-straddling sizes."""
    mesh = make_mesh()
    t = compile_patterns([parser.parse(p) for p in pats])
    rng = np.random.default_rng(5)
    soup = np.frombuffer(b"abc defoo barbaz ing singing\n working! .,",
                         np.uint8)
    for n in (0, 1, 700, 1023, 1024, 5000):
        arr = rng.choice(soup, size=max(n, 1)).astype(np.uint8)[:n]
        L1, I1 = sharded_l_arrays(t, arr, mesh, block=8)
        L2, I2 = sharded_l_arrays(
            t, arr, mesh, engine="fused", block=8, chl=2, interpret=True
        )
        np.testing.assert_array_equal(L1, L2, err_msg=f"n={n}")
        np.testing.assert_array_equal(I1, I2, err_msg=f"n={n}")


def test_sharded_fused_match_straddles_shards():
    """A single match spanning several shards is exact (no window)."""
    mesh = make_mesh()
    t = compile_patterns([parser.parse(rb"[a-z]+")])
    # One long run covering most of the corpus: crosses every shard edge.
    n = 2048
    text = np.full(n, ord("x"), np.uint8)
    text[0] = ord(" ")
    text[-1] = ord(" ")
    L, I = sharded_l_arrays(
        t, text, mesh, engine="fused", block=8, chl=2, interpret=True
    )
    # L[1] = end of the run = n-1, computed across all 8 shards.
    assert L[1] == n - 1
    assert np.all(L[2:n - 1] >= 0)
