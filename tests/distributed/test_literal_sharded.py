"""Sharded literal count: halo windows + psum on the 8-device CPU mesh."""
import numpy as np
import pytest

from rejit_tpu import oracle
from rejit_tpu.compile import analysis, parser
from rejit_tpu.dist.literal import sharded_literal_count
from rejit_tpu.dist.mesh import make_mesh


def _count(lits, text):
    mesh = make_mesh()
    return sharded_literal_count(
        tuple(lits), np.frombuffer(text, np.uint8), mesh
    )


def test_needles_on_every_shard_boundary():
    # 8 shards; plant needles exactly straddling each boundary.
    text = bytearray(b"." * 64)
    for b in range(8, 64, 8):
        text[b - 3 : b + 3] = b"needle"[:6]
    text = bytes(text)
    expected = oracle.match_all_count(rb"ne", text)
    assert _count([b"ne"], text) == expected


def test_matches_oracle_on_random_text():
    rng = np.random.default_rng(5)
    lits = [b"foo", b"bar", b"bazz"]
    assert analysis.literals_overlap_free(lits)
    text = bytes(rng.choice(np.frombuffer(b"fobarz .", np.uint8), size=333))
    want = oracle.match_all_count(rb"foo|bar|bazz", text)
    assert _count(lits, text) == want


def test_literal_longer_than_natural_shard():
    text = b"longneedlehere" * 2
    want = oracle.match_all_count(rb"longneedlehere", text)
    assert _count([b"longneedlehere"], text) == want


def test_empty_and_no_hits():
    assert _count([b"xyz"], b"") == 0
    assert _count([b"xyz"], b"aaaaaaaaaaaaaaaa") == 0


def _spans(lits, text):
    from rejit_tpu.dist.literal import sharded_literal_spans

    mesh = make_mesh()
    return sharded_literal_spans(
        tuple(lits), np.frombuffer(text, np.uint8), mesh
    )


def test_sharded_spans_boundary_straddles():
    """Bitpacked sharded spans (round 4): needles straddling every shard
    boundary resolve to exact absolute starts via the ppermute halo."""
    text = bytearray(b"." * 256)
    for b in range(32, 256, 32):
        text[b - 3 : b + 3] = b"needle"[:6]
    text = bytes(text)
    got = _spans([b"need"], text)
    want = [m[0] for m in oracle.match_all(rb"need", text)]
    np.testing.assert_array_equal(got, want)


def test_sharded_spans_dense_cap_resize():
    text = (b"ab" + b"..") * 400  # a hit every 4 bytes: cap 4 < 8/row
    got = _spans([b"ab"], bytes(text))
    want = [m[0] for m in oracle.match_all(rb"ab", bytes(text))]
    np.testing.assert_array_equal(got, want)


def test_sharded_spans_mixed_widths():
    """Mixed-width sets: the halo covers max_len-1 and per-literal
    validity lives in the packed-mask kernel."""
    text = bytearray(b"." * 200)
    text[31:34] = b"xyv"   # straddles the 32-byte shard boundary
    text[63:65] = b"zq"    # starts 1 before a boundary
    text[198:200] = b"zq"  # at EOT
    got = _spans([b"zq", b"xyv"], bytes(text))
    want = [m[0] for m in oracle.match_all(rb"zq|xyv", bytes(text))]
    np.testing.assert_array_equal(got, want)


def test_sharded_spans_multi_literal_and_edges():
    rng = np.random.default_rng(11)
    text = bytearray(rng.choice(np.frombuffer(b"fobar .", np.uint8), size=777))
    text[:2] = b"fo"  # match at position 0
    text[-2:] = b"ba"
    got = _spans([b"fo", b"ba"], bytes(text))
    want = [m[0] for m in oracle.match_all(rb"fo|ba", bytes(text))]
    np.testing.assert_array_equal(got, want)
