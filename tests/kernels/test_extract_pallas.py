"""Differential tests: fused literal->spans Pallas kernel vs the XLA
literal path (kernels/literal.py) decoded by numpy — the headline program's
correctness pin (bench.py asserts the same parity on chip before timing)."""
import numpy as np
import pytest

import jax.numpy as jnp

from rejit_tpu.kernels import extract_pallas as xp
from rejit_tpu.kernels import literal as lk


def _expected(text: np.ndarray, n: int, lits, pids):
    P = n
    ext = jnp.asarray(lk.extend_pad(text[:n], P, max(len(l) for l in lits)))
    L, I = lk.literal_l_arrays_device(
        ext, jnp.int32(n), lits=lits, pids=pids, P=P
    )
    L = np.asarray(L)[:n]
    I = np.asarray(I)[:n]
    s = np.flatnonzero(L >= 0)
    return s, L[s], I[s]


def _run(text: np.ndarray, n: int, lits, pids, cap=4):
    rows = jnp.asarray(xp.pad_rows(text, n, max(len(l) for l in lits)))
    keys, cnt = xp.literal_spans_pallas(
        rows, jnp.int32(n), lits=lits, pids=pids, cap=cap, interpret=True
    )
    assert int(jnp.max(cnt)) <= cap, "cap sizing violated in test"
    return xp.spans_host(keys)


CASES = [
    (b"packet", (0,)),
    (b"a", (0,)),
    ((b"foo", b"bar", b"baz"), (0, 1, 2)),
    ((b"ing", b"ingest"), (0, 1)),        # longest-first claim ordering
    (b"\x00\xff", (0,)),                  # binary literal incl. NUL
]


@pytest.mark.parametrize("lits,pids", CASES)
@pytest.mark.parametrize("seed", [0, 1])
def test_vs_xla_literal_path(lits, pids, seed):
    if isinstance(lits, bytes):
        lits = (lits,)
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3 * xp.STEP))
    text = rng.integers(0, 256, size=n, dtype=np.uint8)
    # Plant needles so matches actually occur (incl. near n and at row
    # boundaries, exercising the cross-block halo).
    for _ in range(50):
        lit = lits[rng.integers(len(lits))]
        p = int(rng.integers(0, n))
        text[p : p + len(lit)] = np.frombuffer(lit[: n - p], dtype=np.uint8)
    for b in (xp.CHL - 1, xp.STEP - 2, n - len(lits[0])):
        if 0 <= b and b + len(lits[0]) <= n:
            text[b : b + len(lits[0])] = np.frombuffer(lits[0], np.uint8)
    es, ee, ep = _expected(text, n, lits, pids)
    cap = 4
    while True:
        try:
            gs, ge, gp = _run(text, n, lits, pids, cap=cap)
            break
        except AssertionError:
            cap *= 2
    np.testing.assert_array_equal(gs, es)
    np.testing.assert_array_equal(ge, ee)
    np.testing.assert_array_equal(gp, ep)


def test_hit_straddling_n_is_masked():
    lit = (b"abcd",)
    n = 10
    text = np.zeros(n, np.uint8)
    text[8:10] = list(b"ab")  # "ab" at 8, "cd" would live past n
    es, ee, ep = _expected(text, n, lit, (0,))
    gs, ge, gp = _run(text, n, lit, (0,))
    np.testing.assert_array_equal(gs, es)
    assert not ((gs <= n - 1) & (ge > n)).any()


def test_counts_exact_when_cap_too_small():
    lit = (b"aa",)
    n = 600
    text = np.full(n, ord("a"), np.uint8)  # overlapping hits everywhere
    rows = jnp.asarray(xp.pad_rows(text, n, 2))
    _keys, cnt = xp.literal_spans_pallas(
        rows, jnp.int32(n), lits=lit, pids=(0,), cap=2, interpret=True
    )
    # counts is exact even when cap truncates the slot outputs.
    L = np.asarray(
        lk.literal_l_arrays_device(
            jnp.asarray(lk.extend_pad(text, n, 2)),
            jnp.int32(n), lits=lit, pids=(0,), P=n,
        )[0]
    )[:n]
    per_row = np.add.reduceat(
        (L >= 0).astype(np.int32),
        np.arange(0, n, xp.CHL),
    )
    got = np.asarray(cnt)[: len(per_row)]
    np.testing.assert_array_equal(got, per_row)


def test_count_only_mode():
    rng = np.random.default_rng(2)
    n = xp.STEP + 333
    text = rng.integers(0, 256, size=n, dtype=np.uint8)
    for p in (0, 5, xp.CHL - 3, xp.STEP - 1, n - 6):
        text[p : p + 6] = np.frombuffer(b"packet"[: n - p], np.uint8)
    rows = jnp.asarray(xp.pad_rows(text, n, 6))
    keys, cnt = xp.literal_spans_pallas(
        rows, jnp.int32(n), lits=(b"packet",), pids=(0,), cap=0,
        interpret=True,
    )
    assert keys is None
    assert int(np.asarray(cnt).sum()) == text[:n].tobytes().count(b"packet")


def test_api_fused_literal_spans_path():
    """The api.match_all_arrays fused-literal gate, end to end in
    interpret mode, differential vs the default (XLA) path."""
    from rejit_tpu import Config, Pattern

    rng = np.random.default_rng(3)
    n = 70_000
    text = rng.integers(97, 123, size=n, dtype=np.uint8)
    for p in range(0, n - 3, 997):
        text[p : p + 3] = np.frombuffer(b"foo", np.uint8)
    pf = Pattern("foo|quux", Config(interpret=True, pallas="on"))
    assert pf.engine == "literal" and pf.info.overlap_free
    gs, ge, gp = pf.match_all_arrays(text)
    assert pf.last_stats.op == "match_all"
    pd = Pattern("foo|quux", Config(pallas="off"))
    es, ee, ep = pd.match_all_arrays(text)
    np.testing.assert_array_equal(gs, es)
    np.testing.assert_array_equal(ge, ee)
    np.testing.assert_array_equal(gp, ep)


def test_api_fused_literal_spans_dense_cap_resize():
    """Dense matches (>4 hits per CHL-byte row) force the api.py cap-resize
    loop to re-invoke the kernel with an enlarged cap; the r3 bug returned
    the truncated cap=4 keys and silently dropped spans (ADVICE r3 high)."""
    from rejit_tpu import Config, Pattern

    rng = np.random.default_rng(7)
    n = 20_000
    text = rng.integers(97, 123, size=n, dtype=np.uint8)
    # Overlap-free 2-byte literal every 8 bytes: CHL/8 hits per row >> 4.
    for p in range(0, n - 2, 8):
        text[p : p + 2] = np.frombuffer(b"zq", np.uint8)
    # bitmask="off": fixed-width sets otherwise route to the bitpacked
    # branch ahead of the Pallas one (api.match_all_arrays ordering).
    pf = Pattern("zq|vw", Config(interpret=True, pallas="on", bitmask="off"))
    assert pf.engine == "literal" and pf.info.overlap_free
    gs, ge, gp = pf.match_all_arrays(text)
    assert pf.last_stats.n_matches == pf.last_stats.n_candidates
    pd = Pattern("zq|vw", Config(pallas="off", bitmask="off"))
    es, ee, ep = pd.match_all_arrays(text)
    assert len(es) >= n // 8 - 8
    np.testing.assert_array_equal(gs, es)
    np.testing.assert_array_equal(ge, ee)
    np.testing.assert_array_equal(gp, ep)


def test_api_bitmask_literal_spans_dense():
    """The bitpacked fixed-width branch (api.match_all_arrays, round 4):
    dense matches force its cap-resize loop; multi-pattern ids decode
    from the text at match starts. Differential vs the XLA (L, I) path."""
    from rejit_tpu import Config, Pattern

    rng = np.random.default_rng(9)
    n = 20_000
    text = rng.integers(97, 123, size=n, dtype=np.uint8)
    for p in range(0, n - 2, 8):
        lit = b"zq" if (p // 8) % 2 else b"vw"
        text[p : p + 2] = np.frombuffer(lit, np.uint8)
    pb = Pattern(["zq", "vw"])  # tokenizer mode: pids 0, 1
    assert pb.engine == "literal" and pb.info.overlap_free
    assert pb.info.min_len == pb.info.max_len == 2
    gs, ge, gp = pb.match_all_arrays(text)
    assert pb.last_stats.op == "match_all"
    assert pb.last_stats.n_matches == len(gs) >= n // 8 - 8
    pd = Pattern(["zq", "vw"], Config(pallas="off", bitmask="off"))
    es, ee, ep = pd.match_all_arrays(text)
    np.testing.assert_array_equal(gs, es)
    np.testing.assert_array_equal(ge, ee)
    np.testing.assert_array_equal(gp, ep)
    assert set(np.unique(gp)) == {0, 1}


def test_api_bitmask_mixed_width_dense():
    """Mixed-width overlap-free sets route through the bitpacked branch
    (round 4): widths and pids decode from the text at the starts,
    longest-first. Dense matches force the cap resize."""
    from rejit_tpu import Config, Pattern

    rng = np.random.default_rng(21)
    n = 30_000
    text = rng.integers(97, 123, size=n, dtype=np.uint8)
    for p in range(0, n - 3, 8):
        lit = b"zq" if (p // 8) % 2 else b"xyv"
        text[p : p + len(lit)] = np.frombuffer(lit, np.uint8)
    text[n - 3 : n] = np.frombuffer(b"xyv", np.uint8)  # match at EOT
    pb = Pattern(["zq", "xyv"])
    assert pb.engine == "literal" and pb.info.overlap_free
    assert pb.info.min_len != pb.info.max_len
    gs, ge, gp = pb.match_all_arrays(text)
    pd = Pattern(["zq", "xyv"], Config(bitmask="off", pallas="off"))
    es, ee, ep = pd.match_all_arrays(text)
    np.testing.assert_array_equal(gs, es)
    np.testing.assert_array_equal(ge, ee)
    np.testing.assert_array_equal(gp, ep)
    assert set(np.unique(gp)) == {0, 1}


def test_api_bitmask_prefix_literals_same_start():
    """'ing|ingest'-style sets where a literal is a prefix of another:
    if analysis still calls the set overlap-free, the longest literal
    must win at a shared start (the L-array claim order)."""
    from rejit_tpu import Config, Pattern

    p = Pattern("ing|ingest")
    t = np.frombuffer(b"..ingest..ing..", np.uint8)
    got = p.match_all_arrays(t)
    ref = Pattern("ing|ingest", Config(bitmask="off", pallas="off"))
    want = ref.match_all_arrays(t)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_api_bitmask_staged_corpus():
    """DeviceCorpus staging through the bitpacked literal branch and the
    count reduction: same results as the unstaged path, no per-call
    upload (round 4)."""
    from rejit_tpu import Pattern, stage

    rng = np.random.default_rng(13)
    n = 50_000
    text = rng.integers(97, 123, size=n, dtype=np.uint8)
    for p in range(0, n - 6, 211):
        text[p : p + 6] = np.frombuffer(b"packet", np.uint8)
    corpus = stage(text)
    p = Pattern("packet")
    gs, ge, gp = p.match_all_arrays(corpus)
    es, ee, ep = p.match_all_arrays(text)
    np.testing.assert_array_equal(gs, es)
    np.testing.assert_array_equal(ge, ee)
    np.testing.assert_array_equal(gp, ep)
    assert p.match_all_count(corpus) == len(es) == p.match_all_count(text)
    # Second scan of the same corpus reuses the staged device pad.
    assert len(corpus._padded) == 1
    p2 = Pattern("zq")
    _ = p2.match_all_arrays(corpus)
    assert len(corpus._padded) <= 2  # width-2 pad may share or add one


def test_api_bitmask_edge_texts():
    """Bitpacked branch edge cases: empty text, text shorter than the
    literal, match at position 0 and at end-of-text."""
    from rejit_tpu import Pattern

    p = Pattern("packet")
    assert p.info.min_len == p.info.max_len == 6
    s, e, i = p.match_all_arrays(np.frombuffer(b"", np.uint8))
    assert len(s) == 0
    s, e, i = p.match_all_arrays(np.frombuffer(b"pack", np.uint8))
    assert len(s) == 0
    s, e, i = p.match_all_arrays(
        np.frombuffer(b"packetxxpacket", np.uint8)
    )
    np.testing.assert_array_equal(s, [0, 8])
    np.testing.assert_array_equal(e, [6, 14])
