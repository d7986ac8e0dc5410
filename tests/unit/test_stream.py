"""Streaming (chunked, checkpoint/resume) engine tests.

Differential against the in-memory engine/oracle, with chunk sizes chosen so
matches straddle chunk boundaries (the carried-tail algebra must make those
exact), plus interrupt/resume through the state directory.
"""
import numpy as np
import pytest

import rejit_tpu
from rejit_tpu.engine import stream


def _spans(p, data):
    return [tuple(x) for x in zip(*p.match_all_arrays(np.frombuffer(data, np.uint8)))]


def _stream_spans(p, data, **kw):
    arr = np.frombuffer(data, dtype=np.uint8)
    s, e, i = p.match_all_stream(arr, **kw)
    return list(zip(s.tolist(), e.tolist(), i.tolist()))


def test_stream_equals_matchall_across_chunks():
    rng = np.random.default_rng(7)
    words = [b"sing", b"winging", b"thing", b"xyzzy", b"ringing", b"bob"]
    data = b" ".join(words[i] for i in rng.integers(0, len(words), 4000))
    p = rejit_tpu.Pattern(r"\b\w+ing\b")
    assert _stream_spans(p, data, chunk_bytes=1024) == _spans(p, data)


def test_stream_span_longer_than_chunk():
    # One match spans several whole chunks: unbounded quantifier exactness.
    data = b"x" * 100 + b"a" * 5000 + b"b" + b"y" * 300 + b"ab" + b"z" * 50
    p = rejit_tpu.Pattern(r"a+b")
    got = _stream_spans(p, data, chunk_bytes=1024)
    assert got == _spans(p, data)
    assert got[0] == (100, 5101, 0)  # the monster span, exact


def test_stream_literal_pattern_compiles_tables_on_demand():
    data = b"no packet here packet and packetpacket end"
    p = rejit_tpu.Pattern("packet")
    assert p.engine == "literal" and p.tables is None
    got = _stream_spans(p, data, chunk_bytes=32)
    assert got == _spans(p, data)
    assert p.tables is not None


def test_stream_tokenizer_pids():
    data = (b"hi, there! word " * 500).strip()
    p = rejit_tpu.Pattern([r"\w+", r"\s+", r"[^\w\s]+"])
    assert _stream_spans(p, data, chunk_bytes=256) == _spans(p, data)


def test_stream_small_and_empty():
    p = rejit_tpu.Pattern(r"ab*")
    assert _stream_spans(p, b"", chunk_bytes=64) == []
    assert _stream_spans(p, b"abbb", chunk_bytes=64) == _spans(p, b"abbb")
    # n an exact multiple of chunk_bytes (EOT boundary in padded tail).
    data = (b"ab" * 32)  # 64 bytes
    assert _stream_spans(p, data, chunk_bytes=64) == _spans(p, data)


def test_stream_resume(tmp_path):
    rng = np.random.default_rng(3)
    words = [b"sing", b"winging", b"aba", b"ringing", b"q"]
    data = b" ".join(words[i] for i in rng.integers(0, len(words), 3000))
    arr = np.frombuffer(data, dtype=np.uint8)
    p = rejit_tpu.Pattern(r"\b\w+ing\b")
    sd = str(tmp_path / "state")

    class Stop(Exception):
        pass

    calls = []

    def bomb(i, nc):
        calls.append(i)
        if len(calls) == 3:
            raise Stop()

    with pytest.raises(Stop):
        p.match_all_stream(arr, chunk_bytes=512, state_dir=sd, progress=bomb)

    resumed_chunks = []
    got = p.match_all_stream(
        arr,
        chunk_bytes=512,
        state_dir=sd,
        progress=lambda i, nc: resumed_chunks.append(i),
    )
    # Resume skipped the chunks already done before the interrupt.
    assert len(resumed_chunks) < len(data) // 512
    assert set(resumed_chunks).isdisjoint(calls[: len(calls) - 1])
    want = p.match_all_arrays(arr)
    assert [tuple(x) for x in zip(*got)] == [tuple(x) for x in zip(*want)]

    # A second call with completed state returns the same result.
    again = p.match_all_stream(arr, chunk_bytes=512, state_dir=sd)
    assert [tuple(x) for x in zip(*again)] == [tuple(x) for x in zip(*want)]


def test_stream_state_fingerprint_mismatch_restarts(tmp_path):
    data = b"sing winging thing " * 200
    arr = np.frombuffer(data, dtype=np.uint8)
    sd = str(tmp_path / "state")
    p1 = rejit_tpu.Pattern(r"\b\w+ing\b")
    p1.match_all_stream(arr, chunk_bytes=512, state_dir=sd)
    # Different pattern, same state dir: must not reuse stale state.
    p2 = rejit_tpu.Pattern(r"w\w+g")
    got = p2.match_all_stream(arr, chunk_bytes=512, state_dir=sd)
    want = p2.match_all_arrays(arr)
    assert [tuple(x) for x in zip(*got)] == [tuple(x) for x in zip(*want)]


def test_stream_state_corpus_identity(tmp_path):
    # Same length, different content: a reused state_dir must restart, not
    # return the old corpus's matches.
    sd = str(tmp_path / "state")
    p = rejit_tpu.Pattern("needle")
    a = bytearray(b"x" * 4096)
    a[100:106] = b"needle"
    p.match_all_stream(np.frombuffer(bytes(a), np.uint8),
                       chunk_bytes=1024, state_dir=sd)
    b = bytearray(b"x" * 4096)
    b[0:6] = b"needle"
    b[2000:2006] = b"needle"
    s, e, _ = p.match_all_stream(np.frombuffer(bytes(b), np.uint8),
                                 chunk_bytes=1024, state_dir=sd)
    assert list(s) == [0, 2000]


def test_stream_state_tail_meta_mismatch(tmp_path):
    # Simulate a kill between the tail.npz and meta.json writes: meta's
    # cursor is one chunk behind the tail's. Resume must stay exact (it
    # trusts the tail's own cursor).
    import json, os
    data = bytearray(b"x" * 256)
    data[128] = ord("b")
    data[191] = ord("a")  # 'ab' never matches: 'a' at 191, 'b' at 128
    arr = np.frombuffer(bytes(data), np.uint8)
    p = rejit_tpu.Pattern("ab")
    sd = str(tmp_path / "state")

    class Stop(Exception):
        pass

    def bomb(i, nc):
        if i == 1:  # chunks processed 3,2,1 then stop
            raise Stop()

    with pytest.raises(Stop):
        p.match_all_stream(arr, chunk_bytes=64, state_dir=sd, progress=bomb)
    # Roll meta.json's cursor back one chunk (the crash window state).
    meta_p = os.path.join(sd, "meta.json")
    meta = json.load(open(meta_p))
    meta["next_chunk"] += 1
    json.dump(meta, open(meta_p, "w"))
    s, _e, _ = p.match_all_stream(arr, chunk_bytes=64, state_dir=sd)
    assert list(s) == []  # phantom (191,129) span would appear if wrong


def test_stream_state_corrupt_cands_recovers(tmp_path):
    import os
    data = b"needle " * 600
    arr = np.frombuffer(data, np.uint8)
    p = rejit_tpu.Pattern("needle")
    sd = str(tmp_path / "state")
    want = p.match_all_stream(arr, chunk_bytes=1024, state_dir=sd)
    os.remove(os.path.join(sd, "cands_1.npz"))
    got = p.match_all_stream(arr, chunk_bytes=1024, state_dir=sd)
    for x, y in zip(want, got):
        np.testing.assert_array_equal(x, y)


def test_stream_file_path_memmap(tmp_path):
    data = b"the packet is winging its way; another packet follows"
    f = tmp_path / "corpus.bin"
    f.write_bytes(data)
    p = rejit_tpu.Pattern("packet")
    got = p.match_all_stream(str(f), chunk_bytes=32)
    assert [tuple(x) for x in zip(*got)] == _spans(p, data)
    assert p.match_all_count_stream(str(f), chunk_bytes=32) == 2


def test_stream_pallas_interpret_bit_equal():
    from rejit_tpu.engine import stream
    from rejit_tpu.kernels.dfa_pallas import CHUNK

    rng = np.random.default_rng(5)
    words = [b"sing", b"winging", b"thing", b"zz"]
    data = b" ".join(words[i] for i in rng.integers(0, len(words), 30000))
    arr = np.frombuffer(data, dtype=np.uint8)
    p = rejit_tpu.Pattern(r"\b\w+ing\b")
    cb = 32 * CHUNK  # one pallas grid chunk per stream chunk
    a = stream.stream_match_all(p._dfa_tables(), arr, chunk_bytes=cb)
    b = stream.stream_match_all(
        p.tables, arr, chunk_bytes=cb, use_pallas=True, interpret=True
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert len(a[0]) > 0


def test_stream_match_first_differential():
    rng = np.random.default_rng(9)
    alpha = b"abX "
    data = bytes(alpha[i] for i in rng.integers(0, 4, 5000))
    for pat in (r"a+b", r"\bX\w*", r"zzz", r"(a|b)+X"):
        p = rejit_tpu.Pattern(pat)
        arr = np.frombuffer(data, dtype=np.uint8)
        want = p.match_first(arr)
        got = p.match_first_stream(arr, chunk_bytes=256)
        assert got == want, pat
        assert p.match_anywhere_stream(arr, chunk_bytes=256) == \
            p.match_anywhere(arr), pat


def test_stream_match_first_early_exit_window_count():
    from rejit_tpu.engine import stream

    # Match near the start of a large corpus: the doubling-window scan must
    # touch only the first windows, not the whole corpus.
    data = b"x" * 100 + b"needle" + b"x" * (1 << 20)
    arr = np.frombuffer(data, dtype=np.uint8)
    p = rejit_tpu.Pattern("needle")
    calls = []
    orig = stream._window_l

    def spy(*a, **kw):
        calls.append(a[3:5])  # (base, end)
        return orig(*a, **kw)

    stream._window_l = spy
    try:
        got = stream.stream_match_first(
            p._dfa_tables(), arr, chunk_bytes=1024
        )
    finally:
        stream._window_l = orig
    assert got == (100, 106, 0)
    assert len(calls) <= 4  # first window (pess+opt), not ~2000 windows
    assert max(e for _b, e in calls) <= 4096


def test_stream_match_first_span_across_windows():
    # 'a'*5000 forces doubling past several windows before the 'b'.
    data = b"x" * 50 + b"a" * 5000 + b"b" + b"y" * 2000
    arr = np.frombuffer(data, dtype=np.uint8)
    p = rejit_tpu.Pattern(r"a+b")
    assert p.match_first_stream(arr, chunk_bytes=512) == (50, 5051)
    assert p.match_anywhere_stream(arr, chunk_bytes=512) is True


def test_stream_match_full():
    p = rejit_tpu.Pattern(r"a+b")
    good = np.frombuffer(b"a" * 3000 + b"b", np.uint8)
    bad_late = np.frombuffer(b"a" * 3000 + b"bz" + b"a" * 3000, np.uint8)
    bad_early = np.frombuffer(b"za" * 2000, np.uint8)
    assert p.match_full_stream(good, chunk_bytes=256) is True
    assert p.match_full_stream(bad_late, chunk_bytes=256) is False
    assert p.match_full_stream(bad_early, chunk_bytes=256) is False
    assert p.match_full_stream(np.zeros(0, np.uint8), chunk_bytes=256) is False
    pn = rejit_tpu.Pattern(r"x*")
    assert pn.match_full_stream(np.zeros(0, np.uint8), chunk_bytes=256) is True


def test_stream_oracle_differential_random():
    rng = np.random.default_rng(11)
    alpha = b"abX "
    data = bytes(alpha[i] for i in rng.integers(0, 4, 6000))
    for pat in (r"a+b", r"(a|b)+X", r"\ba\w*"):
        p = rejit_tpu.Pattern(pat)
        o = rejit_tpu.Pattern(pat, rejit_tpu.Config(engine="oracle"))
        got = _stream_spans(p, data, chunk_bytes=256)
        want = [(s, e, pid) for s, e, pid in o.tokenize(data)]
        assert got == want, pat


def test_stream_fused_engine_equals_pipeline():
    """engine='fused' (production kernel per chunk + host int64 splice)
    bit-equals the pipeline chunk engine across chunk-straddling spans."""
    import numpy as np

    from rejit_tpu.compile import parser as rparser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.engine import stream

    rng = np.random.default_rng(5)
    soup = np.frombuffer(b"abc defoo barbaz ing singing\n working! .,",
                         np.uint8)
    for pats in ([rb"\b\w+ing\b"], [rb"\w+", rb"\s+"], [rb"a*"]):
        t = compile_patterns([rparser.parse(p) for p in pats])
        for n in (0, 300, 1024, 4096):
            arr = rng.choice(soup, size=max(n, 1)).astype(np.uint8)[:n]
            r1 = stream.stream_match_all(t, arr, chunk_bytes=1024, block=8)
            r2 = stream.stream_match_all(
                t, arr, chunk_bytes=1024, block=8, chl=2, engine="fused",
                interpret=True,
            )
            for a, b in zip(r1, r2):
                np.testing.assert_array_equal(a, b, err_msg=f"{pats} n={n}")


def test_stream_match_first_fused_windows():
    """Fused one-pass window evaluation == the two-pass gather windows."""
    import numpy as np

    from rejit_tpu.compile import parser as rparser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.engine import stream

    t = compile_patterns([rparser.parse(rb"\b\w+ing\b")])
    # two cases keep the interpret-mode window-shape ladder short
    cases = [
        b"." * 2500 + b"singing" + b"." * 100,   # late match (3 windows)
        b"." * 700,                              # no match, one window
    ]
    for raw in cases:
        arr = np.frombuffer(raw, np.uint8)
        r1 = stream.stream_match_first(t, arr, chunk_bytes=256, block=8)
        r2 = stream.stream_match_first(
            t, arr, chunk_bytes=256, block=8, chl=2, engine="fused",
            interpret=True,
        )
        assert r1 == r2, (len(raw), r1, r2)
        a1 = stream.stream_match_anywhere(t, arr, chunk_bytes=256, block=8)
        a2 = stream.stream_match_anywhere(
            t, arr, chunk_bytes=256, block=8, chl=2, engine="fused",
            interpret=True,
        )
        assert a1 == a2


def test_stream_match_first_fused_staged_equals_upload():
    """Staged window ladder (device slices of ONE full staging) == the
    per-window upload ladder == the gather reference, including the
    doubling case (candidate whose end could still grow) and EOT."""
    import jax.numpy as jnp

    from rejit_tpu.compile import parser as rparser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.engine import schain as schain_mod
    from rejit_tpu.kernels import schain_pallas as sp

    t = compile_patterns([rparser.parse(rb"\b\w+ing\b")])
    st = schain_mod.static_tables(t)
    cases = [
        b"." * 250 + b"singing" + b"." * 300,  # window splits the match
        b"." * 2500 + b"singing" + b"." * 100,  # late match
        b"." * 700,                             # no match
        b"singing " + b"." * 600,               # match at 0
        b"." * 500 + b"singing",                # match ends exactly at EOT
        b"." * 500 + b"sing",                   # EOT kills the candidate
    ]
    for raw in cases:
        arr = np.frombuffer(raw, np.uint8)
        ref = stream.stream_match_first(t, arr, chunk_bytes=256, block=8)
        kw = dict(chunk_bytes=256, block=8, chl=2, engine="fused",
                  interpret=True)
        up = stream.stream_match_first(t, arr, staged_full=False, **kw)
        auto = stream.stream_match_first(t, arr, **kw)  # auto-stages
        grain = 8 * 8 * 2
        n = len(arr)
        P = (n // grain + 1) * grain
        buf = np.zeros(P, np.uint8)
        buf[:n] = arr
        sf = sp.stage_text(st, jnp.asarray(buf), block=8, chl=2)
        exp = stream.stream_match_first(
            t, arr, staged_full=(sf[0], sf[1], sf[2], P), **kw
        )
        assert ref == up == auto == exp, (raw[:16], ref, up, auto, exp)
        a_ref = stream.stream_match_anywhere(
            t, arr, chunk_bytes=256, block=8
        )
        a_st = stream.stream_match_anywhere(t, arr, **kw)
        assert a_ref == a_st, raw[:16]


def test_device_corpus_match_first_staged_ladder():
    """A DeviceCorpus input routes MatchFirst/MatchAnywhere through the
    staged window ladder (no uploads) with identical results."""
    from rejit_tpu import Config, Pattern, stage

    txt = b"." * 5000 + b"singing" + b"." * 3000
    cfg = Config(engine="dfa", schain_fused="on", interpret=True,
                 block_size=8, fused_chl=2, first_window=512)
    p = Pattern(r"\b\w+ing\b", cfg)
    corpus = stage(txt)
    assert p.match_first(txt) == (5000, 5007)
    assert p.match_first(corpus) == (5000, 5007)
    assert p.match_anywhere(corpus) is True
    assert p.match_full(corpus) is False
    p2 = Pattern(r"qu[0-9]+z", cfg)
    assert p2.match_first(corpus) is None
    assert p2.match_anywhere(corpus) is False
