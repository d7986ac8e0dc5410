#!/usr/bin/env python
"""Full benchmark matrix: the five BASELINE.json configs (BASELINE.md table).

Run:  python bench/harness.py [--size MB] [--json out.json] [--configs 1,2,3]

Config 5 (multi-host) runs data-parallel over however many devices are
visible (1 on this rig; the sharded path is the same code that scales to
N hosts — SURVEY.md §2.4).
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(r):
    """Force materialization on host: block_until_ready has been observed to
    return early on this backend; a scalar readback cannot lie."""
    import jax.numpy as jnp

    if hasattr(r, "block_until_ready"):
        return int(jnp.sum(r.ravel()[:1], dtype=jnp.int32))
    return r


def tchain(step, n, rounds=3):
    """Per-call seconds via chained-reps slope (see bench.py docstring).

    `step(n_i32) -> int32 device scalar` is the computation under test
    (reduce array outputs to a scalar inside). Single-call wall times over
    the tunnel measure dispatch round-trip latency (~40us..70ms, varying),
    not the kernel: a lax.scan chaining R carry-dependent executions
    amortizes the RTT, and the slope between two rep counts removes it.
    """
    import functools

    import jax  # noqa: F401
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(nv, reps):
        def body(c, _):
            # c & 1 == 0 in practice but is not foldable, so the body
            # depends on the carry and cannot be hoisted out of the scan.
            return step(nv + (c & 1)), None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=reps)
        return c

    nv = jnp.int32(n)

    compiled = set()

    def t(reps):
        # Each static `reps` is a fresh XLA program: compile it with an
        # untimed throwaway call first, or a cold compile cache turns
        # the sizing walls into compile times and the adaptive ladder
        # stops at tiny R with no slope signal (observed round 4 after
        # the cache partition change: 175 GB/s rows "measuring" 5).
        if reps not in compiled:
            int(chain(nv, reps=reps))
            compiled.add(reps)
        a = time.perf_counter()
        int(chain(nv, reps=reps))
        return time.perf_counter() - a

    # Adaptive sizing by doubling: stop before any single program's
    # DEVICE time exceeds ~0.7s — the tunneled worker kills (crashes on)
    # programs that run for more than a few seconds. Size on the BODY
    # estimate (tR minus the first call's RTT floor), not the wall: in a
    # high-RTT window the wall is dispatch latency and sizing on it
    # stalls at tiny R, leaving no slope signal (observed: the 19 us/call
    # literal count "measuring" 1.4 ms/call amortized at R=16).
    R, tR = 16, t(16)
    rtt0 = tR
    pairs = [(R, tR)]
    while R < 16384 and max(tR - rtt0, 0.0) < 0.7 and tR < 8.0:
        R *= 2
        tR = t(R)
        pairs.append((R, tR))
    if len(pairs) >= 2:
        R1, R2 = pairs[-2][0], pairs[-1][0]
    else:  # even 16 reps ran >0.7s: very slow body
        R1, R2 = 4, 16
        t(R1)
    best = None
    for _ in range(rounds):
        t1, t2 = t(R1), t(R2)
        per = (t2 - t1) / (R2 - R1)
        # Degraded-window guard: when the tunnel RTT dominates BOTH
        # endpoints, t2-t1 is noise around zero and the slope yields
        # absurd rates (observed: a 0.6 ms/call program "measuring"
        # 1114 GB/s). Demand real signal — the body must account for at
        # least 20% of t2 — else fall back to the amortized upper bound
        # (honest, conservative).
        if per <= 0 or (t2 - t1) < 0.2 * t2:
            per = t2 / R2
        best = per if best is None else min(best, per)
    return best


def tmed(fn, iters=5, rounds=3):
    _force(fn())
    best = None
    for _ in range(rounds):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _force(fn())
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        best = med if best is None else min(best, med)
    return best


def run_configs(size_mb: float, which, engines="all"):
    """engines='fast' measures only the production engines (fused/schain/
    classrun/literal + e2e paths); 'all' adds the gather formulations
    (dfa/pallas/mxu), each 100x+ slower on v5e (bench/NOTES.md), which
    multiplies wall time."""
    import jax

    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from bench.corpus import make_corpus, make_lines_corpus
    from rejit_tpu import Config, Pattern
    from rejit_tpu.engine import pipeline, spans
    from rejit_tpu.kernels import literal as lk
    from rejit_tpu import oracle

    size = int(size_mb * 1024 * 1024)
    slow = engines == "all"
    results = {}

    def report(name, seconds, nbytes, extra="", kind="device"):
        """kind='device' rows are chained-reps DEVICE rates; kind='wall'
        rows are single-dispatch wall clock and therefore bounded by the
        tunnel's ~25 MB/s pipe / per-dispatch RTT on this rig, NOT by the
        chip (bench/NOTES.md round-3 e2e roofline) — a 0.01 GB/s wall row
        is the transfer floor, not a kernel regression."""
        gbps = nbytes / seconds / 1e9
        results[name] = {
            "seconds": seconds, "bytes": nbytes, "GBps": gbps,
            "kind": kind, "note": extra,
        }
        log(f"{name}: {seconds*1e3:.3f} ms -> {gbps:.2f} GB/s [{kind}] "
            f"{extra}")

    # ---- config 1: literal MatchAll ------------------------------------
    if 1 in which:
        corpus = make_corpus(size, seed=0, needle=b"packet", density=0.002)
        n = len(corpus)
        text = np.frombuffer(corpus, dtype=np.uint8)
        p = Pattern("packet")
        ext = jax.device_put(jnp.asarray(lk.extend_pad(text, n, 6)))
        n_dev = jnp.int32(n)
        step = lambda nv: lk.literal_count_device(
            ext, nv, lits=p.info.literals, P=n
        )
        assert int(step(n_dev)) == corpus.count(b"packet")
        report("config1_literal_count", tchain(step, n), n)

        # span path, device side only (L/I array production)
        step2 = lambda nv: lk.literal_l_arrays_device(
            ext, nv, lits=p.info.literals, pids=p.info.literal_pids, P=n
        )[0].max()
        report("config1_literal_Larray", tchain(step2, n), n)

        # bitpacked spans-out (the round-4 headline program, bench.py):
        # packed candidate mask + popcount peel, full span extraction.
        ROW_W = 32
        words0 = lk.literal_mask_packed_device(
            ext, n_dev, lits=p.info.literals, P=n, row_w=ROW_W
        )
        _, cnt0 = spans.extract_rows_bitmask(words0, row_w=ROW_W, row_cap=1)
        bcap = 1
        while bcap < int(jnp.max(cnt0)):
            bcap *= 2

        def step3(nv):
            wd = lk.literal_mask_packed_device(
                ext, nv, lits=p.info.literals, P=n, row_w=ROW_W
            )
            s, kk = spans.extract_rows_bitmask(
                wd, row_w=ROW_W, row_cap=bcap
            )
            # Flat 2-reduction DCE guard (bench.py round 4: the
            # where/valid form measured the checksum, not the program).
            return jnp.sum(s, dtype=jnp.int32) + jnp.sum(kk, dtype=jnp.int32)

        s0, c0 = spans.extract_rows_bitmask(words0, row_w=ROW_W, row_cap=bcap)
        sp0 = np.asarray(s0).ravel()
        assert int((sp0 >= 0).sum()) == corpus.count(b"packet")
        report("config1_bitmask_spans", tchain(step3, n), n,
               f"cap {bcap}, full span extraction")

    # ---- config 2: class + alternation ---------------------------------
    if 2 in which:
        corpus = make_corpus(size, seed=1, needle=b"foo", density=0.001)
        n = len(corpus)
        text = np.frombuffer(corpus, dtype=np.uint8)
        for pat in ("[a-z]+", "foo|bar|baz"):
            p = Pattern(pat, _dfa_cfg())
            report(f"config2_fused_{pat}",
                   tchain(_fused_step(p, text, jax, jnp), n), n,
                   f"Q={p.tables.n_states}")
            report(f"config2_sch_{pat}",
                   tchain(_schain_step(p, text, jax, jnp), n), n,
                   f"Q={p.tables.n_states}")
            if slow:
                report(f"config2_mxu_{pat}",
                       tchain(_mxu_step(p, text, jax, jnp), n), n)
                report(f"config2_dfa_{pat}",
                       tchain(_dfa_step(p, text, jax, jnp), n), n)
                report(f"config2_pal_{pat}",
                       tchain(_dfa_step(p, text, jax, jnp, pallas=True), n),
                       n)
        # Bitpacked literal-set program (round 4): foo|bar|baz is a
        # fixed-width overlap-free literal SET, so the AUTO engine serves
        # it with the packed candidate mask + popcount peel — the same
        # program as config1_bitmask_spans, here on the alternation. The
        # fused-DFA row above is the general-engine comparison point,
        # not the production route.
        pl = Pattern("foo|bar|baz")
        assert pl.engine == "literal" and pl.info.overlap_free
        ROW_W2 = 32
        wmax = max(len(l) for l in pl.info.literals)
        extl = jax.device_put(jnp.asarray(lk.extend_pad(text, n, wmax)))
        ndl = jnp.int32(n)
        wd0 = lk.literal_mask_packed_device(
            extl, ndl, lits=pl.info.literals, P=n, row_w=ROW_W2
        )
        _, c0 = spans.extract_rows_bitmask(wd0, row_w=ROW_W2, row_cap=1)
        bcap2 = 1
        while bcap2 < int(jnp.max(c0)):
            bcap2 *= 2

        def step_bm(nv):
            wd = lk.literal_mask_packed_device(
                extl, nv, lits=pl.info.literals, P=n, row_w=ROW_W2
            )
            s, kk = spans.extract_rows_bitmask(
                wd, row_w=ROW_W2, row_cap=bcap2
            )
            return jnp.sum(s, dtype=jnp.int32) + jnp.sum(kk, dtype=jnp.int32)

        s0, _ = spans.extract_rows_bitmask(wd0, row_w=ROW_W2, row_cap=bcap2)
        sp0 = np.asarray(s0).ravel()
        sp0 = sp0[sp0 >= 0]
        hs2, _, _ = pl.match_all_arrays(text)
        assert np.array_equal(sp0, hs2), (len(sp0), len(hs2))
        report("config2_bitmask_foo|bar|baz", tchain(step_bm, n), n,
               f"cap {bcap2}, full span extraction, {len(hs2)} matches")

        # MatchFirst on the literal set: one O(1)-output reduction over
        # the packed words (rejit stops at the first verified hit,
        # SURVEY.md §3.3; here the whole scan runs at memory speed and
        # one scalar comes back).
        def step_first(nv):
            wd = lk.literal_mask_packed_device(
                extl, nv, lits=pl.info.literals, P=n, row_w=ROW_W2
            )
            return spans.first_candidate_bitmask(wd)

        finds = [corpus.find(l) for l in pl.info.literals]
        exp_first = min(f for f in finds if f >= 0)
        assert int(step_first(ndl)) == exp_first
        report("config2_first_foo|bar|baz", tchain(step_first, n), n,
               "MatchFirst O(1)-output reduction")

        # classrun specialization (the CPU auto engine; on accelerators
        # auto now prefers the fused DFA — see api._select_engine)
        pc = Pattern("[a-z]+", Config(engine="classrun"))
        from rejit_tpu.kernels import classrun as crk

        from rejit_tpu.kernels import scan1d as s1d2

        lut, wlut, lo, hi, lead_wb, trail_wb = pc._classrun
        P2 = s1d2.pad_len(n)
        pad2 = np.zeros(P2, dtype=np.uint8)
        pad2[:n] = text
        td2 = jax.device_put(jnp.asarray(pad2))
        nd2 = jnp.int32(n)
        step_cr = lambda nv: crk.classrun_l_arrays_device(
            lut, wlut, td2, nv, lo=lo, has_hi=hi is not None, hi=hi or 0,
            lead_wb=lead_wb, trail_wb=trail_wb, pallas_scan=True,
            class_runs=pc._class_runs, word_runs=pc._word_runs,
        )[0].max()
        report("config2_classrun_[a-z]+", tchain(step_cr, n), n)

        # (?i) case-insensitive literal (round 4): folding turns the
        # literal into per-byte classes, so the auto engine serves it
        # with the fused DFA — measure that production path.
        corpus_i = make_corpus(size, seed=3, needle=b"PackEt", density=0.002)
        text_i = np.frombuffer(corpus_i, dtype=np.uint8)
        pi = Pattern("(?i)packet", _dfa_cfg())
        report("config2_fused_(?i)packet",
               tchain(_fused_step(pi, text_i, jax, jnp), n), n,
               f"Q={pi.tables.n_states}")

        # AUTO path for (?i)packet since the class-literal round: the
        # folded literal is ONE class-literal (2 bytes/position), served
        # by the bitpacked candidate-mask program — count/first as pure
        # reductions, spans via the popcount peel. The fused-DFA row
        # above becomes the general-engine comparison point.
        pic = Pattern("(?i)packet")
        assert pic.engine == "literal" and pic.info.overlap_free
        exti = jax.device_put(
            jnp.asarray(lk.extend_pad(text_i, n, pic.info.max_len))
        )
        ndi = jnp.int32(n)
        wdi = lk.literal_mask_packed_device(
            exti, ndi, lits=pic.info.literals, P=n, row_w=ROW_W2
        )
        _, ci = spans.extract_rows_bitmask(wdi, row_w=ROW_W2, row_cap=1)
        bcapi = 1
        while bcapi < int(jnp.max(ci)):
            bcapi *= 2

        def step_bmi(nv):
            wd = lk.literal_mask_packed_device(
                exti, nv, lits=pic.info.literals, P=n, row_w=ROW_W2
            )
            s, kk = spans.extract_rows_bitmask(
                wd, row_w=ROW_W2, row_cap=bcapi
            )
            return jnp.sum(s, dtype=jnp.int32) + jnp.sum(kk, dtype=jnp.int32)

        si0, _ = spans.extract_rows_bitmask(wdi, row_w=ROW_W2, row_cap=bcapi)
        spi = np.asarray(si0).ravel()
        spi = spi[spi >= 0]
        hsi, _, _ = pic.match_all_arrays(text_i)
        assert np.array_equal(spi, hsi), (len(spi), len(hsi))
        report("config2_bitmask_(?i)packet", tchain(step_bmi, n), n,
               f"cap {bcapi}, full span extraction, {len(hsi)} matches")

    # ---- config 3: full regex via dense DFA ----------------------------
    if 3 in which:
        # Plant real matches: the word corpus contains NO \w+ing words, so
        # the r1/r2 spans numbers measured extraction over an EMPTY
        # candidate set (round-3 finding). 1% planted "matching" words
        # gives ~17.7K matches per 10 MB.
        corpus = make_corpus(size, seed=2, needle=b"matching", density=0.01)
        n = len(corpus)
        text = np.frombuffer(corpus, dtype=np.uint8)
        p = Pattern(r"\b\w+ing\b", _dfa_cfg())
        report("config3_fused_wb_ing",
               tchain(_fused_step(p, text, jax, jnp), n), n,
               f"Q={p.tables.n_states}")
        if slow:
            # Rolled (fori_loop) kernel form: the large-Q compile-time
            # mitigation — report its runtime overhead vs the unrolled
            # form at production Q (kernels/schain_pallas.py rolled=).
            report("config3_fused_rolled_wb_ing",
                   tchain(_fused_step(p, text, jax, jnp, rolled=True), n),
                   n, f"Q={p.tables.n_states} rolled")
        # Large-Q bounded-run family via the classrun engine (the auto
        # route for \b[class]{lo,hi}\b with hi+2 >= 48: Q-independent,
        # vs the rolled kernel's ~Q^1.5 falloff — 0.71 GB/s at Q=126).
        from rejit_tpu.kernels import classrun as crk3

        from rejit_tpu.kernels import scan1d as s1d

        plq = Pattern(r"\b[a-z]{62,124}\b", Config(engine="classrun"))
        lutq, wlutq, loq, hiq, leadq, trailq = plq._classrun
        Pq = s1d.pad_len(n)
        padq = np.zeros(Pq, dtype=np.uint8)
        padq[:n] = text
        tdq = jax.device_put(jnp.asarray(padq))

        def step_lq(nv):
            L, _ = crk3.classrun_l_arrays_device(
                lutq, wlutq, tdq, nv, lo=loq, has_hi=True, hi=hiq,
                lead_wb=leadq, trail_wb=trailq, pallas_scan=True,
                class_runs=plq._class_runs, word_runs=plq._word_runs,
            )
            return jnp.sum(jnp.where(L >= 0, L, 0), dtype=jnp.int32)

        # parity on a slice: device L checksum == oracle-backed API spans
        import re as _re
        sliceq = corpus[: 1 << 16]
        want_q = [
            (m.start(), m.end())
            for m in _re.finditer(rb"\b[a-z]{62,124}\b", sliceq)
        ]
        assert plq.match_all(sliceq) == want_q
        report("config3_classrun_largeq", tchain(step_lq, n), n,
               "Q=126-equivalent \\b[a-z]{62,124}\\b via classrun")
        # Run+literal-suffix family ([A-Za-z]{30,60}ing -> Q=152 DFA)
        # via the classlit engine (segmented reverse max + sliding
        # window max, Q-independent).
        from rejit_tpu.kernels import classlit as clk3

        pll = Pattern(r"[A-Za-z]{30,60}ing", Config(engine="classlit"))
        lutl, wlutl, lol, hil, sfxl, leadl, traill = pll._classlit

        def step_ll(nv):
            L, _ = clk3.classlit_l_arrays_device(
                lutl, wlutl, tdq, nv, lo=lol, has_hi=True, hi=hil,
                sfx=sfxl, lead_wb=leadl, trail_wb=traill,
                pallas_scan=True,
                class_runs=pll._class_runs, word_runs=pll._word_runs,
            )
            return jnp.sum(jnp.where(L >= 0, L, 0), dtype=jnp.int32)

        want_l = [
            (m.start(), m.end())
            for m in _re.finditer(rb"[A-Za-z]{30,60}ing", sliceq)
        ]
        assert pll.match_all(sliceq) == want_l
        report("config3_classlit_largeq", tchain(step_ll, n), n,
               "Q=152-equivalent [A-Za-z]{30,60}ing via classlit")
        # DFA-blowup family on the position-NFA bit-set engine (round 5):
        # (a|b)*a(a|b){14} needs a ~2^15-state DFA; the position
        # automaton has Q=32 and runs on device (engine/nfaset.py).
        from rejit_tpu.compile import parser as rparser3
        from rejit_tpu.compile import posnfa as posnfa_mod
        from rejit_tpu.engine import nfaset

        rngb = np.random.default_rng(7)
        tb = rngb.choice(np.frombuffer(b"aabbx", np.uint8), size=n)
        ptb = posnfa_mod.compile_posnfa(
            [rparser3.parse(rb"(a|b)*a(a|b){14}")]
        )
        Kb = 64          # the K-sweep optimum for one packed word
        Pb = -(-n // Kb) * Kb
        padb = np.zeros(Pb, np.uint8)
        padb[:n] = tb
        tdb = jax.device_put(jnp.asarray(padb))

        def step_nfa(nv):
            L, I = nfaset.l_arrays_device_nfaset(ptb, tdb, nv, block=Kb)
            return (
                jnp.sum(L, dtype=jnp.int32) + jnp.sum(I, dtype=jnp.int32)
            )

        # Parity on a prefix vs the oracle (full-text oracle is hours).
        npfx = 4096
        pfx_pad = np.zeros(npfx, np.uint8)
        pfx_pad[:npfx] = padb[:npfx]
        Lh, _ = nfaset.l_arrays(ptb, pfx_pad, npfx)
        orcb = oracle.OraclePattern(rb"(a|b)*a(a|b){14}")
        pfx = tb[:npfx].tobytes()
        for s in (0, 1, 7, npfx // 2, npfx - 20):
            e, _pid = orcb.longest_end(pfx, s)
            assert Lh[s] == (e if e is not None else -1), s
        report("config3_posnfa_blowup", tchain(step_nfa, n), n,
               "(a|b)*a(a|b){14} Q=32 posnfa (DFA ~2^15 states)")
        # Spans-out end-to-end: fused L/I -> gather-free row extraction ->
        # checksum (the general-DFA analog of the bench.py headline).
        from rejit_tpu.engine import schain as se3, spans as spans3
        from rejit_tpu.kernels import schain_pallas as sp3

        K3, CHL3 = 128, 128
        st3 = se3.static_tables(p.tables)
        grain3 = K3 * 8 * CHL3
        P3 = ((n + grain3 - 1) // grain3) * grain3
        pad3 = np.zeros(P3, dtype=np.uint8)
        pad3[:n] = text
        td3 = jax.device_put(jnp.asarray(pad3))
        staged3 = jax.jit(
            lambda td: sp3.stage_text(st3, td, block=K3, chl=CHL3)
        )(td3)
        L3, I3 = sp3.l_arrays_device_staged(
            st3, p.tables.n_patterns, staged3, jnp.int32(n),
            block=K3, chl=CHL3,
        )
        mx3 = int(spans3.row_max_count(L3))
        cap3 = 2
        while cap3 < mx3:
            cap3 *= 2
        wmax3 = int(spans3.max_width(L3))
        ebits3 = (256 + wmax3).bit_length()

        def step3s(nv):
            L, _ = sp3.l_arrays_device_staged(
                st3, p.tables.n_patterns, staged3, nv, block=K3, chl=CHL3
            )
            s_, e_, cnt_ = spans3.extract_rows_packed(
                L, row_cap=cap3, ebits=ebits3
            )
            v = s_ >= 0
            return (
                jnp.sum(jnp.where(v, s_, 0), dtype=jnp.int32)
                + jnp.sum(jnp.where(v, e_, 0), dtype=jnp.int32)
                + jnp.sum(cnt_, dtype=jnp.int32)
            )

        # parity: device extraction checksum == the public API's spans
        s3h, e3h, _ = p.match_all_arrays(text)
        want3 = int(
            (np.sum(s3h) + np.sum(e3h) + len(s3h)) & 0xFFFFFFFF
        )
        got3 = int(step3s(jnp.int32(n))) & 0xFFFFFFFF
        assert got3 == want3, (got3, want3)
        report("config3_fused_spans_e2e", tchain(step3s, n), n,
               f"cap {cap3}, {len(s3h)} matches, checksum==host")
        report("config3_sch_wb_ing",
               tchain(_schain_step(p, text, jax, jnp), n), n,
               f"Q={p.tables.n_states}")
        if slow:
            report("config3_mxu_wb_ing",
                   tchain(_mxu_step(p, text, jax, jnp), n), n)
            report("config3_dfa_wb_ing",
                   tchain(_dfa_step(p, text, jax, jnp), n), n)
            report("config3_pal_wb_ing",
                   tchain(_dfa_step(p, text, jax, jnp, pallas=True), n), n)

    # ---- config 4: tokenizer multi-pattern -----------------------------
    if 4 in which:
        corpus = make_corpus(size, seed=3)
        n = len(corpus)
        text = np.frombuffer(corpus, dtype=np.uint8)
        p = Pattern([r"\w+", r"\s+", r"[^\w\s]+"], _dfa_cfg())
        report("config4_fused_tokenizer",
               tchain(_fused_step(p, text, jax, jnp), n), n,
               f"Q={p.tables.n_states}")
        report("config4_sch_tokenizer",
               tchain(_schain_step(p, text, jax, jnp), n), n,
               f"Q={p.tables.n_states}")
        if slow:
            report("config4_mxu_tokenizer",
                   tchain(_mxu_step(p, text, jax, jnp), n), n)
            report("config4_tokenizer_L",
                   tchain(_dfa_step(p, text, jax, jnp), n), n)
            report("config4_pal_tokenizer",
                   tchain(_dfa_step(p, text, jax, jnp, pallas=True), n), n)
        # End-to-end spans incl. host materialization: the run-partition
        # elementwise selection + 1-byte/position pid transfer + numpy
        # decode (engine/spans.py partition_*). Bounded by the tunnel's
        # measured ~20-30 MB/s data bandwidth (bench/e2e_probe.py), i.e.
        # this number IS the dense-output transfer roofline on this rig —
        # see bench/NOTES.md "dense-match e2e roofline" (round 3).
        assert p.info.run_partition
        p.match_all_arrays(text)  # warm
        e2e_best, n_tok = None, 0
        for _ in range(3):
            t0 = time.perf_counter()
            starts, _, _ = p.match_all_arrays(text)
            dt = time.perf_counter() - t0
            e2e_best = dt if e2e_best is None else min(e2e_best, dt)
            n_tok = len(starts)
        report("config4_tokenizer_e2e", e2e_best, n,
               f"{n_tok} tokens (1-byte/pos transfer, min of 3)", kind="wall")

        # Count e2e: pure device reduction + one scalar readback.
        p.match_all_count(text)  # warm
        cnt_best = None
        for _ in range(3):
            t0 = time.perf_counter()
            cnt = p.match_all_count(text)
            dt = time.perf_counter() - t0
            cnt_best = dt if cnt_best is None else min(cnt_best, dt)
        report("config4_count_e2e", cnt_best, n,
               f"{cnt} tokens (single call, RTT included)", kind="wall")

        # Dense spans-out ON DEVICE, chained: fused L/I -> ELEMENTWISE
        # non-overlap selection (partition_select_mask; the old
        # pointer-doubling path measured ~620 ns/candidate and is
        # retired) -> checksum over selected (start, end, pid).
        from rejit_tpu.engine import spans as spans_mod

        K4, CHL4 = 128, 128
        from rejit_tpu.engine import schain as se4
        from rejit_tpu.kernels import schain_pallas as sp4

        st4 = se4.static_tables(p.tables)
        ns = n
        grain4 = K4 * 8 * CHL4
        P4 = ((ns + grain4 - 1) // grain4) * grain4
        pad4 = np.zeros(P4, dtype=np.uint8)
        pad4[:ns] = text
        td4 = jax.device_put(jnp.asarray(pad4))
        staged4 = jax.jit(
            lambda td: sp4.stage_text(st4, td, block=K4, chl=CHL4)
        )(td4)

        def step4(nv):
            L, I = sp4.l_arrays_device_staged(
                st4, p.tables.n_patterns, staged4, nv, block=K4, chl=CHL4
            )
            m = spans_mod.partition_select_mask(L, I)
            pos = jnp.arange(L.shape[0], dtype=jnp.int32)
            return (
                jnp.sum(jnp.where(m, pos, 0), dtype=jnp.int32)
                + jnp.sum(jnp.where(m, L, 0), dtype=jnp.int32)
                + jnp.sum(jnp.where(m, I, 0), dtype=jnp.int32)
            )

        # parity: device checksum == host-decoded checksum
        s_h, e_h, p_h = p.match_all_arrays(text)
        want4 = int(
            (np.sum(s_h) + np.sum(e_h) + np.sum(p_h)) & 0xFFFFFFFF
        )
        got4 = int(step4(jnp.int32(ns))) & 0xFFFFFFFF
        assert got4 == want4, (got4, want4)
        report("config4_spans_device", tchain(step4, ns), ns,
               f"{len(s_h)} tokens, elementwise selection, "
               "checksum==host")

    # ---- config 5: sharded corpus over all devices ---------------------
    if 5 in which:
        from rejit_tpu.dist.mesh import make_mesh
        from rejit_tpu.dist.sharded import sharded_l_arrays_device
        from rejit_tpu.compile import parser as rparser
        from rejit_tpu.compile.dfa import compile_patterns
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = make_mesh()
        D = mesh.devices.size
        corpus = make_corpus(size, seed=4, needle=b"packet", density=0.002)
        n = len(corpus)
        block = 32
        chunk = D * block
        P = ((n + 1 + chunk - 1) // chunk) * chunk
        pad = np.zeros(P, dtype=np.uint8)
        pad[:n] = np.frombuffer(corpus, dtype=np.uint8)
        t = compile_patterns([rparser.parse(rb"packet")])
        ct = pipeline.device_tables(t)
        sharding = NamedSharding(mesh, PartitionSpec("data"))
        text_dev = jax.device_put(jnp.asarray(pad), sharding)
        if slow:
            # ~0.003 GB/s class: 16 chained reps exceed the tunnel's
            # program-kill threshold, so only --engines all measures it.
            step5 = lambda nv: sharded_l_arrays_device(
                ct, text_dev, nv, mesh=mesh, block=block, num_shards=D
            )[0].max()
            report(f"config5_sharded_D{D}", tchain(step5, n), n)

        # Production engine sharded: fused kernel per shard + exact
        # cross-shard tail splice (dist/sharded.py:_local_fused_fn).
        from rejit_tpu.dist.sharded import sharded_l_arrays_device_fused
        from rejit_tpu.engine import schain as se5

        K5, CHL5 = 128, 128
        st5 = se5.static_tables(t)
        grain5 = D * K5 * 8 * CHL5
        P5 = ((n + 1 + grain5 - 1) // grain5) * grain5
        pad5 = np.zeros(P5, dtype=np.uint8)
        pad5[:n] = np.frombuffer(corpus, dtype=np.uint8)
        text5 = jax.device_put(jnp.asarray(pad5), sharding)
        step5f = lambda nv: sharded_l_arrays_device_fused(
            st5, t.n_patterns, text5, nv, mesh=mesh, block=K5, chl=CHL5,
            num_shards=D
        )[0].max()
        report(f"config5_fused_sharded_D{D}", tchain(step5f, n), n)

        # Streaming engine (corpus larger than device memory): end-to-end
        # wall time incl. host chunk staging, candidate readback, selection.
        from rejit_tpu.engine import stream as rstream
        from rejit_tpu.kernels.dfa_pallas import CHUNK

        on_tpu = jax.default_backend() not in ("cpu",)
        if on_tpu:  # production chunk engine (fused kernel, K=128 CHL=128)
            grain = 128 * 8 * 128
            cb = max(grain, (n // 4) // grain * grain)
        else:
            grain = 32
            cb = max(grain, (n // 4) // grain * grain)
        arr = np.frombuffer(corpus, dtype=np.uint8)
        run5 = lambda: rstream.stream_match_all(
            t, arr, chunk_bytes=cb,
            **({"engine": "fused", "block": 128}
               if on_tpu else {}),
        )
        s5, _e5, _ = run5()  # warm both chunk shapes
        assert len(s5) == corpus.count(b"packet")
        best = None  # best-of rounds: gate out tunnel slow-mode windows
        for _ in range(3):
            t0 = time.perf_counter()
            run5()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        report("config5_stream_e2e", best, n, f"chunks of {cb>>20}MB", kind="wall")

    return results


def compare_python_re(size_mb: float):
    import re
    import time as _t

    from bench.corpus import make_corpus

    size = int(size_mb * 1024 * 1024)
    corpus = make_corpus(size, seed=0, needle=b"packet", density=0.002)
    for pat in (rb"packet", rb"[a-z]+", rb"\b\w+ing\b"):
        rx = re.compile(pat)
        t0 = _t.perf_counter()
        cnt = sum(1 for _ in rx.finditer(corpus))
        dt = _t.perf_counter() - t0
        log(
            f"python-re {pat.decode()}: {dt*1e3:.1f} ms -> "
            f"{size/dt/1e9:.3f} GB/s ({cnt} matches)"
        )


def _dfa_cfg():
    from rejit_tpu import Config

    return Config(engine="dfa", block_size=32)


def _fused_step(p, text, jax, jnp, K=None, CHL=None, rolled=False):
    """step(nv) for the VMEM-fused select-chain kernel (the production
    accelerator engine, kernels/schain_pallas.py); corpus staged once.
    rolled=True measures the fori_loop (large-Q compile) form. K/CHL
    default to the pattern's production geometry (api._fused_params —
    CHL=512 for single-pattern small-Q since round 4)."""
    if K is None or CHL is None:
        pk, pchl = p._fused_params()
        K = K or pk
        CHL = CHL or pchl
    n = len(text)
    from rejit_tpu.engine import schain as se
    from rejit_tpu.kernels import schain_pallas as sp

    st = se.static_tables(p.tables)
    grain = K * 8 * CHL
    P = ((n + grain - 1) // grain) * grain
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = text
    text_dev = jax.device_put(jnp.asarray(pad))
    staged = jax.jit(
        lambda td: sp.stage_text(st, td, block=K, chl=CHL)
    )(text_dev)

    def step(nv):
        L, I = sp.l_arrays_device_staged(
            st, p.tables.n_patterns, staged, nv, block=K, chl=CHL,
            rolled=rolled,
        )
        return L.max() + I.max()

    return step


def _schain_step(p, text, jax, jnp):
    """step(nv) for the gather-free select-chain engine (engine/schain.py)."""
    n = len(text)
    block = p.config.block_size
    from rejit_tpu.engine import schain as se

    st = se.static_tables(p.tables)
    P = ((n + block - 1) // block) * block
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = text
    text_dev = jax.device_put(jnp.asarray(pad))
    return lambda nv: se.l_arrays_device_schain(
        st, text_dev, nv, block=block
    )[0].max()


def _mxu_step(p, text, jax, jnp):
    """step(nv) for the MXU matmul DFA engine (engine/matmul.py)."""
    n = len(text)
    block = p.config.block_size
    from rejit_tpu.engine import matmul as me

    P = ((n + block - 1) // block) * block
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = text
    text_dev = jax.device_put(jnp.asarray(pad))
    return lambda nv: me.l_arrays_device_matmul(
        p.ct, text_dev, nv, block=block
    )[0].max()


def _dfa_step(p, text, jax, jnp, pallas=False):
    """step(nv) -> scalar for tchain over the (padded, device-staged) text."""
    n = len(text)
    block = p.config.block_size
    from rejit_tpu.engine import pipeline
    from rejit_tpu.kernels.dfa_pallas import CHUNK

    gran = block * CHUNK if pallas else block
    P = ((n + gran - 1) // gran) * gran
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = text
    text_dev = jax.device_put(jnp.asarray(pad))
    if pallas:
        return lambda nv: pipeline.l_arrays_device_pallas(
            p.ct, text_dev, nv, block=block
        )[0].max()
    return lambda nv: pipeline.l_arrays_device(
        p.ct, text_dev, nv, block=block
    )[0].max()


def _dfa_fn(p, text, jax, jnp, pallas=False):
    n = len(text)
    block = p.config.block_size
    from rejit_tpu.engine import pipeline
    from rejit_tpu.kernels.dfa_pallas import CHUNK

    gran = block * CHUNK if pallas else block
    P = ((n + gran - 1) // gran) * gran
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = text
    text_dev = jax.device_put(jnp.asarray(pad))
    n_dev = jnp.int32(n)
    if pallas:
        return lambda: pipeline.l_arrays_device_pallas(
            p.ct, text_dev, n_dev, block=block
        )[0]
    return lambda: pipeline.l_arrays_device(
        p.ct, text_dev, n_dev, block=block
    )[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=float, default=10.0, help="corpus MB")
    ap.add_argument("--json", default=None)
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument(
        "--compare-re",
        action="store_true",
        help="also time Python re (the in-environment reference engine; "
        "engine-vs-engine parity with rejit's RE2/PCRE/V8 harness)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the machine sitecustomize force-"
        "prepends the TPU plugin, so JAX_PLATFORMS=cpu alone is ignored)",
    )
    ap.add_argument(
        "--each", action="store_true",
        help="run every config in its own child process (the tunneled TPU "
        "worker occasionally crashes mid-run, which poisons the backend "
        "for the rest of the process; isolation keeps one crash from "
        "killing the whole matrix) and merge the JSON results",
    )
    ap.add_argument("--child-timeout", type=float, default=1200.0)
    ap.add_argument(
        "--engines", default="all", choices=["all", "fast"],
        help="fast: production engines only; all: also the gather "
        "formulations (dfa/pallas/mxu), 100x+ slower per measurement",
    )
    ap.add_argument(
        "--no-history", action="store_true",
        help="skip appending results to bench/history.jsonl (§5.5 "
        "bench-history scalars; used for child processes and tests)",
    )
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    which = {int(x) for x in args.configs.split(",")}
    if args.each:
        import subprocess
        import tempfile

        merged = {}
        for c in sorted(which):
            for attempt in range(2):  # the worker crash is often transient
                with tempfile.NamedTemporaryFile(suffix=".json") as tf:
                    cmd = [sys.executable, os.path.abspath(__file__),
                           "--configs", str(c), "--size", str(args.size),
                           "--engines", args.engines, "--json", tf.name,
                           "--no-history"]
                    if args.cpu:
                        cmd.append("--cpu")
                    try:
                        r = subprocess.run(
                            cmd, timeout=args.child_timeout,
                            capture_output=True, text=True,
                        )
                        for ln in r.stderr.splitlines():
                            if "WARNING" not in ln:
                                log(ln)
                        if r.returncode == 0:
                            with open(tf.name) as f:
                                merged.update(json.load(f))
                            merged.pop(f"config{c}_error", None)
                            break
                        log(f"config {c}: child rc={r.returncode} "
                            f"(attempt {attempt})")
                        merged[f"config{c}_error"] = {"rc": r.returncode}
                    except subprocess.TimeoutExpired:
                        log(f"config {c}: child timeout (attempt {attempt})")
                        merged[f"config{c}_error"] = {"rc": "timeout"}
        if args.json:
            with open(args.json, "w") as f:
                json.dump(merged, f, indent=1)
        print(json.dumps(merged))
        if not args.no_history:
            from bench import history

            history.record(merged, source=f"harness:{args.configs}")
        return
    if args.compare_re:
        compare_python_re(args.size)
    results = run_configs(args.size, which, engines=args.engines)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))
    if not args.no_history:
        from bench import history

        history.record(results, source=f"harness:{args.configs}")


if __name__ == "__main__":
    main()
