#!/usr/bin/env python
"""On-TPU correctness gate: engine bit-equality + conformance on the chip.

CI runs every engine on the CPU backend (interpret-mode Pallas); this gate
re-runs the equality and conformance checks on the REAL device so a
Mosaic-vs-XLA lowering divergence cannot ship silently (VERDICT r1
"What's missing" #7; the analog of rejit's debug/release x SIMD on/off
build matrix, SURVEY.md §4.1).

Checks (child process under a watchdog, axon tunnel protocol per bench.py):
  A. L/I bit-equality of the fused Pallas select-chain kernel vs the XLA
     select-chain engine vs the jnp gather pipeline, on-device, for the
     bench-config pattern families over a 1 MB corpus.
  B. Public-API span parity on a conformance-corpus subset with the fused
     engine FORCED on (compiled Mosaic, not interpret).

Usage: python tools/verify_tpu.py [--child] [--subset N] [--size MB]
Exit 0 = all green. Run via `make verify-tpu` before every bench round.
"""
import argparse
import base64
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ENGINE_PATTERNS = [
    ["packet"],                      # config 1 (literal; exercised via DFA)
    ["[a-z]+"],                      # config 2 class
    ["foo|bar|baz"],                 # config 2 alternation
    [r"\b\w+ing\b"],                 # config 3 dense DFA
    [r"[A-Za-z_]\w*", r"\d+", r"\s+", r"[^\w\s]+"],  # config 4 tokenizer
]


def child(subset: int, size_mb: float, cpu: bool = False,
          rolled: bool = False) -> None:
    import numpy as np

    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()
    import jax

    if cpu:  # smoke-test the gate logic itself without the tunnel
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    from bench.corpus import make_corpus
    from rejit_tpu import Config, Pattern
    from rejit_tpu.errors import CompileError
    from rejit_tpu.compile import parser as rparser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.engine import pipeline, schain
    from rejit_tpu.kernels import schain_pallas

    # ---- A. engine bit-equality on device ------------------------------
    # Dense text PLUS a sparse (punctuation-heavy) corpus: the sparse one
    # drives the fused kernel's compiled chunk-skip branch, which
    # interpret-mode CI cannot exercise (it runs branchless — see
    # kernels/schain_pallas.py).
    n = int(size_mb * 1024 * 1024)
    # --cpu smoke mode uses the CI geometry: XLA CPU fails with "Unknown
    # MLIR failure" compiling the INTERPRET-mode program for some
    # patterns ([a-z]+) at production geometry (K>=16, any CHL, FF on or
    # off — reproduced round 4); the Mosaic path this gate exists to pin
    # is a different compile pipeline entirely.
    K, CHL = (8, 2) if cpu else (32, 128)
    grain = K * 8 * CHL
    P = -(-n // grain) * grain
    texts = {}
    texts["dense"] = np.frombuffer(make_corpus(n, seed=7), dtype=np.uint8)
    rng = np.random.default_rng(11)
    sparse = rng.choice(
        np.frombuffer(b" .,;:!?#-", np.uint8), size=n
    ).astype(np.uint8)
    isl = np.frombuffer(b" singing kings winging it foo bar 123 ", np.uint8)
    for off in range(1 << 16, n - len(isl), 1 << 17):
        sparse[off:off + len(isl)] = isl
    texts["sparse"] = sparse
    n_d = jnp.int32(n)

    for pats in ENGINE_PATTERNS:
        t = compile_patterns([rparser.parse(p.encode()) for p in pats])
        st = schain.static_tables(t)
        ct = pipeline.device_tables(t)
        for cname, text in texts.items():
            pad = np.zeros(P, dtype=np.uint8)
            pad[:n] = text
            pad_d = jax.device_put(jnp.asarray(pad))
            a = time.time()
            L1, I1 = jax.device_get(
                pipeline.l_arrays_device(ct, pad_d, n_d, block=K)
            )
            L2, I2 = jax.device_get(
                schain.l_arrays_device_schain(st, pad_d, n_d, block=K)
            )
            L3, I3 = jax.device_get(
                schain_pallas.l_arrays_device_schain_fused(
                    st, t.n_patterns, pad_d, n_d, block=K, chl=CHL,
                    interpret=cpu, rolled=rolled,
                )
            )
            ok = (
                np.array_equal(L1, L2) and np.array_equal(I1, I2)
                and np.array_equal(L1, L3) and np.array_equal(I1, I3)
            )
            log(
                f"A {pats!r} [{cname}]: Q={t.n_states} C={t.n_classes} "
                f"{'OK' if ok else 'MISMATCH'} ({time.time()-a:.1f}s)"
            )
            if not ok:
                for name, L, I in (("schain", L2, I2), ("fused", L3, I3)):
                    dl = np.nonzero(L1 != L)[0]
                    di = np.nonzero(I1 != I)[0]
                    if len(dl) or len(di):
                        log(
                            f"  {name}: {len(dl)} L diffs {dl[:8]}, "
                            f"{len(di)} I diffs {di[:8]}"
                        )
                print(json.dumps(
                    {"ok": False, "stage": "A", "pats": pats,
                     "corpus": cname}
                ))
                sys.exit(1)

    # ---- B. conformance corpus through the public API, fused forced ----
    cpath = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "conformance", "corpus.json",
    )
    with open(cpath) as f:
        cases = json.load(f)
    picked = [
        (i, c) for i, c in enumerate(cases) if i % max(1, subset) == 0
    ]
    log(f"B: {len(picked)}/{len(cases)} corpus cases, fused engine forced")
    cfg = Config(
        engine="dfa", schain_fused="on", block_size=8, use_ff=False,
        interpret=cpu,
    )
    bad = 0
    for i, c in picked:
        pats = [p.encode("latin-1") for p in c["patterns"]]
        txt = base64.b64decode(c["text_b64"])
        try:
            try:
                p = Pattern([pp.decode("latin-1") for pp in pats], cfg)
                s, e, pid = p.match_all_arrays(txt)
            except CompileError:
                # Tables exceed the fused kernel's static limits (Q/C) —
                # raised lazily at match time, not construction. The XLA
                # select-chain engine is the on-TPU path then.
                p = Pattern(
                    [pp.decode("latin-1") for pp in pats],
                    Config(engine="dfa", schain="on", block_size=8,
                           use_ff=False),
                )
                s, e, pid = p.match_all_arrays(txt)
            got = [[int(a), int(b), int(g)] for a, b, g in zip(s, e, pid)]
        except Exception as ex:  # noqa: BLE001 — report, keep scanning
            log(f"B case {i} {c['patterns']!r}: EXC {ex!r}")
            bad += 1
            continue
        want = c["match_all_ids"]
        if got != want:
            log(
                f"B case {i} {c['patterns']!r} ({c.get('note', '')}): "
                f"got {got[:6]}... want {want[:6]}..."
            )
            bad += 1
    if bad:
        print(json.dumps({"ok": False, "stage": "B", "bad": bad}))
        sys.exit(1)

    # ---- C. elementwise engines (classrun/classlit) on the chip --------
    # Every single-pattern corpus case these engines can express, forced
    # through them, vs the frozen expectations (they are XLA formulas,
    # not Mosaic, but this pins the on-device lowering too).
    from rejit_tpu.kernels import classlit as clk
    from rejit_tpu.kernels import classrun as crk

    cbad = ccnt = 0
    for i, c in enumerate(cases):
        if len(c["patterns"]) != 1:
            continue
        pat = c["patterns"][0]
        try:
            node = Pattern(pat).irs[0]
        except Exception:  # noqa: BLE001
            continue
        for eng, det in (("classrun", crk.detect), ("classlit", clk.detect)):
            if not det(node):
                continue
            ccnt += 1
            try:
                p = Pattern(pat, Config(engine=eng))
                s, e, pid = p.match_all_arrays(
                    base64.b64decode(c["text_b64"])
                )
                got = [[int(a), int(b), int(g)]
                       for a, b, g in zip(s, e, pid)]
            except Exception as ex:  # noqa: BLE001
                log(f"C case {i} {pat!r} [{eng}]: EXC {ex!r}")
                cbad += 1
                continue
            if got != c["match_all_ids"]:
                log(f"C case {i} {pat!r} [{eng}]: got {got[:6]}... "
                    f"want {c['match_all_ids'][:6]}...")
                cbad += 1
    log(f"C: {ccnt} classrun/classlit case-engine runs")
    if cbad:
        print(json.dumps({"ok": False, "stage": "C", "bad": cbad}))
        sys.exit(1)

    # ---- D. bitpacked spans program (round-4 headline) on the chip -----
    # literal_mask_packed_device + extract_rows_bitmask vs the L-array
    # formulation, both ON DEVICE, sparse + dense + multi-pid; and the
    # api bitmask branch vs bitmask="off".
    from rejit_tpu.engine import spans as spans_mod
    from rejit_tpu.kernels import literal as lk

    dbad = 0
    dense = np.frombuffer(
        (b"zq....vw" * 40000)[: 300_001], np.uint8
    ).copy()
    sparse = np.frombuffer(
        make_corpus(1 << 20, seed=0, needle=b"packet", density=0.002),
        np.uint8,
    )
    fold = np.frombuffer(
        make_corpus(1 << 20, seed=3, needle=b"PackEt", density=0.002),
        np.uint8,
    )
    for name, txt, pat in (
        ("sparse", sparse, "packet"),
        ("dense", dense, "zq|vw"),
        # class-literal branch ((?i)-folded): 2 bytes per position
        ("fold", fold, "(?i)packet"),
    ):
        pp = Pattern(pat)
        assert pp.engine == "literal" and pp.info.overlap_free, pat
        lits = pp.info.literals
        n = len(txt)
        W = max(len(l) for l in lits)
        ext = jnp.asarray(lk.extend_pad(txt, n, W))
        words = lk.literal_mask_packed_device(
            ext, jnp.int32(n), lits=lits, P=n, row_w=32
        )
        _, c1 = spans_mod.extract_rows_bitmask(words, row_w=32, row_cap=1)
        cap = 1
        while cap < int(jnp.max(c1)):
            cap *= 2
        pos, _c = spans_mod.extract_rows_bitmask(
            words, row_w=32, row_cap=cap
        )
        sp = np.asarray(pos).ravel()
        sp = sp[sp >= 0]
        L, _I = lk.literal_l_arrays_device(
            ext, jnp.int32(n), lits=lits, pids=tuple(range(len(lits))),
            P=n,
        )
        want = np.flatnonzero(np.asarray(L)[:n] >= 0)
        if not np.array_equal(sp, want):
            log(f"D[{name}]: bitmask {len(sp)} != Larray {len(want)}")
            dbad += 1
        a = pp.match_all_arrays(txt)
        b = Pattern(pat, Config(bitmask="off")).match_all_arrays(txt)
        if not all(np.array_equal(x, y) for x, y in zip(a, b)):
            log(f"D[{name}]: api bitmask branch != bitmask=off")
            dbad += 1
    log("D: bitpacked spans program checked (sparse + dense + fold)")
    if dbad:
        print(json.dumps({"ok": False, "stage": "D", "bad": dbad}))
        sys.exit(1)
    # ---- E. position-NFA bit-set engine (round 5) on the chip ----------
    # E1: bit-equality vs the DFA pipeline on a DFA-able pattern (full
    # corpus); E2: blowup-class patterns (DFA would explode) vs the
    # oracle on sampled boundaries of a 2 KB text — incl. an
    # assertion-bearing case (F=2 closure variants).
    from rejit_tpu import oracle as orc_mod
    from rejit_tpu.compile import posnfa as posnfa_mod
    from rejit_tpu.engine import nfaset

    ebad = 0
    tE = compile_patterns([rparser.parse(rb"\w+ing\b")])
    ctE = pipeline.device_tables(tE)
    ptE = posnfa_mod.compile_posnfa([rparser.parse(rb"\w+ing\b")])
    KE = 32
    nE = min(n, 1 << 20)
    PE = -(-nE // KE) * KE
    padE = np.zeros(PE, np.uint8)
    padE[:nE] = texts["dense"][:nE]
    padE_d = jax.device_put(jnp.asarray(padE))
    LE1, IE1 = jax.device_get(
        pipeline.l_arrays_device(ctE, padE_d, jnp.int32(nE), block=KE)
    )
    LE2, IE2 = jax.device_get(
        nfaset.l_arrays_device_nfaset(ptE, padE_d, jnp.int32(nE), block=KE)
    )
    if not (np.array_equal(LE1, LE2) and np.array_equal(IE1, IE2)):
        dl = np.nonzero(LE1 != LE2)[0]
        log(f"E1: posnfa != dfa pipeline, {len(dl)} L diffs {dl[:8]}")
        ebad += 1
    log(f"E1: posnfa == dfa pipeline on \\w+ing\\b ({nE} bytes)")
    for pat, alpha in (
        (rb"(a|b)*a(a|b){14}", b"ab"),
        (rb"\b(a|b)*a(a|b){10}\b", b"ab "),
    ):
        ptB = posnfa_mod.compile_posnfa([rparser.parse(pat)])
        rngE = np.random.default_rng(3)
        tb = rngE.choice(np.frombuffer(alpha, np.uint8), size=2048)
        nB = 2000
        LB, _IB = jax.device_get(
            nfaset.l_arrays_device_nfaset(
                ptB, jax.device_put(jnp.asarray(tb)), jnp.int32(nB),
                block=32,
            )
        )
        o = orc_mod.OraclePattern(pat)
        txt = tb[:nB].tobytes()
        for s in list(range(0, nB + 1, 97)) + [nB - 1, nB]:
            e, _pid = o.longest_end(txt, s)
            want = e if e is not None else -1
            if int(LB[s]) != want:
                log(f"E2 {pat!r} s={s}: got {int(LB[s])} want {want}")
                ebad += 1
        log(f"E2: posnfa vs oracle OK on {pat!r} (Q={ptB.Q}, F={ptB.F})")
    if ebad:
        print(json.dumps({"ok": False, "stage": "E", "bad": ebad}))
        sys.exit(1)

    print(json.dumps({
        "ok": True,
        "engine_patterns": len(ENGINE_PATTERNS),
        "conformance_cases": len(picked),
        "elementwise_cases": ccnt,
        "bitmask_cases": 6,
        "posnfa_cases": 3,
        "platform": dev.platform,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--subset", type=int, default=3,
                    help="run every Nth conformance case (default 3)")
    ap.add_argument("--size", type=float, default=1.0)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test the gate on the CPU backend")
    ap.add_argument("--rolled", action="store_true",
                    help="stage A uses the rolled (fori_loop) doubling "
                    "scan — the hardware validation of the large-Q form "
                    "(tests/kernels/test_rolled_scan_bit_equal covers the "
                    "algebra; this covers the Mosaic lowering)")
    args = ap.parse_args()
    if args.child:
        child(args.subset, args.size, cpu=args.cpu, rolled=args.rolled)
        return
    # Watchdog: the tunnel can hang for minutes (CLAUDE.md); compile-cache
    # makes the retry cheap.
    for k in range(3):
        try:
            out = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__), "--child",
                    "--subset", str(args.subset), "--size", str(args.size),
                ] + (["--cpu"] if args.cpu else [])
                  + (["--rolled"] if args.rolled else []),
                timeout=args.timeout,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        except subprocess.TimeoutExpired:
            log(f"attempt {k}: watchdog timeout, retrying")
            continue
        sys.exit(out.returncode)
    log("no attempt completed inside the watchdog")
    sys.exit(2)


if __name__ == "__main__":
    main()
