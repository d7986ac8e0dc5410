#!/usr/bin/env python
"""Probe: fused select-chain kernel throughput on the real chip (config 3).

Usage: python bench/fused_probe.py [--size MB] [--block K] [--chl CHL]
       [--pat PATTERN] [--skip-verify]
Prints per-call slope + GB/s via the chained-reps protocol (bench.py doc).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=float, default=10.0)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--chl", type=int, default=128)
    ap.add_argument("--pat", default=r"\b\w+ing\b")
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stage", default="full",
                    choices=["full", "kernel", "count"])
    ap.add_argument("--corpus", default="text", choices=["text", "sparse"],
                    help="sparse: punctuation-heavy corpus exercising the "
                         "chunk-skip fast path")
    ap.add_argument("--no-ff", action="store_true")
    ap.add_argument("--rolled", action="store_true",
                    help="fori_loop kernel form (large-Q compile path)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from bench.corpus import make_corpus
    from bench.harness import tchain
    from rejit_tpu.compile import parser as rparser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.engine import schain
    from rejit_tpu.kernels import schain_pallas as sp

    size = int(args.size * 1024 * 1024)
    if args.corpus == "sparse":
        # ~0.1% live-byte density at >32 KB stretches: silent filler with
        # occasional word islands (the log/grep workload shape).
        rng = np.random.default_rng(3)
        filler = rng.choice(
            np.frombuffer(b" .,;:!?#-", np.uint8), size=size
        ).astype(np.uint8)
        island = np.frombuffer(b" singing kings winging it ", np.uint8)
        for off in range(1 << 19, size - len(island), 1 << 20):
            filler[off:off + len(island)] = island
        text = filler
        n = size
    else:
        corpus = make_corpus(size, seed=2)
        n = len(corpus)
        text = np.frombuffer(corpus, dtype=np.uint8)

    t = compile_patterns([rparser.parse(args.pat.encode())])
    st = schain.static_tables(t)
    log(f"pattern {args.pat!r}: Q={t.n_states} C={t.n_classes}")

    K, CHL = args.block, args.chl
    grain = K * 8 * CHL
    P = -(-n // grain) * grain
    pad = np.zeros(P, dtype=np.uint8)
    pad[:n] = text
    text_dev = jax.device_put(jnp.asarray(pad))

    staged = jax.jit(
        lambda td: sp.stage_text(st, td, block=K, chl=CHL)
    )(text_dev)
    t0 = time.time()
    L, _ = sp.l_arrays_device_staged(
        st, t.n_patterns, staged, jnp.int32(n), block=K, chl=CHL,
        rolled=args.rolled,
    )
    got = int(jnp.sum(L >= 0))
    log(f"first call (incl. compile): {time.time()-t0:.1f}s; "
        f"candidates={got}")

    if not args.skip_verify:
        L2, I2 = schain.l_arrays_device_schain(
            st, text_dev, jnp.int32(n), block=K
        )
        L1, I1 = sp.l_arrays_device_schain_fused(
            st, t.n_patterns, text_dev, jnp.int32(n), block=K, chl=CHL,
            use_ff=not args.no_ff, rolled=args.rolled,
        )
        assert bool(jnp.array_equal(L1, L2)), "L mismatch on TPU"
        assert bool(jnp.array_equal(I1, I2)), "I mismatch on TPU"
        log("on-TPU bit-equality with XLA schain: OK")

    if args.stage == "count":
        staged_c = staged

        def step(nv):
            return sp.count_device_staged(
                st, t.n_patterns, staged_c, nv, block=K, chl=CHL,
                use_ff=not args.no_ff, rolled=args.rolled,
            )
    elif args.stage == "kernel":
        import functools

        @functools.partial(jax.jit, static_argnames=())
        def scan_only(nv):
            L_t, I_t, _, _ = sp.call_fused(
                st, t.n_patterns, text_dev, nv, block=K, chl=CHL,
                rolled=args.rolled,
            )
            r = L_t.max()
            if I_t is not None:
                r = r + I_t.max()
            return r

        step = scan_only
    else:
        def step(nv):
            L, I = sp.l_arrays_device_schain_fused(
                st, t.n_patterns, text_dev, nv, block=K, chl=CHL,
                use_ff=not args.no_ff, rolled=args.rolled,
            )
            return L.max() + I.max()  # both outputs live — nothing DCE'd
    per = tchain(step, n)
    log(f"stage={args.stage} K={K} CHL={CHL}: {per*1e3:.3f} ms / "
        f"{n/1e6:.0f} MB -> {n/per/1e9:.2f} GB/s")


if __name__ == "__main__":
    main()
