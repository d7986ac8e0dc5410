#!/usr/bin/env python
"""Measure the rolled fused kernel's cold Mosaic compile wall vs Q.

One (pattern, geometry, variant) per invocation — the tunnel's compile
service can hang, and a fresh process isolates failures. The pattern's
char class is parameterizable so each measurement gets a FRESH compile
cache key (the kernel is specialized to table values).

Usage:
  python tools/compile_knee.py --lo 24 --hi 48 [--klass b-y]
      [--chl 128] [--block 128] [--count-only] [--time-tput]

Prints one JSON line: {Q, compile_s, tput_GBps?}.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, required=True)
    ap.add_argument("--hi", type=int, required=True)
    ap.add_argument("--klass", default="a-z")
    ap.add_argument("--chl", type=int, default=128)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--count-only", action="store_true")
    ap.add_argument("--time-tput", action="store_true")
    args = ap.parse_args()

    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from rejit_tpu import Pattern, Config
    from rejit_tpu.engine import schain as se
    from rejit_tpu.kernels import schain_pallas as sp

    pat = rf"\b[{args.klass}]{{{args.lo},{args.hi}}}\b"
    p = Pattern(pat, Config(engine="dfa"))
    st = se.static_tables(p.tables)
    Q = p.tables.n_states
    K, CHL = args.block, args.chl
    grain = K * 8 * CHL
    n = max(grain, min(10 << 20, sp.max_p(Q) // 2 // grain * grain))
    text = np.frombuffer(
        (b"hello matching wordswordswords " * (n // 31 + 1))[:n], np.uint8
    ).copy()
    td = jax.device_put(jnp.asarray(text))
    staged = jax.jit(
        lambda t: sp.stage_text(st, t, block=K, chl=CHL)
    )(td)

    print(f"Q={Q} pat={pat} K={K} CHL={CHL} "
          f"count_only={args.count_only}; compiling...",
          file=sys.stderr, flush=True)
    t0 = time.time()
    if args.count_only:
        out = sp.count_device_staged(
            st, p.tables.n_patterns, staged, jnp.int32(n),
            block=K, chl=CHL, rolled=True,
        )
        _ = int(out)
    else:
        L, I = sp.l_arrays_device_staged(
            st, p.tables.n_patterns, staged, jnp.int32(n),
            block=K, chl=CHL, rolled=True,
        )
        _ = int(jnp.sum(L[:8].astype(jnp.int32)))
    compile_s = time.time() - t0
    rec = {"Q": Q, "pat": pat, "K": K, "CHL": CHL,
           "count_only": bool(args.count_only), "compile_s": compile_s}
    print(f"compile+first-run: {compile_s:.1f}s", file=sys.stderr, flush=True)

    if args.time_tput:
        sys.path.insert(0, "/root/repo/bench")
        from bench.harness import tchain

        def step(nv):
            L, _ = sp.l_arrays_device_staged(
                st, p.tables.n_patterns, staged, nv, block=K, chl=CHL,
                rolled=True,
            )
            return jnp.sum(L[:8].astype(jnp.int32))

        t = tchain(step, n)
        rec["tput_GBps"] = n / t / 1e9
        print(f"tput: {rec['tput_GBps']:.2f} GB/s", file=sys.stderr)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
