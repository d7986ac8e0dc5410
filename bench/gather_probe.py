#!/usr/bin/env python
"""Probe: in-VMEM dynamic_gather throughput inside a Mosaic kernel.

Settles the "stage 3" open question in bench/NOTES.md ("Large-Q"): would a
lane-axis state layout with tpu.dynamic_gather combines beat the packed
select-chain for Q in (64, 128]?  The round-1 number (~1e8 gathered
elem/s) was measured THROUGH the XLA gather pipeline (HBM round-trips per
step); this probe measures the raw in-register/in-VMEM op rate the way the
fused kernel would use it:

  serial mode  : y <- take_along_axis(T, y) chained ITERS times inside one
                 kernel, U independent chains to hide latency. One gather
                 op = one (8,128) vreg gathered along lanes (the Mosaic
                 same-shape/<=128-lane form, as in kernels/dfa_pallas.py).
  select mode  : the same dependence chain built from QS compare+selects
                 per iter (the packed select-chain inner loop's shape) for
                 an apples-to-apples op-rate comparison on the same probe.

Decision rule (NOTES "Still open"), worked at Q=128, CHL=128: per byte
the select form spends ~Q*ceil(Q/8) = 2048 vreg-row ops on 1024 blocks
while the gather form spends ceil(1024/8) = 128 gathers, i.e. 16 gathers
per 128 blocks vs 2048 select-rows — gather wins iff one gather costs
less than 2048/16 = 128 select-rows, i.e. rate(gather)/rate(select-row)
> 16/(Q*ceil(Q/8)) at CHL=128. The full byte-step additionally carries a
ceil(C*Q/128) class factor (bench/NOTES.md byte-step arithmetic). Both
rates must come from the SAME regime (serially-dependent, as this probe
measures) — see NOTES "regime assumption".

Usage: python bench/gather_probe.py [--iters N] [--u U] [--mode serial|select]
       [--qs QS] [--cpu]
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
    ap.add_argument("--iters", type=int, default=4096)
    ap.add_argument("--u", type=int, default=8, help="independent chains")
    ap.add_argument("--mode", default="serial", choices=["serial", "select"])
    ap.add_argument("--qs", type=int, default=32,
                    help="selects per iter in select mode")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from bench.harness import tchain

    U, ITERS, QS = args.u, args.iters, args.qs
    interpret = args.cpu

    def kernel(n_ref, t_ref, y_ref, o_ref):
        t = t_ref[...]                               # (8,128) int32 perm rows
        n = n_ref[0]
        ys = tuple(
            jnp.clip(y_ref[8 * i:8 * (i + 1), :] + (n & 1), 0, 127)
            for i in range(U)
        )
        if args.mode == "serial":
            def body(_, ys):
                return tuple(jnp.take_along_axis(t, y, axis=-1) for y in ys)
        else:
            consts = [jnp.full((8, 128), (7 * q + 3) % 128, jnp.int32)
                      for q in range(QS)]

            def body(_, ys):
                out = []
                for y in ys:
                    for q in range(QS):
                        y = jnp.where(y == q, consts[q], y)
                    out.append(y)
                return tuple(out)
        ys = jax.lax.fori_loop(0, ITERS, body, ys)
        acc = ys[0]
        for y in ys[1:]:
            acc = acc ^ y
        o_ref[...] = acc

    t_host = np.stack(
        [np.random.RandomState(7 + r).permutation(128).astype(np.int32)
         for r in range(8)]
    )
    y_host = np.random.RandomState(3).randint(
        0, 128, size=(8 * U, 128)).astype(np.int32)
    t_dev = jnp.asarray(t_host)
    y_dev = jnp.asarray(y_host)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=interpret,
    )

    def step(nv):
        return call(nv.reshape(1), t_dev, y_dev)[0, 0]

    a = time.perf_counter()
    v = int(jax.jit(step)(jnp.int32(0)))
    log(f"compile+first: {time.perf_counter()-a:.1f}s  out[0,0]={v}")

    sec = tchain(step, 0)
    ops = U * ITERS                      # vreg ops (gathers or QS-select sets)
    if args.mode == "serial":
        log(f"per-call {sec*1e6:.1f} us  | {ops/sec/1e9:.3f} G gathers/s "
            f"| {ops*1024/sec/1e9:.2f} G gathered-elem/s")
    else:
        log(f"per-call {sec*1e6:.1f} us  | {ops*QS/sec/1e9:.3f} G select-rows/s "
            f"| {ops*QS*1024/sec/1e9:.2f} G selected-elem/s")
    # JSON: vreg_ops_per_sec is mode-correct (select mode counts the QS
    # selects per iteration, matching the stderr log) and records qs so
    # modes can be compared (ADVICE r2).
    mode_ops = ops * (QS if args.mode == "select" else 1)
    print(f'{{"mode": "{args.mode}", "u": {U}, "iters": {ITERS}, '
          f'"qs": {QS if args.mode == "select" else 0}, '
          f'"sec_per_call": {sec}, "vreg_ops_per_sec": {mode_ops/sec}}}')


if __name__ == "__main__":
    main()
