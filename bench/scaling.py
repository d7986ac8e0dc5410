#!/usr/bin/env python
"""Scaling-efficiency measurement (BASELINE.md protocol).

efficiency(D) = bytes/s at D shards / (D * bytes/s at 1 shard).

On this rig only ONE real TPU chip is reachable, so hardware multi-chip
efficiency cannot be measured yet; this harness (a) runs the sharded engine
at D=1 on the TPU to quantify sharding overhead vs the single-device path,
and (b) runs D=1..8 on the virtual CPU mesh to validate the measurement
wiring and the collective path (numbers there reflect host cores, not ICI).
When more chips/hosts appear (relay ports, SURVEY.md §2.4), the same script
measures real efficiency unchanged.

Usage: python bench/scaling.py [--size MB] [--cpu]
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


def tmed(fn, iters=5, rounds=2):
    r = fn()
    jax_block(r)
    best = None
    for _ in range(rounds):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax_block(fn())
            ts.append(time.perf_counter() - t0)
        m = statistics.median(ts)
        best = m if best is None else min(best, m)
    return best


def jax_block(r):
    try:
        r.block_until_ready()
    except AttributeError:
        for x in r:
            x.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=float, default=4.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec

    from bench.corpus import make_corpus
    from rejit_tpu.compile import parser as rparser
    from rejit_tpu.compile.dfa import compile_patterns
    from rejit_tpu.dist.mesh import make_mesh
    from rejit_tpu.dist.sharded import sharded_l_arrays_device_fused
    from rejit_tpu.engine import schain
    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()

    size = int(args.size * 1024 * 1024)
    corpus = make_corpus(size, seed=4, needle=b"singing", density=0.005)
    n = len(corpus)
    text = np.frombuffer(corpus, dtype=np.uint8)
    t = compile_patterns([rparser.parse(rb"\b\w+ing\b")])
    st = schain.static_tables(t)
    # Production engine per shard (fused kernel + exact splice); small
    # geometry on the CPU mesh so interpret stays cheap.
    if args.cpu:
        block, chl, interp = 8, 8, True
    else:
        block, chl, interp = 128, 128, False

    devices = jax.devices()
    results = {}
    base = None
    counts = [d for d in (1, 2, 4, 8) if d <= len(devices)]
    for D in counts:
        mesh = make_mesh(devices[:D])
        chunk = D * block * 8 * chl
        P = ((n + 1 + chunk - 1) // chunk) * chunk
        pad = np.zeros(P, dtype=np.uint8)
        pad[:n] = text
        td = jax.device_put(
            jax.numpy.asarray(pad), NamedSharding(mesh, PartitionSpec("data"))
        )
        nd = jax.numpy.int32(n)
        fn = lambda: sharded_l_arrays_device_fused(
            st, t.n_patterns, td, nd, mesh=mesh, block=block, chl=chl,
            num_shards=D, interpret=interp,
        )
        dt = tmed(fn)
        bps = n / dt
        if base is None:
            base = bps
        eff = bps / (D * base)
        results[f"D{D}"] = {"seconds": dt, "GBps": bps / 1e9, "efficiency": eff}
        print(
            f"D={D}: {dt*1e3:.2f} ms -> {bps/1e9:.2f} GB/s, "
            f"efficiency {eff:.2%}",
            file=sys.stderr,
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
