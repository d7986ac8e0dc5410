#!/usr/bin/env python
"""Profile the dense-match end-to-end path (round-3 task: the committed
config4 e2e was 0.001 GB/s vs its kernel's 23.6 — find where the time goes).

Measures, on the real chip:
  1. raw device->host and host->device transfer bandwidth vs buffer size
     (the tunnel's per-dispatch RTT oscillates 40us-70ms; transfers cannot
     be chain-timed, so each size reports every rep and the min),
  2. a component breakdown of Pattern.match_all_arrays on the config-4
     tokenizer (kernel / count readback / L+I transfer / host select).

Usage: python bench/e2e_probe.py [--mb 1] [--reps 5]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sizes", default="1,4,16,64")
    args = ap.parse_args()

    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), file=sys.stderr)
    out = {}

    # -- 1. raw transfer bandwidth ---------------------------------------
    for mb in [int(s) for s in args.sizes.split(",")]:
        nb = mb << 20
        host = np.random.randint(0, 255, nb, dtype=np.uint8)
        dev = jax.device_put(jnp.asarray(host))
        _ = int(jnp.sum(dev[:8].astype(jnp.int32)))  # materialize
        d2h, h2d = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            got = np.asarray(dev)
            d2h.append(time.perf_counter() - t0)
            assert got[0] == host[0]
            t0 = time.perf_counter()
            d2 = jax.device_put(jnp.asarray(host))
            _ = int(jnp.sum(d2[:8].astype(jnp.int32)))  # force + readback
            h2d.append(time.perf_counter() - t0)
        out[f"d2h_{mb}mb"] = {
            "reps_s": d2h,
            "min_GBps": nb / min(d2h) / 1e9,
        }
        out[f"h2d_{mb}mb"] = {
            "reps_s": h2d,
            "min_GBps": nb / min(h2d) / 1e9,
        }
        print(
            f"{mb:3d} MB  d2h {nb/min(d2h)/1e9:8.3f} GB/s  "
            f"h2d {nb/min(h2d)/1e9:8.3f} GB/s   "
            f"(d2h reps {['%.1fms' % (t*1e3) for t in d2h]})",
            file=sys.stderr,
        )

    # -- 2. config4 e2e breakdown ----------------------------------------
    from rejit_tpu import Pattern
    from rejit_tpu.engine import spans as spans_mod
    from bench.corpus import make_corpus

    n = args.mb << 20
    text = np.frombuffer(make_corpus(n, seed=3), dtype=np.uint8)
    p = Pattern([r"\w+", r"\s+", r"[^\w\s]+"])
    p.match_all_arrays(text)  # warm/compile

    steps = {}
    for _ in range(args.reps):
        t0 = time.perf_counter()
        L, I = p._l_i_device(text)
        c = int(spans_mod.candidate_count(L))
        t1 = time.perf_counter()
        Lh = np.asarray(L)
        t2 = time.perf_counter()
        Ih = np.asarray(I)
        t3 = time.perf_counter()
        pos = np.flatnonzero(Lh >= 0).astype(np.int32)
        end, pid = Lh[pos], Ih[pos]
        t4 = time.perf_counter()
        from rejit_tpu.engine import select

        s_, e_, p_ = select.match_all_candidates(pos, end, pid)
        t5 = time.perf_counter()
        for k, v in [
            ("kernel+count_readback", t1 - t0),
            ("L_transfer", t2 - t1),
            ("I_transfer", t3 - t2),
            ("host_flatnonzero", t4 - t3),
            ("host_greedy", t5 - t4),
            ("total", t5 - t0),
        ]:
            steps.setdefault(k, []).append(v)
    out["config4_breakdown_s"] = {k: v for k, v in steps.items()}
    out["config4_n_bytes"] = n
    out["config4_n_matches"] = int(len(s_))
    for k, v in steps.items():
        print(f"{k:22s} min {min(v)*1e3:8.2f} ms  reps "
              f"{['%.1f' % (t*1e3) for t in v]}", file=sys.stderr)
    e2e = min(steps["total"])
    print(f"e2e min: {e2e*1e3:.1f} ms -> {n/e2e/1e9:.4f} GB/s",
          file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
