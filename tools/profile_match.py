#!/usr/bin/env python
"""Capture a jax.profiler trace of a match run (SURVEY.md §5.1).

Usage: python tools/profile_match.py PATTERN [--size MB] [--out DIR]
View with tensorboard --logdir DIR (tensorboard-plugin-profile).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern")
    ap.add_argument("--size", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/rejit_tpu_trace")
    ap.add_argument("--engine", default=None)
    args = ap.parse_args()

    import jax

    from bench.corpus import make_corpus
    from rejit_tpu import Config, Pattern
    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config.from_env(engine=args.engine) if args.engine else Config.from_env()
    p = Pattern(args.pattern, cfg)
    text = np.frombuffer(
        make_corpus(int(args.size * 1024 * 1024), seed=0), dtype=np.uint8
    )
    p.match_all_arrays(text)  # warm up / compile outside the trace

    with jax.profiler.trace(args.out):
        for _ in range(3):
            p.match_all_arrays(text)
    print(f"trace written to {args.out}; stats: {p.last_stats.as_dict()}")


if __name__ == "__main__":
    main()
