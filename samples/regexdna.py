#!/usr/bin/env python
"""regex-dna shootout benchmark on the rejit_tpu engine.

Capability parity with rejit:sample/regexdna.cc (SURVEY.md §2.1/C12): the
Computer Language Benchmarks Game "regex-dna" task — count DNA pattern
variants, then apply IUB-code substitutions and report sequence lengths.

Usage: python samples/regexdna.py [n_basepairs]   (generates its own FASTA)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# Honor JAX_PLATFORMS=cpu even where a sitecustomize force-prepends a TPU
# plugin (it merges rather than replaces the platform list).
import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")


def make_fasta(n: int, seed: int = 42) -> bytes:
    """Benchmarks-game-style FASTA: header lines + 60-col random ACGT with
    IUB ambiguity codes sprinkled in."""
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"acgtacgtacgtacgtacgtBDHKMNRSVWY", dtype=np.uint8)
    seq = rng.choice(alphabet, size=n)
    lines = [b">ONE Homo sapiens alu"]
    for i in range(0, n, 60):
        lines.append(seq[i : i + 60].tobytes())
    return b"\n".join(lines) + b"\n"


VARIANTS = [
    "agggtaaa|tttaccct",
    "[cgt]gggtaaa|tttaccc[acg]",
    "a[act]ggtaaa|tttacc[agt]t",
    "ag[act]gtaaa|tttac[agt]ct",
    "agg[act]taaa|ttta[agt]cct",
    "aggg[acg]aaa|ttt[cgt]ccct",
    "agggt[cgt]aa|tt[acg]accct",
    "agggta[cgt]a|t[acg]taccct",
    "agggtaa[cgt]|[acg]ttaccct",
]

IUB = [
    ("B", "(c|g|t)"), ("D", "(a|g|t)"), ("H", "(a|c|t)"), ("K", "(g|t)"),
    ("M", "(a|c)"), ("N", "(a|c|g|t)"), ("R", "(a|g)"), ("S", "(c|g)"),
    ("V", "(a|c|g)"), ("W", "(a|t)"), ("Y", "(c|t)"),
]


def main():
    from rejit_tpu import Pattern
    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    data = make_fasta(n)
    ilen = len(data)

    # Strip headers and newlines (the benchmark's first step).
    stripped = Pattern(r"(>[^\n]*\n)|\n").replace(data, b"")
    clen = len(stripped)

    t0 = time.time()
    # Stage the stripped sequence on device ONCE; all nine variant scans
    # reuse the staged tiles (rejit_tpu.stage — no per-pattern upload).
    from rejit_tpu import stage

    staged = stage(stripped)
    # ONE device program counts all nine variants: each (?i)-folded variant
    # is a class-literal set, so the per-pid packed candidate masks fuse
    # into a single pass over the text (match_all_count_each) — round 4's
    # nine sequential dispatches paid ~9x the tunnel RTT for the same
    # bytes. (The (?i) prefix does the case folding; an earlier revision
    # hand-wrapped letters in [cC] classes, which mangled classes inside
    # the variants and silently zeroed every count.)
    nine = Pattern(["(?i)" + pat for pat in VARIANTS])
    counts = nine.match_all_count_each(staged)
    for pat, cnt in zip(VARIANTS, counts):
        print(f"{pat} {cnt}")

    # All 11 IUB substitutions in ONE multi-pattern pass: the codes are
    # disjoint single-character classes and no replacement string contains
    # any code, so the 11 sequential Replace passes of the benchmark are
    # equivalent to one simultaneous replace_each (and the classes route
    # to the shifted-compare literal engine — no per-pattern DFA kernel
    # compile, no per-pass shape-bucket recompiles).
    iub_pat = Pattern([f"[{c}{c.lower()}]" for c, _ in IUB])
    seq = iub_pat.replace_each(stripped, [r.encode() for _, r in IUB])

    print()
    print(ilen)
    print(clen)
    print(len(seq))
    print(f"# {time.time() - t0:.2f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
