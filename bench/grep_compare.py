#!/usr/bin/env python
"""Engine-vs-engine: GNU grep vs jrep on an on-disk corpus (wall clock).

The reference's identity was engine-vs-engine benchmarks (rejit vs
RE2/PCRE/V8 — SURVEY.md §2.1/C11). RE2/PCRE are unreachable offline;
GNU grep is on this box and is the natural judge for the config-1/2
pattern classes (fixed strings, simple alternations). Both sides are
measured END-TO-END as a user would run them: cold process, read the
file, print counts — so jrep pays Python+jax startup, the host->device
copy AND the tunnel's per-dispatch RTT on top of the scan itself
(CLAUDE.md: single-dispatch wall times measure the tunnel in bad
windows; the per-call device rates are in bench/results_*.json). Wall
clock is still the honest comparison for a CLI.

Usage: python bench/grep_compare.py [--size-mb 128] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench.corpus import make_lines_corpus  # noqa: E402

PATTERNS = [
    # (label, grep args-mode, pattern-for-grep, pattern-for-jrep)
    ("config1_fixed_packet", "-F", "packet", "packet"),
    ("config2_alt_foo|bar|baz", "-E", "foo|bar|baz", "foo|bar|baz"),
    ("config2_class_[a-z]+ing", "-E", "[a-z]+ing", "[a-z]+ing"),
]


def wall(cmd, env=None, timeout=600):
    """One timed run, or (None, None) on a tunnel-hang timeout (the
    shared TPU frontend hangs for minutes at a time — CLAUDE.md; a hung
    window is a missed measurement, not a result)."""
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, env=env, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return None, None
    dt = time.perf_counter() - t0
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=128)
    ap.add_argument("--json", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = f"/tmp/grep_corpus_{args.size_mb}mb.bin"
    if not os.path.exists(path):
        print(f"building {args.size_mb} MB corpus at {path}...",
              file=sys.stderr, flush=True)
        with open(path, "wb") as f:
            for k in range(args.size_mb // 16):
                # 60-col lines ("packet" occurs naturally in the word mix;
                # grep gets normal line lengths, not one 128 MB line).
                f.write(make_lines_corpus(16 << 20, seed=k))
    size = os.path.getsize(path)

    rows = []
    for label, mode, gpat, jpat in PATTERNS:
        # grep -c counts LINES; jrep --count-matches counts matches.
        # Compare like with like: grep -o | wc -l counts matches.
        g_best = cnt_g = None
        for _ in range(args.runs):
            dt, out = wall(["grep", mode, "-o", gpat, path])
            if dt is None:
                continue
            cnt_g = out.stdout.count("\n")
            g_best = dt if g_best is None else min(g_best, dt)
        j_best = cnt_j = None
        attempts = 0
        while attempts < args.runs + 3 and (
            j_best is None or attempts < args.runs
        ):
            attempts += 1
            dt, out = wall(
                [sys.executable, os.path.join(repo, "tools", "jrep.py"),
                 "--count-matches", jpat, path],
            )
            if dt is None:
                print(f"{label}: jrep run hung (tunnel window), retrying",
                      file=sys.stderr, flush=True)
                continue
            if out.returncode not in (0, 1):
                print(out.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"jrep failed on {label}")
            cnt_j = int(out.stdout.strip())
            j_best = dt if j_best is None else min(j_best, dt)
        assert j_best is not None and g_best is not None, label
        assert cnt_g == cnt_j, (label, cnt_g, cnt_j)
        row = {
            "label": label,
            "pattern": gpat,
            "corpus_bytes": size,
            "matches": cnt_j,
            "grep_o_wall_s": g_best,
            "grep_GBps": size / g_best / 1e9,
            "jrep_count_wall_s": j_best,
            "jrep_GBps": size / j_best / 1e9,
            "note": (
                "cold-process wall clock; jrep side includes Python+jax "
                "startup, host->device copy and tunnel RTT (see module "
                "docstring) — device-rate rows live in results_*.json"
            ),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {"corpus_bytes": size, "rows": rows,
                 "grep_version": subprocess.run(
                     ["grep", "--version"], capture_output=True, text=True
                 ).stdout.splitlines()[0]},
                f, indent=1,
            )


if __name__ == "__main__":
    main()
