"""Benchmark history: append-only JSONL of every bench run + trend view.

SURVEY.md §5.5 (metrics/observability) calls for bench-history scalars so
perf regressions are visible across rounds, the analog of the reference's
benchmark plots over time (rejit:tools/benchmarks driver, unverified
recall — SURVEY.md §0). Every bench/harness.py and bench.py run appends
one line to bench/history.jsonl:

    {"ts": ..., "rev": "<git sha>", "backend": "tpu|cpu",
     "source": "harness:1,2,3", "results": {<name>: {"GBps": ...}, ...}}

`python -m bench.history` prints the latest value and delta-vs-previous
for every metric; `to_tensorboard()` exports the scalars to a
tensorboardX event file when that package is available.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Optional

DEFAULT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "history.jsonl")


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def record(results: dict, source: str, path: Optional[str] = None,
           backend: Optional[str] = None) -> None:
    """Append one run's results; never raises (history must not be able
    to fail a bench run)."""
    try:
        if backend is None:
            try:
                import jax

                backend = jax.default_backend()
            except Exception:
                backend = "unknown"
        line = json.dumps({
            "ts": time.time(),
            "rev": _git_rev(),
            "backend": backend,
            "source": source,
            "results": results,
        })
        with open(path or DEFAULT_PATH, "a") as f:
            f.write(line + "\n")
    except Exception as e:  # pragma: no cover
        print(f"bench history: not recorded ({e})", file=sys.stderr)


def load(path: Optional[str] = None) -> list:
    p = path or DEFAULT_PATH
    if not os.path.exists(p):
        return []
    out = []
    with open(p) as f:
        for ln in f:
            ln = ln.strip()
            if ln:
                out.append(json.loads(ln))
    return out


def _scalar(v):
    """The headline scalar of one result entry (GB/s preferred)."""
    if isinstance(v, dict):
        for k in ("GBps", "value", "seconds"):
            if k in v and isinstance(v[k], (int, float)):
                return float(v[k]), k
        return None, None
    if isinstance(v, (int, float)):
        return float(v), "value"
    return None, None


def trends(path: Optional[str] = None) -> dict:
    """{metric: [(ts, rev, scalar), ...]} across all recorded runs."""
    series: dict = {}
    for run in load(path):
        for name, v in run.get("results", {}).items():
            s, _unit = _scalar(v)
            if s is not None:
                series.setdefault(name, []).append(
                    (run["ts"], run["rev"], s)
                )
    return series


def summarize(path: Optional[str] = None, file=None) -> None:
    """Print latest value + delta vs the previous run per metric."""
    file = file or sys.stdout
    series = trends(path)
    if not series:
        print("no bench history recorded yet", file=file)
        return
    w = max(len(k) for k in series)
    for name in sorted(series):
        pts = series[name]
        _ts, rev, cur = pts[-1]
        if len(pts) > 1:
            prev = pts[-2][2]
            d = (cur / prev - 1) * 100 if prev else float("inf")
            delta = f"{d:+7.1f}% vs prev"
        else:
            delta = "  (first run)"
        print(f"{name:<{w}}  {cur:12.4f}  {delta}  [{rev}]", file=file)


def to_tensorboard(path: Optional[str] = None,
                   logdir: str = "bench/tb") -> bool:
    """Export the history as tensorboardX scalars (one tag per metric,
    step = run index). Returns False when tensorboardX is unavailable."""
    try:
        from tensorboardX import SummaryWriter
    except Exception:
        return False
    w = SummaryWriter(logdir)
    for name, pts in trends(path).items():
        for step, (ts, _rev, s) in enumerate(pts):
            w.add_scalar(name, s, global_step=step, walltime=ts)
    w.close()
    return True


if __name__ == "__main__":
    summarize(sys.argv[1] if len(sys.argv) > 1 else None)
