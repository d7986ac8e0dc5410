#!/usr/bin/env python
"""Headline benchmark: config 1 — literal MatchAll over ~10 MB ASCII corpus.

The headline is the SPAN-PRODUCING MatchAll: the full device program
L/I arrays -> candidate compaction -> non-overlap selection -> compacted
(starts, ends, pids) reduced to a checksum so nothing is dead-code
-eliminated; span parity vs the host path is asserted before timing.
The easier MatchAllCount reduction is reported alongside as "count_value".

Materialization delta: reducing each rep's span array to a checksum keeps
every element live but lets XLA fuse the reduction, so the ~5 MB (R, cap)
array a real caller receives need not be written to HBM (~6.4 us at
819 GB/s on 10 MB => the fused-checksum rate overstates the delivered-array
rate by up to ~20% at 400 GB/s). "materialized_value" times a variant that
carries the full span array through the scan (the loop-carry buffer forces
the HBM write every rep) — that is the rate for a caller that takes
delivery of the array.

Prints ONE JSON line:
  {"metric": ..., "value": bytes/s/chip, "unit": "bytes/s", "vs_baseline": r}
vs_baseline is the ratio against the BASELINE.json target of 10 GB/s/chip
(BASELINE.md; the reference repo shipped no published numbers).

Protocol (BASELINE.md): corpus staged on device (the deployment model is a
device-resident sharded corpus), steady state after JIT warm-up.

Timing method — CHAINED REPS: the shared tunnel in front of the chip adds a
per-dispatch round-trip latency that oscillates ~40us..70ms on a minutes
scale, so any single-call wall time measures the tunnel, not the kernel.
Instead we jit a lax.scan chaining R dependent executions of the count
(carry feeds the next call non-foldably, so XLA cannot hoist the body) and
take the SLOPE between two rep counts: per_call = (t(R2)-t(R1))/(R2-R1).
Verified linear: 1024/4096/16384 reps of the 10MB count gave 50/110/342 ms
through a degraded window -> 19us/call, while single calls read 30-70 ms.
Correctness is asserted against an independent host count before timing;
several rounds with watchdog + retries, best round kept. The full config
matrix lives in bench/harness.py.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET = 10e9  # BASELINE.json:5 — >=10 GB/s/chip MatchAll
SIZE = 10 * 1024 * 1024
NEEDLE = b"packet"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_child() -> dict:
    """Runs in the child: stage corpus, verify, time. Prints JSON."""
    import functools

    import numpy as np

    from bench.corpus import make_corpus
    from rejit_tpu import Pattern
    from rejit_tpu.kernels import literal as lk

    import jax

    from rejit_tpu.runtime.init import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    corpus = make_corpus(SIZE, seed=0, needle=NEEDLE, density=0.002)
    n = len(corpus)
    P = n
    text = np.frombuffer(corpus, dtype=np.uint8)
    p = Pattern(NEEDLE.decode())
    assert p.engine == "literal" and p.info.overlap_free

    ext = jax.device_put(jnp.asarray(lk.extend_pad(text, P, len(NEEDLE))))

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(nv, reps):
        # (c & 1) is 0 in practice but not foldable at compile time, so the
        # scan body genuinely depends on the carry and XLA executes all
        # `reps` sequential counts on device.
        def body(c, _):
            c = lk.literal_count_device(
                ext, nv + (c & 1), lits=p.info.literals, P=P
            )
            return c, None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=reps)
        return c

    n_dev = jnp.int32(n)
    t0 = time.time()
    got = int(chain(n_dev, reps=1))  # compile + first run
    log(f"first call (incl. compile): {time.time() - t0:.2f}s")
    expected = corpus.count(NEEDLE)  # borderless => greedy == all == count
    assert got == expected, (got, expected)
    log(f"matches: {got} (verified)")

    def slope(chain_fn, check, rounds_out=None):
        def timed(reps, k=3):
            ts = []
            for _ in range(k):
                a = time.perf_counter()
                r = int(chain_fn(reps=reps))
                ts.append(time.perf_counter() - a)
                check(r)
            return min(ts)

        # Adaptive rep sizing: double until one program takes ~0.5 s —
        # the tunneled worker kills programs that run for more than a
        # few seconds, which a fixed large R hits when the body is
        # slower than estimated. Each shape is compiled by a throwaway
        # call so compile time never inflates the sizing measurement.
        def t_once(reps):
            int(chain_fn(reps=reps))             # compile / warm
            a = time.perf_counter()
            int(chain_fn(reps=reps))
            return time.perf_counter() - a

        R, tR = 16, t_once(16)
        while R < 4096 and tR < 0.5:
            R *= 2
            tR = t_once(R)
        R1, R2 = max(4, R // 4), R
        if R1 == R2:
            R1 = R2 // 4
        int(chain_fn(reps=R1))                   # compile R1's shape
        best = None
        for rnd in range(3):
            t1 = timed(R1)
            t2 = timed(R2)
            per_call = (t2 - t1) / (R2 - R1)
            amortized = t2 / R2  # upper bound on per-call incl. RTT share
            # Slope can go <=0 (or collapse toward zero when RTT dominates
            # both endpoints) from tunnel noise; the amortized time is
            # then the honest (conservative) answer.
            eff = (
                per_call
                if per_call > 0 and (t2 - t1) >= 0.2 * t2
                else amortized
            )
            log(
                f"  round {rnd}: t({R1})={t1*1e3:.1f}ms t({R2})={t2*1e3:.1f}ms "
                f"slope={per_call*1e6:.1f}us amort={amortized*1e6:.1f}us"
            )
            if rounds_out is not None:
                # Raw per-window evidence (VERDICT r2 weak #8): keep every
                # round's endpoints, not just the best, so a regression is
                # distinguishable from a degraded tunnel window.
                rounds_out.append(
                    {"R1": R1, "R2": R2, "t1_s": t1, "t2_s": t2,
                     "slope_s": per_call, "amortized_s": amortized}
                )
            best = eff if best is None else min(best, eff)
        return best

    log("count MatchAll (secondary):")
    raw_rounds = {"count": [], "spans": []}
    best_count = slope(
        lambda reps: chain(n_dev, reps=reps),
        lambda r: None if r == expected else (_ for _ in ()).throw(
            AssertionError((r, expected))
        ),
        rounds_out=raw_rounds["count"],
    )
    count_bps = n / best_count

    # ---- headline: SPAN-PRODUCING MatchAll, all on device ----------------
    # The spans program is bit-PACKED candidate-mask production
    # (kernels/literal.literal_mask_packed_device — XLA fuses the shifted
    # compares into the pack reduction, the bool mask is never
    # materialized) + the popcount peel (engine/spans.extract_rows_bitmask).
    # For a fixed-width overlap-free literal the mask is the complete
    # match description (end = start + width); packing shrinks the peel's
    # root operand 32x, so all peel rounds together cost less HBM traffic
    # than one pass over the text. ROW_W=32 makes each row exactly one
    # word — the peel is pure elementwise bit math, no cross-word min
    # (and cap scales down with the row: 4 here vs 8 at ROW_W=256).
    # Measured ladder on this corpus (bench/NOTES.md round 4):
    # packed-(L,I) peel 12.2 GB/s -> bool-mask peel 35.8 -> bitpacked
    # rows-of-8-words 119 -> one-word rows 175; count-only roofline ~560.
    from rejit_tpu.engine import spans as spans_mod

    ROW_W = 32
    W = len(NEEDLE)
    assert p.info.overlap_free and p.info.min_len == p.info.max_len == W

    def mask_fn(nv):
        return lk.literal_mask_packed_device(
            ext, nv, lits=p.info.literals, P=P, row_w=ROW_W
        )

    words0 = mask_fn(n_dev)
    _, cnt0 = spans_mod.extract_rows_bitmask(words0, row_w=ROW_W, row_cap=1)
    mx = int(jnp.max(cnt0))
    cap = 2
    while cap < mx:
        cap *= 2
    s_d, cnts = spans_mod.extract_rows_bitmask(
        words0, row_w=ROW_W, row_cap=cap
    )
    # Span parity vs the host path BEFORE timing (VERDICT r1 #2).
    hs, he, hp = p.match_all_arrays(text)
    sp_ = np.asarray(s_d).ravel()
    keep = sp_ >= 0
    k = int(keep.sum())
    assert k == len(hs) == expected, (k, len(hs), expected)
    assert np.array_equal(sp_[keep], hs)
    assert np.array_equal(sp_[keep] + W, he)
    assert np.array_equal(np.zeros(k, dtype=hp.dtype), hp)
    log(f"device spans == host spans == {k} matches (verified)")

    @functools.partial(jax.jit, static_argnames=("reps",))
    def span_chain(nv, exp_ck, reps):
        def body(c, _):
            # (c - expected_checksum) & 1 == 0 every iteration, but XLA
            # cannot fold it, so the scan body depends on the carry and
            # every rep executes the full spans-out program.
            m = mask_fn(nv + ((c - exp_ck) & 1))
            s, kk = spans_mod.extract_rows_bitmask(
                m, row_w=ROW_W, row_cap=cap
            )
            # DCE guard: two flat reductions over the full outputs
            # (positions incl. -1 empties, exact counts). The previous
            # where/valid form added four more full-array passes and
            # cost 34 of the 60 us/rep — it measured the checksum, not
            # the program (bench/NOTES.md round 4; ends are start+W by
            # construction, asserted in the parity block above).
            ck = jnp.sum(s, dtype=jnp.int32) + jnp.sum(kk, dtype=jnp.int32)
            return ck, None
        ck, _ = jax.lax.scan(body, exp_ck, None, length=reps)
        return ck

    # Same int32 wraparound arithmetic as the device checksum.
    raw = (
        int(np.sum(np.asarray(s_d), dtype=np.int64))
        + int(np.sum(np.asarray(cnts), dtype=np.int64))
    ) & 0xFFFFFFFF
    exp_int = raw - (1 << 32) if raw >= (1 << 31) else raw
    exp_ck = jnp.int32(exp_int)
    log("spans-out MatchAll (HEADLINE):")
    best_spans = slope(
        lambda reps: span_chain(n_dev, exp_ck, reps=reps),
        lambda r: None if r == exp_int else (_ for _ in ()).throw(
            AssertionError((r, exp_int))
        ),
        rounds_out=raw_rounds["spans"],
    )
    bps = n / best_spans

    # ---- materialized variant (VERDICT r4 weak #2) -----------------------
    # The headline scan reduces each rep's span array to a checksum carry;
    # every output element is consumed (nothing is DCE'd) but XLA may fuse
    # the reduction so the (R, cap) array a real caller RECEIVES is never
    # written to HBM (~5 MB => ~6.4 us at 819 GB/s). This variant carries
    # the FULL span array through the scan — the loop carry buffer forces
    # the HBM write every rep — so its rate is what a caller that takes
    # delivery of the array sees.
    sfirst = jnp.int32(int(np.asarray(s_d).ravel()[0]))

    @functools.partial(jax.jit, static_argnames=("reps",))
    def span_chain_mat(nv, exp_ck, s0, reps):
        def body(carry, _):
            s_prev, c = carry
            # Both terms are 0 every iteration but depend on the carry
            # (the checksum AND the materialized array), so no rep can be
            # elided and s_prev must exist as a real buffer.
            dep = ((c - exp_ck) & 1) + ((s_prev[0, 0] - sfirst) & 1)
            m = mask_fn(nv + dep)
            s, kk = spans_mod.extract_rows_bitmask(
                m, row_w=ROW_W, row_cap=cap
            )
            ck = jnp.sum(s, dtype=jnp.int32) + jnp.sum(kk, dtype=jnp.int32)
            return (s, ck), None
        (s, ck), _ = jax.lax.scan(body, (s0, exp_ck), None, length=reps)
        return ck + 0 * s[0, 0]

    raw_rounds["spans_materialized"] = []
    log("spans-out MatchAll, span array materialized per rep:")
    s0 = jnp.asarray(s_d)
    best_mat = slope(
        lambda reps: span_chain_mat(n_dev, exp_ck, s0, reps=reps),
        lambda r: None if r == exp_int else (_ for _ in ()).throw(
            AssertionError((r, exp_int))
        ),
        rounds_out=raw_rounds["spans_materialized"],
    )
    mat_bps = n / best_mat
    log(
        f"headline spans-out: {best_spans*1e6:.1f} us/10MB -> "
        f"{bps/1e9:.1f} GB/s; materialized {mat_bps/1e9:.1f} GB/s; "
        f"count path {count_bps/1e9:.1f} GB/s"
    )
    # Degraded-window gate: >10 ms of DEVICE time per 10 MB is not
    # TPU-class; signal the parent to retry in a later window.
    slow_mode = best_spans > 0.01

    print(
        json.dumps(
            {
                "metric": (
                    "MatchAll spans-out bytes/sec/chip "
                    "(literal, 10MB conformance corpus)"
                ),
                "value": bps,
                "unit": "bytes/s",
                "vs_baseline": bps / TARGET,
                "count_value": count_bps,
                "materialized_value": mat_bps,
                "n_matches": k,
                "raw_rounds": raw_rounds,
            }
        )
    )
    if slow_mode:
        sys.exit(3)
    return {}


def _record_history(json_line: str) -> None:
    """Append the headline to bench/history.jsonl (§5.5 bench scalars)."""
    try:
        from bench import history

        d = json.loads(json_line)
        history.record(
            {"headline_spans_out": d,
             "headline_count": {"value": d.get("count_value", 0.0)}},
            source="bench.py", backend="tpu",
        )
    except Exception as e:
        log(f"bench history: not recorded ({e})")


def main():
    if "--child" in sys.argv:
        measure_child()
        return

    # Watchdog + retry orchestration: the axon tunnel can stall for minutes
    # and degrades to a ~1000x-slower mode in windows; retry for a fast
    # window, keeping the best degraded number as a fallback.
    attempts = 8
    fallback = None
    for k in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                timeout=420,
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
        except subprocess.TimeoutExpired:
            log(f"attempt {k}: watchdog timeout, retrying")
            time.sleep(20)
            continue
        for line in out.stderr.splitlines():
            if "WARNING" not in line:
                log(line)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode == 0 and lines:
            print(lines[-1])
            _record_history(lines[-1])
            return
        if out.returncode == 3 and lines:
            cand = json.loads(lines[-1])
            if fallback is None or cand["value"] > fallback["value"]:
                fallback = cand
        log(f"attempt {k}: child failed rc={out.returncode}")
        if "AssertionError" in out.stderr:
            # Parity/correctness assertions are deterministic: the same
            # corpus and program fail identically every attempt (round 3
            # burned all 8 attempts on one). Surface the bug immediately
            # instead of retrying for a better tunnel window.
            log("deterministic assertion failure — not a tunnel issue; "
                "aborting retries")
            tb = [l for l in out.stderr.splitlines() if l.strip()][-6:]
            for l in tb:
                log(f"  {l}")
            break
        time.sleep(30)
    # No fast window appeared: report the best degraded-window number
    # (honest lower bound), or zero if nothing ran at all.
    if fallback is not None:
        log("no fast window; reporting best degraded-window measurement")
        print(json.dumps(fallback))
        _record_history(json.dumps(fallback))
        return
    print(
        json.dumps(
            {
                "metric": "MatchAll bytes/sec/chip (literal, 10MB conformance corpus)",
                "value": 0.0,
                "unit": "bytes/s",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
