"""On-chip probe: fused literal->spans Pallas kernel vs the two-pass
headline program (L materialize + extract_rows_packed). Chained-reps slope
timing per CLAUDE.md; parity asserted against the host path first.
--count-only A/B isolates the claim-phase cost from the extraction rounds."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench.corpus import make_corpus
from rejit_tpu import Pattern
from rejit_tpu.kernels import extract_pallas as xp
from rejit_tpu.runtime.init import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

SIZE = 10 * 1024 * 1024
NEEDLE = b"packet"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    count_only = "--count-only" in sys.argv
    corpus = make_corpus(SIZE, seed=0, needle=NEEDLE, density=0.002)
    n = len(corpus)
    text = np.frombuffer(corpus, dtype=np.uint8)
    p = Pattern(NEEDLE.decode())
    lits, pids = p.info.literals, p.info.literal_pids

    rows = jax.device_put(jnp.asarray(xp.pad_rows(text, n, len(NEEDLE))))
    n_dev = jnp.int32(n)

    # Two-phase cap sizing via the kernel's own exact counts output.
    cap = 2
    t0 = time.time()
    keys, cnt = xp.literal_spans_pallas(
        rows, n_dev, lits=lits, pids=pids, cap=cap
    )
    mx = int(jnp.max(cnt))
    log(f"first call (incl. compile): {time.time()-t0:.2f}s row-max={mx}")
    while cap < mx:
        cap *= 2
    if count_only:
        cap = 0
    keys, cnt = xp.literal_spans_pallas(
        rows, n_dev, lits=lits, pids=pids, cap=cap
    )
    hs, he, hp = p.match_all_arrays(text)
    if not count_only:
        gs, ge, gp = xp.spans_host(keys)
        assert np.array_equal(gs, hs) and np.array_equal(ge, he) and \
            np.array_equal(gp, hp), (len(gs), len(hs))
        log(f"parity ok: {len(gs)} spans == host path")
        ck_host = (
            int(np.asarray(keys)[np.asarray(keys) < xp.BIG]
                .sum(dtype=np.int64))
            + int(np.asarray(cnt).sum(dtype=np.int64))
        ) & 0xFFFFFFFF
    else:
        assert int(np.asarray(cnt).sum()) == len(hs)
        log(f"count parity ok: {len(hs)}")
        ck_host = int(np.asarray(cnt).sum()) & 0xFFFFFFFF
    ck_host = ck_host - (1 << 32) if ck_host >= (1 << 31) else ck_host

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(nv, exp_ck, reps):
        def body(c, _):
            k, q = xp.literal_spans_pallas(
                rows, nv + ((c - exp_ck) & 1), lits=lits, pids=pids,
                cap=cap,
            )
            ck = jnp.sum(q, dtype=jnp.int32)
            if k is not None:
                ck = ck + jnp.sum(
                    jnp.where(k < xp.BIG, k, 0), dtype=jnp.int32
                )
            return ck, None
        ck, _ = jax.lax.scan(body, exp_ck, None, length=reps)
        return ck

    exp_ck = jnp.int32(ck_host)
    got = int(chain(n_dev, exp_ck, reps=1))
    assert got == ck_host, (got, ck_host)
    mode = "count-only" if count_only else f"spans cap={cap}"
    log(f"checksum verified; timing fused kernel ({mode}):")

    def t_once(reps):
        int(chain(n_dev, exp_ck, reps=reps))
        a = time.perf_counter()
        r = int(chain(n_dev, exp_ck, reps=reps))
        assert r == ck_host
        return time.perf_counter() - a

    R1, R2 = 64, 256
    t = t_once(R1)
    while t < 0.12 and R2 < 16384:
        R1, R2 = R1 * 2, R2 * 2
        t = t_once(R1)
    for rnd in range(3):
        t1, t2 = t_once(R1), t_once(R2)
        per = (t2 - t1) / (R2 - R1)
        log(
            f"  round {rnd}: t({R1})={t1*1e3:.1f}ms t({R2})={t2*1e3:.1f}ms"
            f" slope={per*1e6:.1f}us -> {n/per/1e9:.1f} GB/s"
        )


if __name__ == "__main__":
    main()
