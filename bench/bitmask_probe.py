"""On-chip probe: bitpacked spans-out program (literal_mask_packed_device
+ extract_rows_bitmask) vs the bool-mask peel headline. Chained-reps slope
timing per CLAUDE.md; parity asserted against the host path first."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench.corpus import make_corpus
from rejit_tpu import Pattern
from rejit_tpu.engine import spans as spans_mod
from rejit_tpu.kernels import literal as lk
from rejit_tpu.runtime.init import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

SIZE = 10 * 1024 * 1024
NEEDLE = b"packet"
ROW_W = 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    corpus = make_corpus(SIZE, seed=0, needle=NEEDLE, density=0.002)
    n = len(corpus)
    P = n
    text = np.frombuffer(corpus, dtype=np.uint8)
    p = Pattern(NEEDLE.decode())
    W = len(NEEDLE)
    ext = jax.device_put(jnp.asarray(lk.extend_pad(text, P, W)))
    n_dev = jnp.int32(n)

    def words_fn(nv):
        return lk.literal_mask_packed_device(
            ext, nv, lits=p.info.literals, P=P, row_w=ROW_W
        )

    words = words_fn(n_dev)
    _, cnt = spans_mod.extract_rows_bitmask(words, row_w=ROW_W, row_cap=1)
    mx = int(jnp.max(cnt))
    cap = 2
    while cap < mx:
        cap *= 2
    log(f"row-max={mx} cap={cap}")
    s_d, cnts = spans_mod.extract_rows_bitmask(
        words, row_w=ROW_W, row_cap=cap
    )
    hs, he, hp = p.match_all_arrays(text)
    sp_ = np.asarray(s_d).ravel()
    keep = sp_ >= 0
    k = int(keep.sum())
    assert k == len(hs), (k, len(hs))
    assert np.array_equal(sp_[keep], hs)
    log(f"parity ok: {k} spans")

    raw = (
        2 * int(np.sum(sp_[keep], dtype=np.int64))
        + k * W
        + int(np.sum(np.asarray(cnts), dtype=np.int64))
    ) & 0xFFFFFFFF
    exp_int = raw - (1 << 32) if raw >= (1 << 31) else raw
    exp_ck = jnp.int32(exp_int)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(nv, exp_ck, reps):
        def body(c, _):
            wd = words_fn(nv + ((c - exp_ck) & 1))
            s, kk = spans_mod.extract_rows_bitmask(
                wd, row_w=ROW_W, row_cap=cap
            )
            valid = s >= 0
            ck = (
                2 * jnp.sum(jnp.where(valid, s, 0), dtype=jnp.int32)
                + W * jnp.sum(valid, dtype=jnp.int32)
                + jnp.sum(kk, dtype=jnp.int32)
            )
            return ck, None
        ck, _ = jax.lax.scan(body, exp_ck, None, length=reps)
        return ck

    got = int(chain(n_dev, exp_ck, reps=1))
    assert got == exp_int, (got, exp_int)
    log("checksum verified; timing bitpacked spans-out:")

    def t_once(reps):
        int(chain(n_dev, exp_ck, reps=reps))
        a = time.perf_counter()
        r = int(chain(n_dev, exp_ck, reps=reps))
        assert r == exp_int
        return time.perf_counter() - a

    R = 64
    tR = t_once(R)
    while R < 16384 and tR < 0.5:
        R *= 2
        tR = t_once(R)
    R1, R2 = R // 4, R
    t_once(R1)
    for rnd in range(3):
        t1 = min(t_once(R1) for _ in range(3))
        t2 = min(t_once(R2) for _ in range(3))
        per = (t2 - t1) / (R2 - R1)
        log(
            f"  round {rnd}: t({R1})={t1*1e3:.1f}ms t({R2})={t2*1e3:.1f}ms "
            f"slope={per*1e6:.1f}us -> {n/per/1e9:.1f} GB/s"
        )


if __name__ == "__main__":
    main()
