import time, functools
import jax, jax.numpy as jnp
import numpy as np
from rejit_tpu.runtime.init import enable_compilation_cache
from rejit_tpu.kernels import scan1d
enable_compilation_cache()

P = scan1d.pad_len(10 * 1024 * 1024)
x = jnp.asarray(np.random.default_rng(0).integers(-2**29, 2**29, P, dtype=np.int32))

print("compiling + verifying on chip...", flush=True)
a = np.asarray(scan1d.rcummin(x))
b = np.asarray(jax.lax.cummin(x, axis=0, reverse=True))
np.testing.assert_array_equal(a, b)
c = np.asarray(scan1d.cummax(x))
d = np.asarray(jax.lax.cummax(x, axis=0))
np.testing.assert_array_equal(c, d)
print("ON-CHIP BIT-EQUAL ok", flush=True)

def tchain(fn, name):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def chain(v, reps):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, v, None, length=reps)
        return c[0]
    best = None
    for _ in range(2):
        t0=time.perf_counter(); int(chain(x, reps=16)); t1=time.perf_counter()
        int(chain(x, reps=64)); t2=time.perf_counter()
        per = ((t2-t1)-(t1-t0))/48
        if per <= 0: per = (t2-t1)/64
        print(f"  {name}: t16={t1-t0:.3f}s t64={t2-t1:.3f}s per={per*1e3:.3f}ms", flush=True)
        best = per if best is None else min(best, per)
    return best

tp = tchain(scan1d.rcummin, "pallas rcummin")
tm = tchain(scan1d.cummax, "pallas cummax")
tf = tchain(lambda v: jax.lax.cummin(v, axis=0, reverse=True), "lax rcummin")
print(f"pallas rcummin {tp*1e3:.3f} ms | pallas cummax {tm*1e3:.3f} ms | lax {tf*1e3:.3f} ms -> speedup {tf/tp:.1f}x", flush=True)
